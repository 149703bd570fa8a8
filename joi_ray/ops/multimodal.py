"""Multimodal stages: media payloads as opaque binary columns with typed
metadata; decode / resize / feature-extract / frame-sample as actor-pool
map_batches stages.

The container has no image/audio libraries, so the *decode kernels* are
stubbed: ``PIL``/``soundfile`` are probed with import-try, and absent
libraries fall back to a clearly-marked deterministic fake decoder (header
parse of the synthetic payload).  Everything Ray-side — schema, batch
sizing, actor signature, output layout — is real and tested, so swapping in
a real decoder is a one-function change.
"""

from __future__ import annotations

from .._env import REMOTE_KWARGS
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_META = pa.struct(
    [("kind", pa.string()), ("width", pa.int32()), ("height", pa.int32()), ("n_frames", pa.int32())]
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def synth_media_payload(media_refs: pa.Array) -> pa.Array:
    """Deterministic fake binary payloads for asset refs: 16-byte header
    (magic, kind, w, h, frames derived from the ref hash) + pseudo-random
    body.  Stands in for reading object-store bytes."""
    import pandas as pd

    refs = media_refs.to_pandas().fillna("")
    h = pd.util.hash_pandas_object(refs, index=False).to_numpy(dtype=np.uint64)
    out = []
    for i, r in enumerate(refs):
        if not r:
            out.append(None)
            continue
        hv = int(h[i])
        w, hgt = 16 + hv % 240, 16 + (hv >> 8) % 240
        frames = 1 + (hv >> 16) % 8
        kind_code = hv % 3
        header = b"JRMM" + bytes([kind_code]) + w.to_bytes(2, "little") + hgt.to_bytes(2, "little") + frames.to_bytes(2, "little") + b"\x00" * 5
        body = (hv % 251).to_bytes(1, "little") * min(64 + hv % 192, 255)
        out.append(header + body)
    return pa.array(out, type=pa.binary())


class MediaDecodeStage:
    """binary payload -> typed metadata struct.  Real decoder when PIL is
    available; deterministic header parse otherwise.  batch_size should be
    small (payloads are wide rows) — callers pass e.g. batch_size=256."""

    KINDS = ["image", "audio", "video"]

    def __init__(self, payload_col: str = "payload", out_col: str = "media_meta"):
        self.payload_col, self.out_col = payload_col, out_col
        if HAVE_PIL:  # pragma: no cover
            raise NotImplementedError("real PIL decode path: implement when the lib ships")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].combine_chunks()
        buf = payloads.to_pylist()
        kinds, ws, hs, fs = [], [], [], []
        for b in buf:
            if not b or len(b) < 16 or b[:4] != b"JRMM":
                kinds.append(None), ws.append(None), hs.append(None), fs.append(None)
                continue
            kinds.append(self.KINDS[b[4] % 3])
            ws.append(int.from_bytes(b[5:7], "little"))
            hs.append(int.from_bytes(b[7:9], "little"))
            fs.append(int.from_bytes(b[9:11], "little"))
        meta = pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(fs, pa.int32()),
            ],
            fields=list(MEDIA_META),
        )
        return batch.append_column(self.out_col, meta)


class MediaFeatureStage:
    """payload -> fixed-size feature vector (fake but deterministic: byte
    histogram projected by a seeded matrix).  The real model-inference hook:
    weights would load here in __init__, once per actor."""

    def __init__(self, payload_col: str = "payload", dim: int = 32, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)
        self.payload_col, self.dim = payload_col, dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].combine_chunks().to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, b in enumerate(payloads):
            if b:
                hist = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256).astype(np.float32)
                feats[i] = (hist / max(len(b), 1)) @ self.proj
        col = pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), self.dim)
        return batch.append_column("media_features", col)


def frame_sample_plan(meta_col: pa.Array, every_n: int = 2) -> pa.Array:
    """video metadata -> list<int32> of frame indices to sample (plumbing for
    a frame-extraction stage; the extraction itself is decoder territory)."""
    frames = pc.struct_field(meta_col, "n_frames")
    out = []
    for f in frames.to_pylist():
        out.append(list(range(0, f, every_n)) if f else None)
    return pa.array(out, type=pa.list_(pa.int32()))


def media_pipeline(docs_ds, *, concurrency=2, batch_size=256):
    """documents (doc_id, spans) -> exploded media spans with synthesized
    payloads, decoded metadata, and feature vectors.  Demonstrates the
    small-batch actor-pool layout for wide binary rows."""

    def explode_media(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        refs = pc.struct_field(flat, "media_ref")
        keep = pc.is_valid(refs)
        ids = batch["doc_id"].combine_chunks().take(parents).filter(keep)
        refs = refs.filter(keep)
        return pa.table({"doc_id": ids, "media_ref": refs, "payload": synth_media_payload(refs)})

    media = docs_ds.map_batches(explode_media, batch_format="pyarrow", batch_size=batch_size, **REMOTE_KWARGS)
    # fractional num_cpus: two chained pools must not reserve every core or
    # the upstream read starves (fixed-size pools pre-reserve their CPUs)
    media = media.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5, **REMOTE_KWARGS)
    media = media.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5, **REMOTE_KWARGS)
    return media
