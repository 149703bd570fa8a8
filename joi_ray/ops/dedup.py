"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding-cosine.

Scale design:
- exact: content-hash per batch (vectorized) -> two-phase groupby (per-batch
  partial counts first, so hot values never concentrate on one reducer).
- MinHash: per-batch *vectorized* shingling via a rolling polynomial hash
  over the concatenated byte buffer + ``np.minimum.reduceat`` per doc — no
  Python per-row loop — then band-bucket groupby; candidate pairs verified
  against the full signatures carried through the shuffle (no second data
  pass).
- SimHash: 64-bit signature from token hashes; 4×16-bit pigeonhole bands
  bucket candidates for hamming<=3.
- embedding: random-hyperplane LSH buckets (deterministic seed) -> bucket
  self-join with vectorized row-wise cosine per joined batch (vectors packed
  as binary through the shuffle); no bucket-size cap.
"""

from __future__ import annotations

from .._env import REMOTE_KWARGS, join_num_partitions
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# exact dedup


def content_hash_batch(batch: pa.Table, col: str, out: str = "content_hash") -> pa.Table:
    s = batch[col].combine_chunks().to_pandas()
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    return batch.append_column(out, pa.array(h.astype(np.int64)))


def exact_duplicate_groups(ds, col: str, id_col: str):
    """Dataset of (content_hash, n, keep_id) for groups with n>1.  Two-phase:
    per-batch partials -> small groupby."""
    from ray.data.aggregate import Count, Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        t = content_hash_batch(batch, col)
        g = t.group_by("content_hash").aggregate([(id_col, "count"), (id_col, "min")])
        return pa.table(
            {
                "content_hash": g["content_hash"],
                "partial_n": pc.cast(g[f"{id_col}_count"], pa.int64()),
                "partial_min": g[f"{id_col}_min"],
            }
        )

    p = ds.map_batches(partials, batch_format="pyarrow", **REMOTE_KWARGS)
    agg = p.groupby("content_hash").aggregate(
        Sum("partial_n", alias_name="n"), Min("partial_min", alias_name="keep_id")
    )
    return agg.map_batches(lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow", **REMOTE_KWARGS)


def dedup_exact(ds, col: str, id_col: str):
    """Keep-first exact dedup, scale-safe: the duplicate groups (a small
    side ∝ duplicate rate) come from the two-phase partial-count aggregate
    and are broadcast once; a streaming filter then keeps a row iff its
    content hash has no duplicates or the row is the group's min-id winner.
    No corpus-sized groupby — the previous groupby().map_groups(keep_first)
    paid Ray's per-group overhead on mostly-singleton groups."""
    import ray

    from .._env import collect_tables

    dup = exact_duplicate_groups(ds, col, id_col)
    dup_t = collect_tables(dup)
    dref = ray.put(dup_t)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(dref)
        t = content_hash_batch(batch, col)
        if d.num_rows == 0:
            return t
        idx = pc.index_in(t["content_hash"], value_set=d["content_hash"].combine_chunks())
        keep_ids = d["keep_id"].combine_chunks().take(idx)
        in_dup_group = pc.is_valid(idx)
        winner = pc.equal(t[id_col].combine_chunks(), keep_ids)
        mask = pc.or_kleene(pc.invert(in_dup_group), winner)
        return t.filter(pc.fill_null(mask, True))

    return ds.map_batches(keep, batch_format="pyarrow", **REMOTE_KWARGS)


# --------------------------------------------------------------------------
# MinHash + LSH

_P = np.uint64(1_000_003)           # rolling-hash base
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(texts: list[str], k: int = 7):
    """Vectorized k-char shingle hashing: one rolling polynomial hash pass
    over the concatenated utf-8 buffer; returns (hashes, doc_starts) where
    doc_starts[i] indexes the first shingle of doc i (len n_docs+1)."""
    enc = [t.encode("utf-8", "ignore") if t else b"" for t in texts]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    n = len(buf)
    n_sh_per_doc = np.maximum(lens - k + 1, 1)  # empty/short docs get 1 pseudo-shingle
    doc_ends = np.cumsum(lens)
    doc_off = doc_ends - lens
    if n < k:
        h = np.zeros(len(texts), dtype=np.uint64)
        starts = np.arange(len(texts) + 1, dtype=np.int64)
        return h, starts
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    pw = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash ring
        for j in range(k):
            h += buf[j : j + m] * pw
            pw = np.uint64((int(pw) * int(_P)) & 0xFFFFFFFFFFFFFFFF)
    # select only shingles fully inside one doc, plus a pseudo-shingle for
    # docs shorter than k (hash of doc index for stability)
    keep_idx = []
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    pieces = []
    for i in range(len(texts)):
        lo, hi = int(doc_off[i]), int(doc_ends[i])
        if lens[i] >= k:
            pieces.append(h[lo : hi - k + 1])
        else:
            pieces.append(np.array([np.uint64(lens[i] * 2654435761 + 1)], dtype=np.uint64))
        starts[i + 1] = starts[i] + len(pieces[-1])
    return np.concatenate(pieces), starts


def minhash_signatures(texts: list[str], num_perm: int = 64, k: int = 7, seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash matrix, fully vectorized."""
    a, b = _perm_params(num_perm, seed)
    h, starts = shingle_hashes(texts, k)
    n_docs = len(starts) - 1
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    seg = starts[:-1]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            # multiply-shift universal hash on the uint64 ring (no modulo —
            # 2-3x faster than Mersenne reduction, same minhash guarantees)
            ph = a[p] * h + b[p]
            sig[:, p] = np.minimum.reduceat(ph, seg) if len(h) else 0
    return sig


class MinHashStage:
    """Actor stage: text -> (id, band, band_hash[, sig]).  One output row per
    (doc, band); signatures ride along for shuffle-side verification when
    ``emit_sig`` (skipped for the scalable canonical path — 16B/row instead
    of 512B/row through the shuffle)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16, k: int = 7, seed: int = 42,
                 emit_sig: bool = True):
        self.emit_sig = emit_sig
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, k, seed
        self.rows_per_band = num_perm // bands
        rng = np.random.default_rng(seed + 1)
        self.band_mix = rng.integers(1, _MERSENNE, self.rows_per_band, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].combine_chunks().to_pylist()
        ids = batch[self.id_col].combine_chunks()
        sig = minhash_signatures(texts, self.num_perm, self.k, self.seed)
        n = len(texts)
        r = self.rows_per_band
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        for bidx in range(self.bands):
            block = sig[:, bidx * r : (bidx + 1) * r]
            band_hash[:, bidx] = (block * self.band_mix).sum(axis=1, dtype=np.uint64)
        cols = {
            self.id_col: ids.take(pa.array(np.tile(np.arange(n), self.bands))),
            "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(band_hash.T.reshape(-1).astype(np.int64)),
        }
        if self.emit_sig:
            cols["sig"] = pa.FixedSizeListArray.from_arrays(
                pa.array(np.tile(sig, (self.bands, 1)).reshape(-1).astype(np.int64)), self.num_perm
            )
        return pa.table(cols)


def minhash_duplicate_pairs(ds, text_col: str, id_col: str, *, threshold: float = 0.7,
                            num_perm: int = 64, bands: int = 16, k: int = 7,
                            concurrency=None, max_group: int = 64):
    """Near-duplicate pairs via MinHash-LSH.  Candidates come from a
    distributed band-bucket self-join (not a groupby().map_groups over
    millions of tiny buckets — Ray's sort-aggregate pays per-group overhead
    that dominates at scale); the estimated Jaccard (fraction of equal
    signature components, signatures carried through the join) is computed
    vectorized per batch, and only pairs above the threshold — a small,
    duplicate-rate-bounded set — enter the final distinct groupby.
    Returns Dataset(id_a, id_b, est_jaccard)."""
    import ray
    from ray.data.aggregate import Max

    banded = ds.map_batches(
        _minhash_fn,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=k,
                       emit_sig=True),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}), **REMOTE_KWARGS).materialize()

    def _sig_to_binary(col) -> pa.Array:
        # acero hash joins reject fixed_size_list payload columns — carry
        # the signature as packed little-endian int64 bytes instead
        fsl = col.combine_chunks()
        flat = fsl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        buf = flat.tobytes()
        width = num_perm * 8
        offsets = np.arange(0, len(buf) + 1, width, dtype=np.int32)
        return pa.Array.from_buffers(
            pa.binary(), len(fsl),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)])

    def _rename(t: pa.Table, suffix: str) -> pa.Table:
        out = pa.table({
            f"id{suffix}": t[t.column_names[0]],
            "band": t["band"],
            "band_hash": t["band_hash"],
            f"sig{suffix}": _sig_to_binary(t["sig"]),
        })
        return out

    left = banded.map_batches(lambda t: _rename(t, "_a"), batch_format="pyarrow", **REMOTE_KWARGS)
    right = banded.map_batches(lambda t: _rename(t, "_b"), batch_format="pyarrow", **REMOTE_KWARGS)
    njoin = join_num_partitions()
    j = left.join(right, join_type="inner", num_partitions=njoin, on=("band", "band_hash"),
                  aggregator_ray_remote_args={"num_cpus": 0.5})
    _id_t = banded.schema().types[0]  # driver-side: never call Dataset.schema() in a worker

    def _sig_matrix(arr: pa.Array) -> np.ndarray:
        # zero-copy unpack of the width-uniform packed signatures: view the
        # value buffer directly (r4 verdict nit — the per-row Python
        # b"".join(to_pylist()) was the hottest dedup inner loop).  The
        # offsets check guards slices/non-uniform widths; the fallback path
        # keeps correctness if a future carrier changes shape.
        width = num_perm * 8
        if arr.null_count == 0 and len(arr):
            off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            bufs = arr.buffers()
            offs = np.frombuffer(bufs[1], dtype=off_dt, count=len(arr) + 1,
                                 offset=arr.offset * np.dtype(off_dt).itemsize)
            if offs[-1] - offs[0] == len(arr) * width and bool(np.all(np.diff(offs) == width)):
                data = np.frombuffer(bufs[2], dtype=np.uint8,
                                     count=len(arr) * width, offset=int(offs[0]))
                return data.view(np.int64).reshape(-1, num_perm)
        return np.frombuffer(b"".join(arr.to_pylist()), dtype=np.int64).reshape(-1, num_perm)

    def est_pairs(t: pa.Table) -> pa.Table:
        # join partitions with no matches can emit schema-less empties
        if t.num_columns:
            t = t.filter(pc.less(t["id_a"], t["id_b"]))
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"id_a": pa.array([], _id_t),
                             "id_b": pa.array([], _id_t),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = _sig_matrix(t["sig_a"].combine_chunks())
        sb = _sig_matrix(t["sig_b"].combine_chunks())
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        out = pa.table({
            "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        })
        # per-batch distinct: the same pair reappears once per matching band
        g = out.group_by(["id_a", "id_b"]).aggregate([("est_jaccard", "max")])
        return g.rename_columns(["id_a", "id_b", "est_jaccard"])

    pairs = j.map_batches(est_pairs, batch_format="pyarrow", **REMOTE_KWARGS)
    dedup = pairs.groupby(["id_a", "id_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    return dedup


# per-worker-process cache for task-mode stages (no actor pool startup)
_MH_CACHE: dict = {}


def _minhash_fn(batch: pa.Table, **kw) -> pa.Table:
    from .._env import quiet_ray_data_logs

    quiet_ray_data_logs()
    key = (kw["text_col"], kw["id_col"], kw["num_perm"], kw["bands"], kw["k"], kw.get("emit_sig", True))
    stage = _MH_CACHE.get(key)
    if stage is None:
        stage = MinHashStage(**kw)
        _MH_CACHE[key] = stage
    return stage(batch)


def minhash_canonical(ds, text_col: str, id_col: str, *, num_perm: int = 64, bands: int = 16,
                      k: int = 7, concurrency=None, scratch_dir: str | None = None,
                      num_partitions: int | None = None, output_path: str | None = None):
    """Scalable keep-first near-dup assignment without pair materialization.

    Every corpus-sized step is a dataset op — nothing proportional to the
    corpus (or to the duplicate-member set) ever reaches the driver:

    1. band rows (id, band, band_hash) — 24B/row, no signatures — emitted
       ONCE and spilled to parquet under ``scratch_dir`` (signatures are
       never recomputed; the spill is the resumable artifact)
    2. ONE native groupby-aggregate: per bucket (min_id=bmin, count=bn)
    3. buckets with bn>1 (size ∝ duplicate rate, not corpus size) stay a
       Dataset; only this small side is materialized (object store, spills)
    4. hash-join band rows against dup buckets on (band, band_hash), then
       ``groupby(id).min(bmin)`` collapses bands to canonical — both are
       dataset shuffles keyed on bounded-cardinality keys

    Returns a pandas DataFrame (id, canonical) for documents that belong to
    at least one duplicate bucket (canonical < id marks a near-duplicate of
    an earlier doc) — or, when ``output_path`` is given, writes partitioned
    parquet there and returns the Dataset instead (the 100-TB path: the
    result is ∝ dup-doc count and should not be collected)."""

    import ray
    from ray.data.aggregate import Min, Sum

    banded = ds.map_batches(
        _minhash_fn,
        fn_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=k, emit_sig=False
        ),
        batch_format="pyarrow",
        **REMOTE_KWARGS)
    # the band-row set is consumed twice (bucket stats + member re-key).
    # Default: distributed materialize — skinny rows (24B each) live in the
    # cluster object store, which spills to local disk under pressure; no
    # driver copy exists.  Pass scratch_dir to persist band rows as parquet
    # instead: the cross-job resumable artifact, and the choice when the
    # object store can't hold docs x bands rows even spilled (signatures are
    # never recomputed either way).
    if scratch_dir is not None:
        import os

        marker = os.path.join(scratch_dir, "_BANDS_DONE")
        if not os.path.exists(marker):
            banded.write_parquet(scratch_dir)
            with open(marker, "w") as f:
                f.write("ok")
        # resume: a completed band spill is reused — signatures are never
        # recomputed across job restarts
        banded = ray.data.read_parquet(scratch_dir)
    else:
        banded = banded.materialize()

    def bucket_partials(t: pa.Table) -> pa.Table:
        # per-batch pre-aggregation: near-dup families usually co-locate in
        # a batch, so this compresses the shuffle by the family size
        g = t.group_by(["band", "band_hash"]).aggregate([(id_col, "min"), (id_col, "count")])
        return g.rename_columns(["band", "band_hash", "pmin", "pn"])

    stats = (
        banded.map_batches(bucket_partials, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby(["band", "band_hash"])
        .aggregate(Min("pmin", alias_name="bmin"), Sum("pn", alias_name="bn"))
    )
    def _dup_buckets(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["bn"], 1)).select(["band", "band_hash", "bmin"])
        # join keys must match the banded side's physical types exactly
        # (hash-join finalize is strict about int32 vs int64)
        return f.cast(pa.schema([("band", pa.int32()), ("band_hash", pa.int64()),
                                 ("bmin", f.schema.field("bmin").type)]))

    dup = (
        stats.map_batches(_dup_buckets, batch_format="pyarrow", **REMOTE_KWARGS)
        .materialize()  # small side only: ∝ duplicate buckets, spills if not
    )
    n_dup = dup.count()
    if n_dup == 0:
        if output_path is not None:
            empty = ray.data.from_arrow(
                pa.table({id_col: pa.array([], pa.string()), "canonical": pa.array([], pa.string())}))
            empty.write_parquet(output_path)
            return empty
        return pd.DataFrame({id_col: [], "canonical": []})

    broadcast_limit = 4_000_000  # ~100MB of (band, band_hash, bmin) rows
    if n_dup <= broadcast_limit:
        # small side: ray.put once, Arrow hash-join inside every map task —
        # no shuffle for the re-key at all.  Stay pyarrow end-to-end: a
        # batch_format="pandas" stage fused ahead of an Aggregate drags the
        # whole sort-shuffle onto a pandas slow path (~5x measured).
        from .._env import collect_tables

        dup_t = collect_tables(dup)
        bref = ray.put(dup_t)

        def members(t: pa.Table) -> pa.Table:
            small = ray.get(bref)
            j = t.join(small, keys=["band", "band_hash"], join_type="inner")
            # per-batch pre-collapse: a doc's band rows are contiguous in the
            # spill, so this compresses the final shuffle ~bands-fold
            g = j.group_by(id_col).aggregate([("bmin", "min")])
            return g.rename_columns([id_col, "pmin"])

        pre = banded.map_batches(members, batch_format="pyarrow", **REMOTE_KWARGS)
    else:
        # huge dup side (dup families ∝ corpus): distributed hash join
        if num_partitions is None:
            # one aggregator actor per partition; cap at cluster CPUs or they
            # cannot all schedule (deadlock on small clusters)
            num_partitions = max(2, min(64, int(ray.cluster_resources().get("CPU", 8)) - 1))
        joined = banded.join(
            dup, join_type="inner", num_partitions=num_partitions, on=("band", "band_hash"),
            aggregator_ray_remote_args={"num_cpus": 0.5})

        def precollapse(t: pa.Table) -> pa.Table:
            g = t.group_by(id_col).aggregate([("bmin", "min")])
            return g.rename_columns([id_col, "pmin"])

        pre = joined.map_batches(precollapse, batch_format="pyarrow", **REMOTE_KWARGS)

    if output_path is not None:
        # scale path: the canonical=min collapse stays a dataset shuffle and
        # the result is written partitioned, never collected
        canon = pre.groupby(id_col).aggregate(Min("pmin", alias_name="canonical"))
        canon.write_parquet(output_path)
        return canon
    # in-memory result mode: `pre` is already per-batch-collapsed, so its
    # size is within a small factor of the RESULT the caller is about to
    # hold anyway (dup docs, +1 row per batch a doc spans) — finish the min
    # on the driver instead of paying a Ray aggregate's per-group overhead
    from .._env import collect_tables

    pre_t = collect_tables(pre).to_pandas()
    if pre_t.empty:
        return pd.DataFrame({id_col: [], "canonical": []})
    out = (pre_t.groupby(id_col, as_index=False)["pmin"].min()
           .rename(columns={"pmin": "canonical"}))
    return out[[id_col, "canonical"]]


def ngram_jaccard(a: str, b: str, k: int = 7) -> float:
    """Exact k-shingle Jaccard — the verifier for candidate pairs."""
    sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 1))}
    sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 1))}
    return len(sa & sb) / max(len(sa | sb), 1)


# --------------------------------------------------------------------------
# SimHash


_WORD_SPLIT = r"\W+"


def simhash_batch(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit simhash per text: sign-sum of token-hash bit vectors.

    Fully vectorized over the batch: tokens are exploded to one flat array,
    hashed ONCE with ``pd.util.hash_array``, and the per-doc sign-sum runs
    as 64 ``np.add.reduceat`` passes over token-boundary offsets (the same
    segment pattern as ``minhash_signatures``) — no per-row Python loop.
    For bit j, sign-sum > 0  <=>  2*popcount_j > n_tokens."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    toks = texts.fillna("").str.lower().str.findall(r"\w+")
    counts = toks.str.len().to_numpy(dtype=np.int64)
    if counts.sum() == 0:
        return out
    flat = toks.explode().dropna().to_numpy(dtype=object)
    hs = pd.util.hash_array(flat).astype(np.uint64)
    valid = counts > 0
    starts = (np.cumsum(counts) - counts)[valid]
    ntok = counts[valid]
    pops = np.empty((len(starts), 64), dtype=np.int64)
    for j in range(64):
        bit = ((hs >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        pops[:, j] = np.add.reduceat(bit, starts)
    bools = (2 * pops) > ntok[:, None]
    # bit-packing order matches the original packbits(reversed, 'little')
    # .view(uint64): result bit p holds the sign of hash-bit (63 - p)
    shifts = (63 - np.arange(64)).astype(np.uint64)
    out[valid] = (bools.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    return out


class SimHashStage:
    """Stateless (hyperplanes are implicit in the hash function) — run via
    the task-mode ``_simhash_fn`` below, never as an actor pool."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col].combine_chunks().to_pandas()
        h = simhash_batch(s)
        # 4 pigeonhole bands of 16 bits: hamming<=3 pairs share >=1 exact band
        t = pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(h.astype(np.int64)),
            }
        )
        return t


def _simhash_fn(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    return SimHashStage(text_col, id_col)(batch)


def simhash_duplicate_pairs(ds, text_col: str, id_col: str, *, max_hamming: int = 3, concurrency=None,
                            max_group: int = 256):
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4×16-bit
    pigeonhole banding (any pair within distance 3 matches on >=1 band)."""

    def explode_bands(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        parts = []
        for bidx in range(4):
            band_val = ((h >> np.uint64(16 * bidx)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        id_col: batch[id_col],
                        "simhash": batch["simhash"],
                        "band": pa.array(np.full(n, bidx, dtype=np.int32)),
                        "band_val": pa.array(band_val),
                    }
                )
            )
        return pa.concat_tables(parts)

    import ray
    from ray.data.aggregate import Min

    sigs = ds.map_batches(
        _simhash_fn, fn_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}), **REMOTE_KWARGS)
    banded = sigs.map_batches(explode_bands, batch_format="pyarrow", **REMOTE_KWARGS).materialize()

    # distributed band-bucket self-join (no tiny-group map_groups; Ray's
    # sort-aggregate pays per-group overhead that dominates on millions of
    # singleton buckets) + vectorized hamming filter per batch
    def _rename(t: pa.Table, suffix: str) -> pa.Table:
        return pa.table({
            f"id{suffix}": t[id_col], f"sim{suffix}": t["simhash"],
            "band": t["band"], "band_val": t["band_val"],
        })

    left = banded.map_batches(lambda t: _rename(t, "_a"), batch_format="pyarrow", **REMOTE_KWARGS)
    right = banded.map_batches(lambda t: _rename(t, "_b"), batch_format="pyarrow", **REMOTE_KWARGS)
    njoin = join_num_partitions()
    _id_t = banded.schema().types[0]  # driver-side: never call Dataset.schema() in a worker
    j = left.join(right, join_type="inner", num_partitions=njoin, on=("band", "band_val"),
                  aggregator_ray_remote_args={"num_cpus": 0.5})

    def ham_pairs(t: pa.Table) -> pa.Table:
        # join partitions with no matches can emit schema-less empties
        if t.num_columns:
            t = t.filter(pc.less(t["id_a"], t["id_b"]))
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"id_a": pa.array([], _id_t),
                             "id_b": pa.array([], _id_t),
                             "hamming": pa.array([], pa.int64())})
        ha = t["sim_a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        hb = t["sim_b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        x = ha ^ hb
        dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
        keep = dist <= max_hamming
        out = pa.table({
            "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
            "hamming": pa.array(dist[keep]),
        })
        g = out.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")])
        return g.rename_columns(["id_a", "id_b", "hamming"])

    pairs = j.map_batches(ham_pairs, batch_format="pyarrow", **REMOTE_KWARGS)
    # surviving pairs are duplicate-rate-bounded; the final distinct is small
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


def simhash_buckets(ds, text_col: str, id_col: str, *, concurrency=None):
    """Scalable simhash dup-bucket stats: signatures -> 4x16-bit pigeonhole
    band rows -> two-phase count (per-batch partials, then one native
    groupby-sum).  Returns a Dataset of (band, band_val, n) with n>1 — the
    candidate buckets; size ∝ duplicate rate, not corpus.  The shape
    mirrors ``exact_duplicate_groups``: no map_groups, no pair
    materialization."""
    from ray.data.aggregate import Sum

    def sig_and_bands(batch: pa.Table) -> pa.Table:
        from .._env import quiet_ray_data_logs

        quiet_ray_data_logs()
        s = batch[text_col].combine_chunks().to_pandas()
        h = simhash_batch(s)
        n = len(h)
        band = np.repeat(np.arange(4, dtype=np.int32), n)
        band_val = np.concatenate(
            [((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)])
        t = pa.table({"band": band, "band_val": band_val})
        g = t.group_by(["band", "band_val"]).aggregate([("band_val", "count")])
        return pa.table({
            "band": g["band"],
            "band_val": g["band_val"],
            "partial_n": pc.cast(g["band_val_count"], pa.int64()),
        })

    partials = ds.map_batches(sig_and_bands, batch_format="pyarrow", **REMOTE_KWARGS)
    totals = partials.groupby(["band", "band_val"]).aggregate(Sum("partial_n", alias_name="n"))
    return totals.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow", **REMOTE_KWARGS)


# --------------------------------------------------------------------------
# embedding near-dup (cosine) via random-hyperplane LSH


class HyperplaneLSH:
    def __init__(self, dim: int, n_bits: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits)).astype(np.float32)

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)


# per-worker-process cache for the hyperplane matrix (task-mode stage)
_EMB_LSH_CACHE: dict = {}


def _emb_bucket_fn(batch: pa.Table, *, emb_col: str, id_col: str, n_bits: int, seed: int,
                   n_rotations: int = 1) -> pa.Table:
    from .._env import quiet_ray_data_logs

    quiet_ray_data_logs()
    emb = np.stack(batch[emb_col].combine_chunks().to_numpy(zero_copy_only=False))
    emb = (emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)).astype(np.float32)
    n, dim = emb.shape
    buf = np.ascontiguousarray(emb).tobytes()
    offsets = np.arange(0, len(buf) + 1, dim * 4, dtype=np.int32)
    vec_bin = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)])
    parts = []
    for r in range(n_rotations):
        key = (dim, n_bits, seed + r)
        lsh = _EMB_LSH_CACHE.get(key)
        if lsh is None:
            lsh = HyperplaneLSH(dim, n_bits, seed + r)
            _EMB_LSH_CACHE[key] = lsh
        # rotation index rides in the high bits so buckets from different
        # rotations never collide in the join key
        bucket = lsh.bucket(emb) | (np.int64(r) << np.int64(n_bits))
        parts.append(pa.table({
            id_col: batch[id_col],
            "bucket": pa.array(bucket),
            "vec": vec_bin,
        }))
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


def embedding_duplicate_pairs(ds, emb_col: str, id_col: str, *, threshold: float = 0.95,
                              n_bits: int = 10, seed: int = 42, concurrency=None,
                              n_rotations: int = 1):
    """Cosine near-dup pairs via random-hyperplane LSH.  Candidates come
    from a distributed bucket self-join (the same shape as
    ``simhash_duplicate_pairs`` / ``minhash_duplicate_pairs`` — NOT a
    ``groupby().map_groups`` over millions of mostly-singleton buckets,
    which pays Ray's per-group overhead and previously capped oversized
    buckets silently).  Normalized float32 vectors are packed as binary to
    ride through the hash join (acero rejects list payload columns), the
    cosine is one vectorized row-wise dot per joined batch, and only pairs
    above the threshold — a duplicate-rate-bounded set — reach the final
    distinct groupby.  No bucket-size cap: an oversized bucket streams
    through the join as ordinary batches.

    Partitioning assumption: near-identical vectors share a bucket with
    high probability (n_bits trades recall for join fan-out).  With the
    default ``n_rotations=1`` each id has exactly ONE bucket row, so the
    join emits every qualifying pair exactly once — no pair-distinct
    groupby is needed (a distinct over millions of singleton pair groups
    costs ~30us/group in Ray's sort-aggregate and would dominate).

    ``n_rotations>1`` is the recall knob: each id gets one bucket row per
    independent hyperplane rotation (rotation index in the key's high
    bits), so a true pair is found if it shares a bucket in ANY rotation —
    for a pair at angle theta, miss probability drops from
    (1-(1-theta/pi)^n_bits) to its n_rotations-th power (measured on the
    perturbed 32-dim fixture in tests/test_ops.py: recall 0.25 -> 0.48
    going 1 -> 2 rotations at n_bits=10, threshold 0.9; production recall
    targets need wider rotations or narrower buckets — the formula above
    is the sizing guide).  Cost: n_rotations x band rows through the
    join, with exactly-once pair emission done LOCALLY (a pair is kept
    only in the first rotation that bucketed it together — the earlier
    buckets recompute from the joined vectors, so no pair-distinct
    shuffle exists at any rotation count); bench entry
    ``embedding_dedup_r2`` tracks the overhead.  Returns
    Dataset(id_a, id_b, cosine).

    ``concurrency`` is accepted for API symmetry but the bucket stage runs
    as a task pool: its only state (the hyperplane matrix) is rebuilt
    per worker process from the seed and cached — an actor pool here pays
    seconds of process spin-up waiting for its minimum actor count on
    small block counts, for zero setup saved."""
    import ray

    bucketed = ds.map_batches(
        _emb_bucket_fn,
        fn_kwargs=dict(emb_col=emb_col, id_col=id_col, n_bits=n_bits, seed=seed,
                       n_rotations=n_rotations),
        batch_format="pyarrow", **REMOTE_KWARGS).materialize()
    id_type = bucketed.schema().types[0]

    def _rename(t: pa.Table, suffix: str) -> pa.Table:
        return pa.table({
            f"id{suffix}": t[t.column_names[0]], "bucket": t["bucket"],
            f"vec{suffix}": t["vec"],
        })

    left = bucketed.map_batches(lambda t: _rename(t, "_a"), batch_format="pyarrow", **REMOTE_KWARGS)
    right = bucketed.map_batches(lambda t: _rename(t, "_b"), batch_format="pyarrow", **REMOTE_KWARGS)
    njoin = join_num_partitions()
    j = left.join(right, join_type="inner", num_partitions=njoin, on=("bucket",),
                  aggregator_ray_remote_args={"num_cpus": 0.5})

    def _unpack(col: pa.ChunkedArray, n: int) -> np.ndarray:
        # zero-copy reshape of the binary values buffer: Arrow's
        # filter/take kernels rebuild binary values densely in row order,
        # so offsets are contiguous on the hot path; a sliced/lazy layout
        # falls back to ONE Arrow take (C++ copy), never a python loop or
        # a row x width index-matrix gather (memory-bandwidth killer)
        arr = col.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset: arr.offset + n + 1]
        width = int(offs[1] - offs[0])
        if not np.all(np.diff(offs) == width):
            arr = arr.take(pa.array(np.arange(n, dtype=np.int64)))
            offs = np.frombuffer(arr.buffers()[1], np.int32)
            width = int(offs[1] - offs[0])
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        start = int(offs[0])
        return data[start: start + n * width].view(np.float32).reshape(n, width // 4)

    def cos_pairs(t: pa.Table) -> pa.Table:
        # join partitions with no matches can emit schema-less empties
        if t.num_columns:
            t = t.filter(pc.less(t["id_a"], t["id_b"]))
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
                             "cosine": pa.array([], pa.float64())})
        va = _unpack(t["vec_a"], t.num_rows)
        vb = _unpack(t["vec_b"], t.num_rows)
        keep = np.ones(t.num_rows, dtype=bool)
        if n_rotations > 1:
            # exactly-once emission WITHOUT a pair-distinct shuffle: a pair
            # joined in rotation r is kept only if NO earlier rotation
            # already bucketed it together — both vectors are in the row,
            # so the earlier-rotation buckets recompute locally (one
            # n_bits-wide matmul per earlier rotation over the r>0 rows;
            # the groupby alternative measured 42 s vs 6.7 s single-rot on
            # the 50k-vector bench)
            rot = (t["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
                   >> np.int64(n_bits)).astype(np.int64)
            for r in range(1, n_rotations):
                rows = np.nonzero(rot == r)[0]
                if not len(rows):
                    continue
                sva, svb = va[rows], vb[rows]
                dup = np.zeros(len(rows), dtype=bool)
                for r_prev in range(r):
                    key = (va.shape[1], n_bits, seed + r_prev)
                    lsh = _EMB_LSH_CACHE.get(key)
                    if lsh is None:
                        lsh = HyperplaneLSH(va.shape[1], n_bits, seed + r_prev)
                        _EMB_LSH_CACHE[key] = lsh
                    dup |= lsh.bucket(sva) == lsh.bucket(svb)
                keep[rows[dup]] = False
        cos = np.einsum("ij,ij->i", va.astype(np.float64), vb.astype(np.float64))
        keep &= cos >= threshold
        return pa.table({
            "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
            "cosine": pa.array(cos[keep], pa.float64()),
        })

    return j.map_batches(cos_pairs, batch_format="pyarrow", **REMOTE_KWARGS)
