"""Dataset sources and sinks.

The north rule's input is a Lance table of interleaved documents
(``BASELINE.json`` input_hint).  The ``lance``/``pylance`` package is not in
this container, so ``read_documents`` probes for it and falls back to
parquet — the call-site contract (column pruning, filter pushdown, streaming
blocks) is identical either way, so swapping in Lance is configuration, not
code.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - lance not shipped in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str, *, columns: list[str] | None = None, **kwargs):
    """Read an interleaved-documents table: Lance dataset dir if available
    and the path is one, else parquet file(s).  Always column-pruned at the
    read."""
    import ray.data as rd

    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns, **kwargs)  # pragma: no cover
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_table(path: str, *, format: str | None = None, columns: list[str] | None = None, **kwargs):
    """Generic source dispatch (parquet / csv / json / text / lance)."""
    import ray.data as rd

    fmt = format or os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    if fmt in ("parquet", "pq"):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if fmt == "csv":
        ds = rd.read_csv(path, **kwargs)
    elif fmt in ("json", "jsonl", "ndjson"):
        ds = rd.read_json(path, **kwargs)
    elif fmt in ("txt", "text"):
        ds = rd.read_text(path, **kwargs)
    elif fmt == "lance" and HAVE_LANCE:  # pragma: no cover
        return rd.read_lance(path, columns=columns, **kwargs)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_violations(ds, out_dir: str, *, partition_key: str | None = None, min_rows_per_file: int = 500_000,
                     format: str = "parquet"):
    """Violations sink: partitioned parquet (or Lance when available), one
    directory per run — never one giant file (resumable-output rule)."""
    if format == "lance" and HAVE_LANCE:  # pragma: no cover
        ds.write_lance(out_dir)
        return out_dir
    try:
        ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=min_rows_per_file)
    return out_dir
