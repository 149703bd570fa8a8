"""Struct / object-level kernels: dependency boolean algebra and key counts.

Reference: object dependencies ``and/nand/or/oxor/xor/with/without``
(``/root/reference/lib/types/object.js:722-873``) become pure boolean
algebra over per-field presence masks — fully vectorized, no recursion.
"""

from __future__ import annotations

import numpy as np


def dependency_mask(rel: str, presence: dict[str, np.ndarray], peers: list[str], key: str | None = None):
    """Return (violation_mask, code, context).  ``presence[name]`` is True
    where that field is present (non-null)."""
    stack = np.stack([presence[p] for p in peers]) if peers else np.zeros((0, 1), dtype=bool)
    count = stack.sum(axis=0)
    npeers = len(peers)
    ctx = {"peers": peers}
    if rel == "and":
        # all or none (object.js:724-756)
        viol = (count > 0) & (count < npeers)
        return viol, "object.and", {**ctx, "presentWithRequired": peers, "missingWithRequired": peers}
    if rel == "nand":
        viol = count == npeers
        return viol, "object.nand", ctx
    if rel == "or":
        viol = count == 0
        return viol, "object.missing", ctx
    if rel == "xor":
        viol = count != 1
        return viol, "object.xor", ctx
    if rel == "oxor":
        viol = count > 1
        return viol, "object.oxor", ctx
    if rel == "with":
        # key present -> all peers present (object.js:841-856)
        main = presence[key]
        viol = main & (count < npeers)
        return viol, "object.with", {"main": key, "peer": ",".join(peers)}
    if rel == "without":
        main = presence[key]
        viol = main & (count > 0)
        return viol, "object.without", {"main": key, "peer": ",".join(peers)}
    raise ValueError(f"unknown dependency rel {rel!r}")


def key_count(presence: dict[str, np.ndarray], n: int) -> np.ndarray:
    """Present (non-null) key count per row — powers object.min/max/length
    (``object.js:278-313``)."""
    if not presence:
        return np.zeros(n, dtype=np.int64)
    return np.stack(list(presence.values())).sum(axis=0)
