"""Struct / object-level kernels: dependency boolean algebra and key counts.

Reference: object dependencies ``and/nand/or/oxor/xor/with/without``
(``/root/reference/lib/types/object.js:722-873``) become pure boolean
algebra over per-field presence masks — fully vectorized, no recursion.
"""

from __future__ import annotations

import numpy as np


def dependency_violations(
    rel: str,
    presence: dict[str, np.ndarray],
    peers: list[str],
    key: str | None = None,
    labels: dict[str, str] | None = None,
) -> list[tuple[np.ndarray, str, dict]]:
    """Return ``[(violation_mask, code, context), ...]`` mirroring the
    reference's per-value contexts (``object.js:722-873``): and/xor/oxor
    report the row's actual present/missing key lists and with/without the
    first offending peer, so rows are grouped by presence PATTERN and each
    group carries its exact context.  Pattern count is bounded by the data
    (≤ distinct presence combinations among violating rows), not by 2^n.
    ``labels[name]`` is the display label (``keysToLabels``)."""
    lab = labels or {}

    def L(names):
        if isinstance(names, str):
            return lab.get(names, names)
        return [lab.get(p, p) for p in names]

    npeers = len(peers)
    if not npeers:
        return []
    stack = np.stack([presence[p] for p in peers])
    count = stack.sum(axis=0)

    def by_pattern(viol: np.ndarray):
        """Yield (mask, present_list, missing_list) per distinct pattern."""
        if not viol.any():
            return
        pat = (stack.astype(np.uint64)
               << np.arange(npeers, dtype=np.uint64)[:, None]).sum(axis=0)
        for v in np.unique(pat[viol]):
            mask = viol & (pat == v)
            bits = [(int(v) >> i) & 1 for i in range(npeers)]
            present = [p for p, b in zip(peers, bits) if b]
            missing = [p for p, b in zip(peers, bits) if not b]
            yield mask, present, missing

    peers_ctx = {"peers": peers, "peersWithLabels": L(peers)}
    if rel == "and":
        # error iff some-but-not-all present (object.js:724-751)
        out = []
        for mask, present, missing in by_pattern((count > 0) & (count < npeers)):
            out.append((mask, "object.and", {
                "present": present, "presentWithLabels": L(present),
                "missing": missing, "missingWithLabels": L(missing)}))
        return out
    if rel == "nand":
        # all present; context splits main (first peer) from the rest
        # (object.js:753-777)
        main, rest = peers[0], peers[1:]
        return [(count == npeers, "object.nand", {
            "main": main, "mainWithLabel": L(main),
            "peers": rest, "peersWithLabels": L(rest)})]
    if rel == "or":
        return [(count == 0, "object.missing", dict(peers_ctx))]
    if rel == "xor":
        # none present -> object.missing; >1 -> object.xor with the row's
        # present list (object.js:851-873)
        out = [(count == 0, "object.missing", dict(peers_ctx))]
        for mask, present, _ in by_pattern(count > 1):
            out.append((mask, "object.xor", {
                **peers_ctx, "present": present,
                "presentWithLabels": L(present)}))
        return out
    if rel == "oxor":
        out = []
        for mask, present, _ in by_pattern(count > 1):
            out.append((mask, "object.oxor", {
                **peers_ctx, "present": present,
                "presentWithLabels": L(present)}))
        return out
    if rel == "with":
        # key present -> every peer present; FIRST missing peer is the
        # context, as in the reference's early return (object.js:815-833)
        main = presence[key]
        out, unclaimed = [], main.copy()
        for p in peers:
            mask = unclaimed & ~presence[p]
            out.append((mask, "object.with", {
                "main": key, "mainWithLabel": L(key),
                "peer": p, "peerWithLabel": L(p)}))
            unclaimed = unclaimed & presence[p]
        return out
    if rel == "without":
        main = presence[key]
        out, unclaimed = [], main.copy()
        for p in peers:
            mask = unclaimed & presence[p]
            out.append((mask, "object.without", {
                "main": key, "mainWithLabel": L(key),
                "peer": p, "peerWithLabel": L(p)}))
            unclaimed = unclaimed & ~presence[p]
        return out
    raise ValueError(f"unknown dependency rel {rel!r}")


def key_count(presence: dict[str, np.ndarray], n: int) -> np.ndarray:
    """Present (non-null) key count per row — powers object.min/max/length
    (``object.js:278-313``)."""
    if not presence:
        return np.zeros(n, dtype=np.int64)
    return np.stack(list(presence.values())).sum(axis=0)
