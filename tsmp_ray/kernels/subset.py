"""Subset operators on profile objects — the engine analog of the reference's
``[`` / ``head`` / ``tail`` S3 methods with offset bookkeeping
(/root/reference/R/subset.R:370-470 base slice, :600-680 head/tail, plus the
per-class index rebasing at :8-260; tested by test-subset.R).

``subset_profile(prof, start, stop)`` slices a contiguous 0-based DATA index
range [start, stop): the profile keeps the windows fully inside the range,
``pi``-family indices are rebased by ``-start`` (out-of-range neighbors get
the engine's -1 sentinel), and the accumulated offset is recorded in
``prof.extra['offset']`` so downstream mining results can rebase too.

Mining-result rebasers mirror the derived-class methods: chains drop below
length 3, motif pairs below 2 members, discords below 1 (subset.R:27-45,
150-200, 220-260); salient indexes filter to range (:53-72); annotation
vectors slice by data position (:80-98).
"""

from __future__ import annotations

import numpy as np

from .profile_types import MatrixProfile

__all__ = ["subset_profile", "head_profile", "tail_profile",
           "rebase_chains", "rebase_motifs", "rebase_discords",
           "rebase_salient", "subset_annotation"]


def _rebase(idx: np.ndarray, offset: int, size: int) -> np.ndarray:
    out = idx.copy()
    valid = out >= 0
    out[valid] -= offset
    out[valid & ((out < 0) | (out >= size))] = -1
    return out


def subset_profile(prof: MatrixProfile, start: int, stop: int) -> MatrixProfile:
    """Contiguous data-range slice [start, stop), 0-based (the reference
    requires continuous ascending indices and ≥ 2w length, subset.R:395-404)."""
    n_data = len(prof.mp) + prof.w - 1
    if not (0 <= start < stop <= n_data):
        raise ValueError("subset out of range")
    if stop - start < 2 * prof.w:
        raise ValueError(f"subset must be at least twice the window: {2 * prof.w}")
    p_new = (stop - start) - prof.w + 1
    out = prof.copy()
    sl = slice(start, start + p_new)
    out.mp = prof.mp[sl].copy()
    out.pi = _rebase(prof.pi[sl], start, p_new)
    if not prof.join:
        for mp_name, pi_name in (("lmp", "lpi"), ("rmp", "rpi")):
            mp_a, pi_a = getattr(prof, mp_name), getattr(prof, pi_name)
            if mp_a is not None:
                setattr(out, mp_name, mp_a[sl].copy())
                setattr(out, pi_name, _rebase(pi_a[sl], start, p_new))
    out.extra = dict(prof.extra)
    out.extra["offset"] = prof.extra.get("offset", 0) + start
    return out


def head_profile(prof: MatrixProfile, n: int | None = None) -> MatrixProfile:
    """First ``n`` data points (default 2w — subset.R:654-660); negative n
    drops ``|n|`` from the end."""
    n_data = len(prof.mp) + prof.w - 1
    if n is None:
        n = 2 * prof.w
    stop = n if n > 0 else n_data - abs(n)
    return subset_profile(prof, 0, stop)


def tail_profile(prof: MatrixProfile, n: int | None = None) -> MatrixProfile:
    """Last ``n`` data points (default 2w — subset.R:616-622); negative n
    drops ``|n|`` from the start."""
    n_data = len(prof.mp) + prof.w - 1
    if n is None:
        n = 2 * prof.w
    start = n_data - n if n > 0 else abs(n)
    return subset_profile(prof, start, n_data)


def rebase_chains(chains: dict, offset: int, mp_size: int) -> dict:
    """Chains: shift by -offset, keep in-range links, drop chains < 3 long
    (subset.R:8-45)."""
    def shift(c):
        c = [j - offset for j in c]
        return [j for j in c if 0 <= j < mp_size]

    kept = [s for s in (shift(c) for c in chains["chains"]) if len(s) >= 3]
    best = shift(chains["best"])
    return {"chains": kept, "best": best}


def rebase_motifs(motifs: list[dict], offset: int, mp_size: int) -> list[dict]:
    """Motif sets: shift, filter in-range, drop sets with < 2 motif windows
    (subset.R:220-260)."""
    out = []
    for m in motifs:
        pair = [j - offset for j in m["motifs"]]
        pair = [j for j in pair if 0 <= j < mp_size]
        if len(pair) < 2:
            continue
        neigh = [j - offset for j in m.get("neighbors", [])]
        out.append({**m, "motifs": pair,
                    "neighbors": [j for j in neigh if 0 <= j < mp_size]})
    return out


def rebase_discords(discords: list[dict], offset: int, mp_size: int) -> list[dict]:
    """Discords: shift, drop out-of-range (subset.R:150-200)."""
    out = []
    for d in discords:
        j = d["discord"] - offset
        if not (0 <= j < mp_size):
            continue
        neigh = [k - offset for k in d.get("neighbors", [])]
        out.append({**d, "discord": j,
                    "neighbors": [k for k in neigh if 0 <= k < mp_size]})
    return out


def rebase_salient(salient: dict, offset: int, mp_size: int) -> dict:
    """Salient indexes: shift + filter, keeping idx_bit_size aligned
    (subset.R:53-72)."""
    idx = np.asarray(salient["indexes"]) - offset
    keep = (idx >= 0) & (idx < mp_size)
    bits = np.asarray(salient["idx_bit_size"][: len(idx)])
    return {**salient, "indexes": idx[keep],
            "idx_bit_size": bits[keep]}


def subset_annotation(av: np.ndarray, start: int, stop: int, w: int) -> np.ndarray:
    """Annotation vector for the data slice [start, stop): positions start..
    start+p_new-1 of the original av (subset.R:80-98)."""
    p_new = (stop - start) - w + 1
    return np.asarray(av)[start : start + p_new].copy()
