"""Blocked-matmul exact matrix profile — the small-window fast path.

For small windows (w ≲ 32, our per-turn signals), the O(n²·w) brute-force
computation expressed as blocked BLAS matmuls of unit-normalized windows beats
the O(n²) mpx recurrence: per block-pair one dgemm (compute-dense) plus
argmax passes over a block that FITS IN L2 CACHE, so the kernel stops being
DRAM-bandwidth-bound and scales across actor processes — the property the
N→4N efficiency target needs. For large w, mpx/stomp win (w multiplies the
FLOPs here but not there); :class:`..stages.profile_stage.ProfileKernel`
selects per window size.

Semantics identical to stomp/mpx (same exclusion zone, skip masking,
lmp/lpi/rmp/rpi; ed = sqrt(2w(1-ρ)), /root/reference/src/mpx.cpp:84-86).
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_EZ, exclusion_zone
from .mass import clean_series
from .movstats import mov_stats
from .profile_types import MatrixProfile, empty_profile

__all__ = ["blocked_mp", "strip_splits"]


def strip_splits(p: int, zone: int, n_shards: int,
                 block: int = 256) -> list[tuple[int, int]]:
    """Equal-AREA row-block strips of the upper triangle, snapped to
    multiples of ``block``.

    Used to fan one conversation's blocked kernel out as Ray tasks
    (``row_range=`` below): strip k owns rows ``[lo, hi)`` and scans columns
    ``[i0, p)``, so the strips partition the valid (i, j) pairs exactly.
    Snapping to the kernel's own block grid means every (i-block, j-block)
    dgemm a strip computes has bit-identical operands and shapes to the full
    single-pass kernel, so the merged DISTANCE arrays (mp/lmp/rmp) are
    bit-identical to ``blocked_mp(data, w)``. Indices may differ only where
    multiple neighbors are equally minimal: the kernel compares RAW dgemm
    correlations (which can exceed 1.0 by an ulp) but partials carry the
    CLAMPED ed, so the merge resolves exact-distance ties by ascending strip
    order instead of by raw-correlation ulps. Every merged index is still an
    exact argmin (pinned by test on tie-heavy integer walks) — the same
    min-merge contract as the mpx diagonal shards and the reference's own
    parallel merge (/root/reference/R/stomp-par.R:249-264)."""
    if p <= 0 or n_shards < 1:
        return []
    rows = np.arange(p, dtype=np.float64)
    per_row = np.clip(p - zone - 1 - rows, 0.0, None)
    starts = np.arange(0, p, block)
    cost = np.add.reduceat(per_row, starts)
    cum = cost.cumsum()
    if cum[-1] <= 0:
        return []
    idx = np.arange(len(starts))
    edges = np.searchsorted(cum, np.linspace(0, cum[-1], n_shards + 1)[1:-1])
    out = []
    for grp in np.split(idx, edges):
        if len(grp):
            lo = int(starts[grp[0]])
            hi = int(min(starts[grp[-1]] + block, p))
            out.append((lo, hi))
    return out


def _unit_windows(data: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    from numpy.lib.stride_tricks import sliding_window_view

    xc, skip = clean_series(data, w)
    mu, _, ssq = mov_stats(xc, w)
    with np.errstate(divide="ignore"):
        invn = 1.0 / np.sqrt(ssq)
    invn[~np.isfinite(invn)] = 0.0
    Z = (sliding_window_view(xc, w) - mu[:, None]) * invn[:, None]
    return np.ascontiguousarray(Z), skip


def blocked_mp(data: np.ndarray, w: int, ez: float = DEFAULT_EZ,
               block: int = 256,
               row_range: tuple[int, int] | None = None) -> MatrixProfile:
    """Exact self-join MP via blocked unit-window matmuls.

    ``row_range=(lo, hi)`` restricts the OUTER (row) loop to window indices
    ``[lo, hi)`` while columns still scan ``[i0, p)`` — a strip of the upper
    triangle. ``lo`` must sit on the ``block`` grid (use
    :func:`strip_splits`); the returned profile is full-length with
    untouched entries at inf/-1, ready for ``profile_types.merge_min`` in
    ascending-strip order."""
    Z, skip = _unit_windows(data, w)
    p = Z.shape[0]
    if p < 1:
        raise ValueError(f"window {w} longer than series {len(data)}")
    zone = exclusion_zone(w, ez)
    row_lo, row_hi = (0, p) if row_range is None else row_range
    row_hi = min(row_hi, p)
    if row_lo % block:
        raise ValueError(
            f"row_range lo={row_lo} must sit on the block grid ({block}) "
            "for bit-parity with the single-pass kernel (strip_splits)")

    NEG = -np.inf
    best_c = np.full(p, NEG)
    best_j = np.full(p, -1, dtype=np.int64)
    lc = np.full(p, NEG)
    lj = np.full(p, -1, dtype=np.int64)
    rc = np.full(p, NEG)
    rj = np.full(p, -1, dtype=np.int64)

    any_skip = bool(skip.any())
    Cbuf = np.empty((block, block))
    for i0 in range(row_lo, row_hi, block):
        i1 = min(i0 + block, p)
        Zi = Z[i0:i1]
        ski = skip[i0:i1]
        for j0 in range(i0, p, block):
            j1 = min(j0 + block, p)
            if i1 - i0 == block and j1 - j0 == block:
                C = Cbuf  # reuse (np.dot out= needs a C-contiguous array)
                np.dot(Zi, Z[j0:j1].T, out=C)
            else:
                C = Zi @ Z[j0:j1].T  # unit windows: C IS the correlation
            if any_skip:
                C[ski, :] = NEG
                C[:, skip[j0:j1]] = NEG
            # exclusion + self/lower masking: pair (i, j) valid iff j > i+zone.
            # Only block pairs touching the diagonal band need the mask.
            if j0 <= (i1 - 1) + zone:
                ii = np.arange(i0, i1)[:, None]
                jj = np.arange(j0, j1)[None, :]
                C[jj <= ii + zone] = NEG

            # row side: j is the RIGHT neighbor of i
            ja = np.argmax(C, axis=1)
            va = C[np.arange(i1 - i0), ja]
            upd = va > rc[i0:i1]
            rc[i0:i1][upd] = va[upd]
            rj[i0:i1][upd] = ja[upd] + j0
            updm = va > best_c[i0:i1]
            best_c[i0:i1][updm] = va[updm]
            best_j[i0:i1][updm] = ja[updm] + j0

            # column side: i is the LEFT neighbor of j
            ib = np.argmax(C, axis=0)
            vb = C[ib, np.arange(j1 - j0)]
            updl = vb > lc[j0:j1]
            lc[j0:j1][updl] = vb[updl]
            lj[j0:j1][updl] = ib[updl] + i0
            updm2 = vb > best_c[j0:j1]
            best_c[j0:j1][updm2] = vb[updm2]
            best_j[j0:j1][updm2] = ib[updm2] + i0

    def to_ed(c: np.ndarray) -> np.ndarray:
        cc = np.minimum(c, 1.0)
        d = np.sqrt(np.maximum(2.0 * w * (1.0 - cc), 0.0))
        d[~np.isfinite(c)] = np.inf
        return d

    prof = empty_profile(p, w, ez, directional=True, algorithm="blocked")
    prof.mp = to_ed(best_c)
    prof.pi = best_j
    prof.lmp = to_ed(lc)
    prof.lpi = lj
    prof.rmp = to_ed(rc)
    prof.rpi = rj
    return prof
