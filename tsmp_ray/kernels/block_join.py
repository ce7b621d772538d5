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

__all__ = ["blocked_mp"]


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
               block: int = 256) -> MatrixProfile:
    """Exact self-join MP via blocked unit-window matmuls."""
    Z, skip = _unit_windows(data, w)
    p = Z.shape[0]
    if p < 1:
        raise ValueError(f"window {w} longer than series {len(data)}")
    zone = exclusion_zone(w, ez)

    NEG = -np.inf
    best_c = np.full(p, NEG)
    best_j = np.full(p, -1, dtype=np.int64)
    lc = np.full(p, NEG)
    lj = np.full(p, -1, dtype=np.int64)
    rc = np.full(p, NEG)
    rj = np.full(p, -1, dtype=np.int64)

    any_skip = bool(skip.any())
    Cbuf = np.empty((block, block))
    for i0 in range(0, p, block):
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
