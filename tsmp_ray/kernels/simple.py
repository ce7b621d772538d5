"""SiMPle — multidimensional NON-normalized matrix profile (music analysis).

Re-implementation of the reference's ``simple_fast``
(/root/reference/R/simple.R:29-248) and its ``mass_simple_pre``/``mass_simple``
helpers (simple.R:250-320): distance between windows i, j is the raw
(no z-normalization) squared Euclidean distance summed over dimensions,

    d²(i,j) = Σ_dims ( ΣX_i² + ΣX_j² − 2·<X_i, X_j> ),

maintained by the same streaming dot-product recurrence as STOMP, vectorized
across dimensions. Self-join uses the standard exclusion zone; AB-join uses
none. Output mp is the sqrt of the minimal squared distance (matching the
reference's sqrt-at-end), pi its index.

Engine mapping: the ``normalize=False`` variant of the multivariate
per-conversation kernel (SURVEY.md §2.4 simple_fast row).
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_EZ, exclusion_zone, raise_if_too_short
from .profile_types import MatrixProfile, empty_profile

__all__ = ["simple_fast"]


def _sliding_dots(data_col: np.ndarray, query_win_col: np.ndarray) -> np.ndarray:
    """<query_window, data[j:j+w]> for all j, one FFT per dimension."""
    n = len(data_col)
    w = len(query_win_col)
    qr = np.zeros(n)
    qr[:w] = query_win_col[::-1]
    prod = np.fft.irfft(np.fft.rfft(data_col) * np.fft.rfft(qr), n=n)
    return prod[w - 1 :]


def simple_fast(
    data: np.ndarray,
    w: int,
    query: np.ndarray | None = None,
    ez: float = DEFAULT_EZ,
) -> MatrixProfile:
    """``data`` (and ``query``): (n × d) matrices; 1-D input = n×1."""
    data = np.asarray(data, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    join = query is not None
    if join:
        query = np.asarray(query, dtype=np.float64)
        if query.ndim == 1:
            query = query[:, None]
        ez_eff = 0.0
    else:
        query = data
        ez_eff = ez
    if w < 4:
        raise ValueError("window_size must be at least 4")
    if join and query.shape[1] != data.shape[1]:
        raise ValueError(
            f"data and query dimensions must be the same "
            f"({data.shape[1]} vs {query.shape[1]} — simple.R:72-78)")
    # simple.R:116-121 (plain n/2, covers w > n too)
    raise_if_too_short(data.shape[0], w, ceiling=False,
                       what="reference time series")
    raise_if_too_short(query.shape[0], w, ceiling=False,
                       what="query time series")
    n, d = data.shape
    nq = query.shape[0]
    p = n - w + 1          # profile over data windows (rows iterate data)
    pq = nq - w + 1        # columns: query windows
    zone = exclusion_zone(w, ez_eff) if not join else 0

    # per-dim window sums of squares
    def win_sumsq(x: np.ndarray) -> np.ndarray:
        c = np.concatenate([np.zeros((1, d)), np.cumsum(x * x, axis=0)])
        return c[w:] - c[:-w]

    sumx2_q = win_sumsq(query)       # (pq × d) — columns side
    sumy2 = (data[:w] ** 2).sum(axis=0)  # running data-window sums (d,)

    # initial dot products: row 0 (data window 0 vs all query windows) and
    # column seeds (all data windows vs query window 0)
    qt = np.stack([_sliding_dots(query[:, j], data[:w, j]) for j in range(d)],
                  axis=1)             # (pq × d)
    first = np.stack([_sliding_dots(data[:, j], query[:w, j]) for j in range(d)],
                     axis=1)          # (p × d)

    prof = empty_profile(p, w, ez_eff, directional=False, algorithm="simple_fast")
    prof.join = join

    dropval = data[0].copy()
    for i in range(p):
        if i > 0:
            win_end = data[i + w - 1]
            qt[1:] = (qt[:-1]
                      - query[: pq - 1] * dropval[None, :]
                      + query[w : pq + w - 1] * win_end[None, :])
            qt[0] = first[i]
            sumy2 = sumy2 - dropval**2 + win_end**2
            dropval = data[i].copy()
        dist = (sumx2_q - 2.0 * qt + sumy2[None, :]).sum(axis=1)
        if not join and zone > 0:
            dist[max(0, i - zone) : i + zone + 1] = np.inf
        j = int(np.argmin(dist))
        val = dist[j]
        if np.isfinite(val):
            prof.mp[i] = np.sqrt(max(val, 0.0))
            prof.pi[i] = j
    return prof
