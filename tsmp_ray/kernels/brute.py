"""Brute-force O(n²·w) matrix-profile oracle.

The trusted reference for every fast kernel (SURVEY.md §5 engine test plan #1).
Direct per-pair z-normalized Euclidean distance with explicit means/SDs —
deliberately naive so it can't share a bug with the optimized paths.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_EZ, EPS, exclusion_zone
from .mass import clean_series
from .profile_types import MatrixProfile, empty_profile


def _znorm_windows(x: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """All z-normalized windows (p×w) + per-window validity mask."""
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(x, w).astype(np.float64)
    mu = wins.mean(axis=1, keepdims=True)
    sd = wins.std(axis=1, keepdims=True)  # population
    ok = sd[:, 0] >= EPS
    sd_safe = np.where(sd < EPS, 1.0, sd)
    return (wins - mu) / sd_safe, ok


def brute_mp(
    data: np.ndarray,
    w: int,
    query: np.ndarray | None = None,
    ez: float = DEFAULT_EZ,
) -> MatrixProfile:
    """Exact matrix profile by direct pairwise distance.

    Self-join when ``query is None`` (exclusion zone ``round(w*ez+eps)``),
    AB-join otherwise (no exclusion zone — /root/reference/R/stomp.R:54-58).
    For AB-join: mp[i] = distance from data-window i to nearest query-window j
    (reference orientation: ``query`` is the second series B; profile is over A).
    """
    data_c, skip_a = clean_series(data, w)
    za, ok_a = _znorm_windows(data_c, w)
    ok_a &= ~skip_a
    if query is None:
        zb, ok_b, skip_b = za, ok_a, skip_a
        zone = exclusion_zone(w, ez)
        join = False
    else:
        query_c, skip_b = clean_series(query, w)
        zb, ok_b = _znorm_windows(query_c, w)
        ok_b &= ~skip_b
        zone = 0
        join = True

    pa, pb = za.shape[0], zb.shape[0]
    # d(i,j) = sqrt(2w(1 - corr)) with corr = <za_i, zb_j>/w
    corr = za @ zb.T / w
    np.clip(corr, -1.0, 1.0, out=corr)
    dist = np.sqrt(np.maximum(2.0 * w * (1.0 - corr), 0.0))
    dist[~ok_a, :] = np.inf
    dist[:, ~ok_b] = np.inf
    if not join:
        # reference masks |i-j| <= zone inclusive (/root/reference/R/stomp.R:176-180)
        for i in range(pa):
            lo, hi = max(0, i - zone), min(pb, i + zone + 1)
            dist[i, lo:hi] = np.inf

    prof = empty_profile(pa, w, ez if not join else 0.0,
                         directional=not join, algorithm="brute")
    prof.join = join
    finite_any = np.isfinite(dist).any(axis=1)
    j_star = np.argmin(dist, axis=1)
    prof.mp = dist[np.arange(pa), j_star]
    prof.pi = np.where(finite_any, j_star, -1).astype(np.int64)
    prof.mp[~finite_any] = np.inf

    if not join:
        for i in range(pa):
            if i > 0:
                row = dist[i, :i]
                j = int(np.argmin(row))
                if np.isfinite(row[j]):
                    prof.lmp[i] = row[j]
                    prof.lpi[i] = j
            if i < pa - 1:
                row = dist[i, i + 1 :]
                j = int(np.argmin(row))
                if np.isfinite(row[j]):
                    prof.rmp[i] = row[j]
                    prof.rpi[i] = i + 1 + j
    return prof


def brute_dist_profile(data: np.ndarray, query_window: np.ndarray) -> np.ndarray:
    """Distance profile of one query window against every data window."""
    w = len(query_window)
    data_c, skip = clean_series(data, w)
    za, ok = _znorm_windows(data_c, w)
    q = np.asarray(query_window, dtype=np.float64)
    q = np.where(np.isfinite(q), q, 0.0)
    mu, sd = q.mean(), q.std()
    if sd < EPS or not np.isfinite(query_window).all():
        return np.full(za.shape[0], np.inf)
    zq = (q - mu) / sd
    corr = np.clip(za @ zq / w, -1.0, 1.0)
    d = np.sqrt(np.maximum(2.0 * w * (1.0 - corr), 0.0))
    d[~ok | skip] = np.inf
    return d
