"""MASS — Mueen's Algorithm for Similarity Search (z-normalized ED profiles).

Re-implementations from the published algorithm descriptions (Mueen et al.,
"The Fastest Similarity Search Algorithm for Time Series Subsequences under
Euclidean Distance") with the same capability surface as the reference:
``mass_pre`` (/root/reference/R/mass-pre.R:32-75), ``mass_v2``
(/root/reference/R/mass_v2.R:45-59), ``mass_v3`` piecewise variant
(/root/reference/R/mass_v3.R:49-110), and the ``dist_profile`` dispatcher
(/root/reference/R/dist_profile.R:69-180).

Skip semantics (shared with all profile kernels): windows whose values are not
all finite, or whose SD is below ``EPS``, are "skip locations" — their
distances are forced to +Inf and non-finite inputs are zero-filled before the
FFT (/root/reference/R/stomp.R:103-115).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import EPS
from .movstats import mov_stats

__all__ = ["MassPre", "mass_pre", "mass_v2", "mass_v3", "dist_profile", "clean_series"]


def clean_series(x: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Zero-fill non-finite values; return (clean_x, skip_mask_per_window).

    skip[i] is True when window i must be masked to +Inf (contains a
    non-finite value, or is flat: sd < EPS) — /root/reference/R/stomp.R:103-115,
    182-186.
    """
    x = np.asarray(x, dtype=np.float64)
    bad = ~np.isfinite(x)
    xc = np.where(bad, 0.0, x)
    p = len(x) - w + 1
    if p <= 0:
        return xc, np.zeros(0, dtype=bool)
    # window contains a bad value  <=>  windowed sum of bad-indicator > 0
    c = np.concatenate(([0], np.cumsum(bad.astype(np.int64))))
    has_bad = (c[w:] - c[:-w]) > 0
    _, sd, _ = mov_stats(xc, w)
    # truly-flat windows detected EXACTLY via sliding min==max: the cumsum
    # variance can round a zero variance up past EPS on large-offset series,
    # which would let different kernels disagree on skip locations
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(xc, w)
    flat = wins.min(axis=1) == wins.max(axis=1)
    skip = has_bad | (sd < EPS) | flat
    return xc, skip


@dataclass
class MassPre:
    """Precomputed per-series state for repeated dist-profile queries.

    Matches the capability of ``mass_pre`` (/root/reference/R/mass-pre.R:70-75):
    padded FFT of the data + moving mean/sd, computed once per series and
    reused for every query window — in the engine this lives in actor state
    keyed by conv_id (SURVEY.md §2.7).
    """

    w: int
    n: int
    data: np.ndarray          # cleaned (zero-filled) series
    data_fft: np.ndarray      # rfft of data, length n
    data_mu: np.ndarray
    data_sig: np.ndarray      # sqrt(ssq) = centered window norm
    skip: np.ndarray          # per-window skip mask


def mass_pre(data: np.ndarray, w: int) -> MassPre:
    data, skip = clean_series(data, w)
    n = len(data)
    mu, _, ssq = mov_stats(data, w)
    sig = np.sqrt(ssq)
    return MassPre(w=w, n=n, data=data, data_fft=np.fft.rfft(data, n=n),
                   data_mu=mu, data_sig=sig, skip=skip)


def _qt_fft(pre: MassPre, query: np.ndarray) -> np.ndarray:
    """Sliding dot products QT[j] = <query, data[j:j+w]> via one FFT product."""
    w, n = pre.w, pre.n
    qr = np.zeros(n)
    qr[:w] = query[::-1]
    prod = np.fft.irfft(pre.data_fft * np.fft.rfft(qr), n=n)
    return prod[w - 1 :]


def _dist_from_qt(pre: MassPre, qt: np.ndarray, q_mu: float, q_sig: float) -> np.ndarray:
    """z-norm ED from sliding dot products: ed = sqrt(2w(1-corr)),
    corr = (QT - w·μq·μj) / (σ̂q·σ̂j) with σ̂ = centered window norm."""
    w = pre.w
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = (qt - w * q_mu * pre.data_mu) / (q_sig * pre.data_sig)
    corr = np.clip(corr, -1.0, 1.0)
    d = np.sqrt(np.maximum(2.0 * w * (1.0 - corr), 0.0))
    d[pre.skip] = np.inf
    return d


def _query_stats(query: np.ndarray) -> tuple[np.ndarray, float, float, bool]:
    query = np.asarray(query, dtype=np.float64)
    bad = ~np.isfinite(query)
    qc = np.where(bad, 0.0, query)
    mu = qc.mean()
    sig = float(np.sqrt(np.sum((qc - mu) ** 2)))
    degenerate = bool(bad.any() or sig < EPS)
    return qc, float(mu), sig, degenerate


def mass_v2(pre: MassPre, query: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Full-length FFT MASS: returns (dist_profile, last_product)
    (/root/reference/R/mass_v2.R:45-59)."""
    qc, q_mu, q_sig, degenerate = _query_stats(query)
    qt = _qt_fft(pre, qc)
    if degenerate:
        return np.full(len(qt), np.inf), qt
    return _dist_from_qt(pre, qt, q_mu, q_sig), qt


def mass_v3(pre: MassPre, query: np.ndarray, k: int = 1024) -> tuple[np.ndarray, np.ndarray]:
    """Piecewise MASS: FFTs over hardware-friendly chunks of size k
    (/root/reference/R/mass_v3.R:49-110). k is rounded up to a power of two
    and clamped to ≥ 2w and ≤ next_pow2(n).

    This is the hot per-query kernel named by the north star; chunking keeps
    each FFT in cache instead of one O(n log n) transform over a huge series.
    """
    w, n, data = pre.w, pre.n, pre.data
    p = n - w + 1
    qc, q_mu, q_sig, degenerate = _query_stats(query)

    k = max(int(k), 2 * w)
    k = 1 << int(np.ceil(np.log2(k)))
    if k >= n:
        return mass_v2(pre, query)

    qt = np.empty(p)
    q_rev = qc[::-1]
    qr = np.zeros(k)
    qr[:w] = q_rev
    q_fft = np.fft.rfft(qr)
    step = k - w + 1
    j = 0
    while j < p:
        hi = min(j + k, n)
        seg = data[j:hi]
        if len(seg) < k:
            seg = np.concatenate([seg, np.zeros(k - len(seg))])
        prod = np.fft.irfft(np.fft.rfft(seg) * q_fft, n=k)
        nwin = min(step, p - j)
        qt[j : j + nwin] = prod[w - 1 : w - 1 + nwin]
        j += step

    if degenerate:
        return np.full(p, np.inf), qt
    return _dist_from_qt(pre, qt, q_mu, q_sig), qt


def dist_profile(
    data: np.ndarray | MassPre,
    query_window: np.ndarray,
    w: int | None = None,
    method: str = "v3",
    k: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatcher mirroring ``dist_profile`` (/root/reference/R/dist_profile.R:69-180):
    method 'v2' | 'v3'; accepts a precomputed :class:`MassPre` for param reuse
    (the reference threads ``params`` recursively; we hold the object).

    Returns (distance_profile, last_product).
    """
    if isinstance(data, MassPre):
        pre = data
    else:
        if w is None:
            w = len(query_window)
        pre = mass_pre(data, w)
    if method == "v2":
        return mass_v2(pre, query_window)
    if method == "v3":
        return mass_v3(pre, query_window, k=k)
    raise ValueError(f"unknown MASS method: {method}")
