"""mSTOMP — multidimensional matrix profile (k-of-d subset distances).

Re-implementation of the algorithm behind the reference's ``mstomp``
(/root/reference/R/mstomp.R:59-319): per-dimension STOMP dot-product
recurrences (mstomp.R:169-207), per-index ascending sort of the d
z-normalized distances, cumulative means giving the best (k+1)-dimension
subset distance (mstomp.R:219-259), and ``must_dim``/``exc_dim`` masking
(mstomp.R:209-217, 266-286).

Output: mp/pi as (d' × p) matrices, row k = the (k+1)-dimensional profile.
The engine runs this per conversation over the 3 derived transcript signals
(cadence / text-length / tool-rate), SURVEY.md §1.2.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_EZ, exclusion_zone, raise_if_too_short
from .mass import mass_pre, _qt_fft, clean_series
from .movstats import mov_stats

__all__ = ["mstomp", "MultiMatrixProfile"]

from dataclasses import dataclass


@dataclass
class MultiMatrixProfile:
    mp: np.ndarray      # (d' × p)
    pi: np.ndarray      # (d' × p) int64
    w: int
    ez: float
    n_dim: int
    must: list
    exc: list
    # directional per-dimension profiles (/root/reference/R/mstomp.R:294-306);
    # engine convention (matches kernels/stomp.py): left = min over j < i,
    # right = min over j > i, both after exclusion-zone masking
    lmp: np.ndarray | None = None
    lpi: np.ndarray | None = None
    rmp: np.ndarray | None = None
    rpi: np.ndarray | None = None


def mstomp(
    data: np.ndarray,
    w: int,
    ez: float = DEFAULT_EZ,
    must_dim: list[int] | None = None,
    exc_dim: list[int] | None = None,
    index_range: tuple[int, int] | None = None,
) -> MultiMatrixProfile:
    """``data``: (n × d) float64 matrix (1-D input is treated as n×1).

    ``index_range=(lo, hi)`` computes only query indices [lo, hi) — the
    reference's ``mstomp_par`` index-range partitioning
    (/root/reference/R/mstomp-par.R:110-127): the QT recurrence is re-seeded
    at ``lo`` by one FFT sliding-dot per dimension, then recurs as usual.
    Each query's distance row spans ALL of [0, p), so mp/pi/lmp/rmp for the
    range are final — shards concatenate along the index axis with no merge
    (asserted sharded == full in tests)."""
    data = np.asarray(data, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    n, d = data.shape
    p = n - w + 1
    if p < 1:
        raise ValueError(f"window {w} longer than series {n}")
    raise_if_too_short(n, w, ceiling=False)  # mstomp.R:101-103 (plain n/2)
    if w < 4:
        raise ValueError("window_size must be at least 4")
    must = sorted(set(must_dim or []))
    exc = sorted(set(exc_dim or []))
    if set(must) & set(exc):
        raise ValueError("must_dim and exc_dim overlap")
    # mirror mstomp.R's argument guards (test-stamps.R:22-30)
    for name, dims in (("must_dim", must), ("exc_dim", exc)):
        if len(dims) > d:
            raise ValueError(f"too many {name}: {len(dims)} > {d} dims")
        bad = [j for j in dims if not (0 <= j < d)]
        if bad:
            raise ValueError(f"{name} indices {bad} out of range for "
                             f"{d}-dim data")
    keep = [j for j in range(d) if j not in exc]
    n_keep = len(keep)
    n_must = len(must)
    zone = exclusion_zone(w, ez)

    lo, hi = index_range if index_range is not None else (0, p)
    if not (0 <= lo < hi <= p):
        raise ValueError(f"bad index_range {index_range} for profile length {p}")
    p_out = hi - lo

    # per-dim precomputation
    xs, mus, sigs, skips, qt0s, pres = [], [], [], [], [], []
    for j in keep:
        xc, skip = clean_series(data[:, j], w)
        mu, _, ssq = mov_stats(xc, w)
        sig = np.sqrt(ssq)
        pre = mass_pre(xc, w)
        xs.append(xc)
        mus.append(mu)
        sigs.append(sig)
        skips.append(skip)
        pres.append(pre)
        qt0s.append(_qt_fft(pre, xc[:w]))
    X = np.stack(xs)          # (dk × n)
    MU = np.stack(mus)        # (dk × p)
    SIG = np.stack(sigs)
    SKIP = np.stack(skips)
    QT_first = np.stack(qt0s)  # row 0 of each dim's QT matrix (== column 0)

    must_mask = np.zeros(n_keep, dtype=bool)
    for m_dim in must:
        must_mask[keep.index(m_dim)] = True

    mp = np.full((n_keep, p_out), np.inf)
    pi = np.full((n_keep, p_out), -1, dtype=np.int64)
    lmp = np.full((n_keep, p_out), np.inf)
    lpi = np.full((n_keep, p_out), -1, dtype=np.int64)
    rmp = np.full((n_keep, p_out), np.inf)
    rpi = np.full((n_keep, p_out), -1, dtype=np.int64)

    def _directional(avg_row: np.ndarray, k: int, i: int) -> None:
        """Fill mp/lmp/rmp row k at query index i (global; stored at column
        i - lo) from the k-dim averaged distance row (squared units)."""
        c = i - lo
        j = int(np.argmin(avg_row))
        if np.isfinite(avg_row[j]):
            mp[k, c] = avg_row[j]
            pi[k, c] = j
        if i > 0:
            jl = int(np.argmin(avg_row[:i]))
            if np.isfinite(avg_row[jl]):
                lmp[k, c] = avg_row[jl]
                lpi[k, c] = jl
        if i < p - 1:
            jr = i + 1 + int(np.argmin(avg_row[i + 1 :]))
            if np.isfinite(avg_row[jr]):
                rmp[k, c] = avg_row[jr]
                rpi[k, c] = jr

    if lo == 0:
        qt = QT_first.copy()  # (dk × p): row lo of each dim's QT matrix
    else:
        # re-seed the recurrence at lo: one FFT sliding-dot per dim
        # (mstomp-par.R partitions re-seed the same way via mass_pre)
        qt = np.stack([_qt_fft(pres[j], X[j, lo : lo + w])
                       for j in range(n_keep)])
    for i in range(lo, hi):
        if i > lo:
            new = (qt[:, :-1]
                   - X[:, : p - 1] * X[:, i - 1 : i]
                   + X[:, w:n] * X[:, i + w - 1 : i + w])
            qt[:, 1:] = new
            qt[:, 0] = QT_first[:, i]
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = (qt - w * MU[:, i : i + 1] * MU) / (SIG[:, i : i + 1] * SIG)
        corr = np.clip(corr, -1.0, 1.0)
        # SQUARED distances: the k-of-d average is over squared EDs, sqrt at
        # the very end (/root/reference/R/mstomp.R:234-263 + sqrt at :262-264)
        dist = np.maximum(2.0 * w * (1.0 - corr), 0.0)
        dist[SKIP] = np.inf
        if SKIP[:, i].any():  # query window degenerate in any kept dim
            dist[:] = np.inf  # (mstomp.R:204-206)
        dist[:, max(0, i - zone) : i + zone + 1] = np.inf

        if n_must:
            # must dims always count; sort only the optional dims
            base = dist[must_mask].sum(axis=0)
            opt = np.sort(dist[~must_mask], axis=0)
            cum = np.vstack([np.zeros(p), np.cumsum(opt, axis=0)]) if opt.size else np.zeros((1, p))
            for k in range(n_must - 1, n_keep):
                n_opt = k + 1 - n_must
                tot = (base + cum[n_opt]) / (k + 1)
                _directional(tot, k, i)
        else:
            srt = np.sort(dist, axis=0)
            cum = np.cumsum(srt, axis=0)
            denom = np.arange(1, n_keep + 1)[:, None]
            avg = cum / denom
            for k in range(n_keep):
                _directional(avg[k], k, i)

    # back to ED (reference sqrt-at-end, mstomp.R:262-264)
    return MultiMatrixProfile(mp=np.sqrt(mp), pi=pi, w=w, ez=ez, n_dim=n_keep,
                              must=must, exc=exc,
                              lmp=np.sqrt(lmp), lpi=lpi,
                              rmp=np.sqrt(rmp), rpi=rpi)
