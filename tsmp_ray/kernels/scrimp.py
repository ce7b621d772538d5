"""SCRIMP++ — anytime matrix profile: PRE-SCRIMP anchors + random diagonals.

Re-implementation from the published SCRIMP++ algorithm (Zhu et al., "Matrix
Profile XI: SCRIMP++: Time Series Motif Discovery at Interactive Speeds"),
capability-matched to the reference's ``scrimp`` (/root/reference/R/scrimp.R:49-340):

- PRE-SCRIMP (scrimp.R:177-259): anchors sampled every ``floor(w·pre_scrimp)``
  positions in random order; each anchor's full distance profile (MASS) updates
  the profile symmetrically, then the anchor/neighbor diagonal is refined with
  O(1) incremental dot products over ±stride.
- SCRIMP (scrimp.R:277-331): unexplored diagonals in random order, each one a
  cumsum recurrence (shared with :mod:`.mpx`). ``s_size`` bounds how many
  diagonals are evaluated (anytime).

With ``pre_scrimp=0`` and ``s_size=None`` (all diagonals) the result is exact
and equals stomp/mpx — the agreement-matrix property the tests pin
(/root/reference/tests/testthat/test-stamps.R:118-199 pattern).
Randomness is seeded (``rng``) for reproducibility; the reference uses R's RNG
so index sequences differ, but the algorithm is equivalent (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_EZ, exclusion_zone, raise_if_too_short
from .mass import mass_pre, mass_v3
from .mpx import MpxState, _Best, _diag_self, _finalize_self, prepare_series
from .profile_types import MatrixProfile, merge_min

__all__ = ["scrimp", "stamp"]


def _apply_dist_profile(best: _Best, d: np.ndarray, i: int, zone: int, w: int) -> None:
    """Symmetric profile update from one full distance profile of window i.
    _Best holds correlations, so translate ED -> corr: c = 1 - ed^2/(2w)."""
    d = d.copy()
    d[max(0, i - zone) : i + zone + 1] = np.inf
    with np.errstate(invalid="ignore"):
        corr = 1.0 - d * d / (2.0 * w)
    corr[~np.isfinite(d)] = -np.inf
    p = len(corr)
    # row i
    j = int(np.argmax(corr))
    if corr[j] > best.c[i]:
        best.c[i] = corr[j]
        best.j[i] = j
    # columns
    upd = corr > best.c
    best.c[upd] = corr[upd]
    best.j[upd] = i
    # directional
    if i > 0:
        jl = int(np.argmax(corr[:i]))
        if corr[jl] > best.lc[i]:
            best.lc[i] = corr[jl]
            best.lj[i] = jl
    if i < p - 1:
        jr = i + 1 + int(np.argmax(corr[i + 1 :]))
        if corr[jr] > best.rc[i]:
            best.rc[i] = corr[jr]
            best.rj[i] = jr
    left_js = np.arange(p) > i  # windows j with neighbor i on their left
    updl = left_js & (corr > best.lc)
    best.lc[updl] = corr[updl]
    best.lj[updl] = i
    updr = (~left_js) & (corr > best.rc)
    updr[i] = False
    best.rc[updr] = corr[updr]
    best.rj[updr] = i


def _pre_scrimp(state: MpxState, best: _Best, stride: int, zone: int,
                rng: np.random.Generator) -> None:
    x, w, p = state.x, state.w, state.p
    pre = mass_pre(x, w)
    anchors = np.arange(0, p, max(1, stride))
    rng.shuffle(anchors)
    for i in anchors:
        i = int(i)
        if state.skip[i]:
            continue
        d, qt = mass_v3(pre, x[i : i + w])
        _apply_dist_profile(best, d, i, zone, w)
        # diagonal refinement around (i, j*) — incremental dots both directions
        dm = d.copy()
        dm[max(0, i - zone) : i + zone + 1] = np.inf
        j = int(np.argmin(dm))
        if not np.isfinite(dm[j]):
            continue
        dot0 = qt[j]
        # forward
        dot = dot0
        for q in range(1, stride):
            ii, jj = i + q, j + q
            if ii >= p or jj >= p:
                break
            dot = dot - x[ii - 1] * x[jj - 1] + x[ii + w - 1] * x[jj + w - 1]
            _update_pair(state, best, ii, jj, dot)
        # backward
        dot = dot0
        for q in range(1, stride):
            ii, jj = i - q, j - q
            if ii < 0 or jj < 0:
                break
            dot = dot - x[ii + w] * x[jj + w] + x[ii] * x[jj]
            _update_pair(state, best, ii, jj, dot)


def _update_pair(state: MpxState, best: _Best, i: int, j: int, dot: float) -> None:
    if state.skip[i] or state.skip[j]:
        return
    w = state.w
    corr = (dot - w * state.mu[i] * state.mu[j]) * state.invn[i] * state.invn[j]
    corr = min(corr, 1.0)
    if corr > best.c[i]:
        best.c[i] = corr
        best.j[i] = j
    if corr > best.c[j]:
        best.c[j] = corr
        best.j[j] = i
    lo, hi = (i, j) if i < j else (j, i)
    if corr > best.rc[lo]:
        best.rc[lo] = corr
        best.rj[lo] = hi
    if corr > best.lc[hi]:
        best.lc[hi] = corr
        best.lj[hi] = lo


def scrimp(
    data: np.ndarray,
    w: int,
    ez: float = DEFAULT_EZ,
    s_size: int | float | None = None,
    pre_scrimp: float = 0.25,
    seed: int = 7,
) -> MatrixProfile:
    """SCRIMP++ self-join. ``s_size``: int = number of diagonals, float in
    (0,1] = fraction, None = all (exact). ``pre_scrimp``: anchor stride as a
    fraction of w; 0 disables the PRE phase."""
    if w < 4:
        raise ValueError("window_size must be at least 4")  # scrimp.R:60
    raise_if_too_short(len(data), w, ceiling=True)  # scrimp.R:95-97
    state = prepare_series(data, w)
    zone = exclusion_zone(w, ez)
    rng = np.random.default_rng(seed)
    best = _Best(state.p)

    if pre_scrimp and pre_scrimp > 0:
        stride = max(1, int(np.floor(w * pre_scrimp)))
        _pre_scrimp(state, best, stride, zone, rng)

    diags = np.arange(zone + 1, state.p, dtype=np.int64)
    rng.shuffle(diags)
    if s_size is not None:
        if isinstance(s_size, float) and s_size <= 1.0:
            ndiag = int(np.ceil(s_size * len(diags)))
        else:
            ndiag = int(s_size)
        diags = diags[:ndiag]
    for k in diags:
        _diag_self(state, int(k), best)
    return _finalize_self(state, best, ez, "scrimp")


def stamp(
    data: np.ndarray,
    w: int,
    query: np.ndarray | None = None,
    ez: float = DEFAULT_EZ,
    s_size: int | None = None,
    seed: int = 7,
) -> MatrixProfile:
    """STAMP — anytime MP via per-query MASS in random order
    (/root/reference/R/stamp.R:68-230). ``s_size`` bounds sampled queries
    (stamp.R:141-143); full run is exact and equals stomp/mpx.

    Self-join only here; AB-joins route to :func:`..stomp.stomp` /
    :func:`.mpx` which compute both orientations in one pass.
    """
    if w < 4:
        raise ValueError("window_size must be at least 4")  # stamp.R:95
    if query is not None:
        from .stomp import stomp as _stomp
        return _stomp(data, w, query=query, ez=ez)  # stomp() mirrors stamp.R:103-109
    raise_if_too_short(len(data), w, ceiling=True)  # stamp.R:106-108
    state = prepare_series(data, w)
    zone = exclusion_zone(w, ez)
    pre = mass_pre(state.x, w)
    best = _Best(state.p)
    order = np.arange(state.p)
    rng = np.random.default_rng(seed)
    rng.shuffle(order)
    if s_size is not None:
        order = order[: int(s_size)]
    for i in order:
        i = int(i)
        if state.skip[i]:
            continue
        d, _ = mass_v3(pre, state.x[i : i + w])
        _apply_dist_profile(best, d, i, zone, w)
    prof = _finalize_self(state, best, ez, "stamp")
    return prof
