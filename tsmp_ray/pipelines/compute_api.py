"""Unified single-series entry points mirroring the reference's APIs.

- :func:`compute` — the MPF unified API (/root/reference/R/compute.R:45-144):
  exact → mpx; ``sample_pct < 1`` → scrimp with ``s_size = floor(pct·n)``;
  windows list / no window → pan-MP over an upper-bound-derived sweep.
- :func:`tsmp` — the classic dispatcher (/root/reference/R/tsmp.R:111-282):
  ``mode`` selects stomp/stamp/scrimp/mstomp/simple/valmod/pmp, with optional
  PAA pre-reduction of data and window (tsmp.R:136-154).
- :func:`analyze_series` — compute → motifs(k=3) → discords(k=3)
  (/root/reference/R/analyze.R:44-73).

These operate on ONE numpy series (the per-conversation unit); the Dataset
pipelines in :mod:`.analyze` distribute them.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_EZ
from ..kernels.mining import find_discords, find_motifs, pmp, pmp_upper_bound, valmod
from ..kernels.movstats import paa
from ..kernels.mpx import mpx
from ..kernels.mstomp import mstomp
from ..kernels.scrimp import scrimp, stamp
from ..kernels.simple import simple_fast
from ..kernels.stomp import stomp


def compute(data: np.ndarray, windows=None, query: np.ndarray | None = None,
            sample_pct: float = 1.0, threshold: float | None = 0.98,
            ez: float = DEFAULT_EZ, seed: int = 7):
    """Unified API (compute.R:61-107). For the pan path, ``threshold``
    prunes windows above :func:`pmp_upper_bound` exactly like
    compute.R:96-99 (an explicit list is filtered, a missing list becomes
    seq(10, min(n/2, upper), length.out=20)), and the profiles computed
    DURING the bound search are merged into the returned pan exactly like
    compute.R:105 (``pmp(..., pmp_obj = res)`` — the result's ``w`` set is
    the bound trajectory ∪ the filtered request, nothing recomputed);
    ``threshold=None`` skips the bound and sweeps the given windows
    as-is."""
    data = np.asarray(data, dtype=np.float64)
    if windows is not None and np.isscalar(windows):
        w = int(windows)
        if query is not None:
            return mpx(data, w, query=np.asarray(query, dtype=np.float64))
        if sample_pct >= 1.0:
            return mpx(data, w, ez=ez)
        n = len(data)
        return scrimp(data, w, ez=ez, s_size=int(np.floor(sample_pct * n)),
                      seed=seed)
    # multi/no window → upper bound then pan-MP (compute.R:86-107)
    n = len(data)
    cap = n // 2
    pan_obj = None
    if threshold is not None:
        pan_obj = pmp_upper_bound(data, threshold=threshold, ez=ez,
                                  return_pmp=True)
        cap = min(cap, pan_obj["upper_window"])
    if windows is None:
        # seq(10, cap, length.out=20) — R's seq is happy DESCENDING when
        # cap < 10 (short series), giving {cap..10}; unique() re-sorts
        windows = np.unique(np.floor(
            np.linspace(10, cap, 20)).astype(int))
    else:
        windows = np.asarray(windows, dtype=int).ravel()
        windows = windows[windows <= cap]
    return pmp(data, windows, ez=ez, pmp_obj=pan_obj)


def tsmp(data: np.ndarray, window_size: int, mode: str = "stomp",
         query: np.ndarray | None = None, ez: float = DEFAULT_EZ,
         paa_factor: int = 1, seed: int = 7, **kwargs):
    """Classic dispatcher (tsmp.R:111-282). ``paa_factor > 1`` pre-reduces
    data/query/window by PAA (tsmp.R:136-154)."""
    data = np.asarray(data, dtype=np.float64)
    if paa_factor > 1:
        data = paa(data, paa_factor)
        if query is not None:
            query = paa(np.asarray(query, dtype=np.float64), paa_factor)
        window_size = max(4, window_size // paa_factor)
    dispatch = {
        "stomp": lambda: stomp(data, window_size, query=query, ez=ez),
        "stamp": lambda: stamp(data, window_size, query=query, ez=ez,
                               seed=seed, **kwargs),
        "scrimp": lambda: scrimp(data, window_size, ez=ez, seed=seed, **kwargs),
        "mpx": lambda: mpx(data, window_size, query=query, ez=ez),
        "mstomp": lambda: mstomp(data, window_size, ez=ez, **kwargs),
        "simple": lambda: simple_fast(data, window_size, query=query, ez=ez),
        "valmod": lambda: valmod(data, window_size,
                                 kwargs.get("window_max", window_size + 8),
                                 query=query, ez=ez),
        "pmp": lambda: pmp(data, kwargs.get("windows", [window_size]), ez=ez),
    }
    if mode not in dispatch:
        raise ValueError(f"unknown mode {mode!r}; one of {sorted(dispatch)}")
    return dispatch[mode]()


def analyze_series(data: np.ndarray, window_size: int, ez: float = DEFAULT_EZ):
    """compute → motifs(k=3) → discords(k=3) (analyze.R:44-73)."""
    prof = compute(data, windows=window_size, ez=ez)
    return {
        "profile": prof,
        "motifs": find_motifs(data, prof, n_motifs=3),
        "discords": find_discords(data, prof, n_discords=3),
    }
