"""SDTS — Scalable Dictionary learning for Time Series (weakly-labeled).

Capability re-implementation of the reference's ``sdts_train`` /
``sdts_predict`` / ``sdts_score`` (/root/reference/R/sdts-train.R:48-355,
/root/reference/R/sdts-predict.R:39-85, 124-187), from the published algorithm
(Yeh, Kavantzas, Keogh, "Matrix Profile VI: Meaningful Multidimensional Motif
Discovery" companion SDTS work):

- TRAIN: concatenate positively-labeled segments with Inf separators; the
  segment's most-conserved subsequence (min of the concatenated self-join MP)
  is its candidate pattern; each candidate's detection threshold is fitted by
  golden-section search maximizing segment-level F_beta on the full weakly
  labeled series; patterns are then greedily combined (best-first), keeping an
  added pattern only while the combined score improves (sdts-train.R stage 3,
  simplified: combined fit reuses each pattern's individually fitted threshold
  with one coordinate golden-section refinement pass instead of the
  iterate-to-convergence loop — results agree on well-separated patterns).
- PREDICT: per pattern, MASS distance profile < threshold → window-expanded
  boolean annotation, overlaps within window_size suppressed
  (sdts-predict.R:57-74), OR-combined over patterns.
- SCORE: segment-level precision/recall/F_beta with the reference's 80%
  overlap rule (sdts-predict.R:154-170).

In the engine, TRAIN is driver-orchestrated (candidate scoring fans out), and
PREDICT runs as a broadcast-model actor-pool ``map_batches`` stage
(SURVEY.md §2.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mass import mass_pre, mass_v3
from .stomp import stomp

_GOLD = (1 + np.sqrt(5)) / 2


@dataclass
class SdtsModel:
    patterns: list = field(default_factory=list)   # list of np.ndarray
    tholds: list = field(default_factory=list)     # list of float
    windows: list = field(default_factory=list)    # list of int
    score: float = 0.0
    score_hist: list = field(default_factory=list)


def _segments(label: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) spans of True runs."""
    pad = np.concatenate([[0], label.astype(np.int8), [0]])
    d = np.diff(pad)
    return list(zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)))


def _predict_from_profile(dist_pro: np.ndarray, thold: float, w: int,
                          n: int) -> np.ndarray:
    """Window-expanded boolean prediction from one thresholded profile with
    overlap suppression (sdts-predict.R:55-84)."""
    hits = np.flatnonzero(dist_pro < thold)
    # suppress hits within w of an accepted earlier hit
    kept: list[int] = []
    last = -10**18
    for h in hits:
        if h - last >= w:
            kept.append(int(h))
            last = h
    pred = np.zeros(n - w + 1, dtype=bool)
    for h in kept:
        pred[h : h + w] = True
    return pred[: n - w + 1]


def _f_meas(pred: np.ndarray, label: np.ndarray, w: int, beta: float) -> float:
    s = sdts_score(pred, label, beta=beta, sub_len=w)
    return s["f_score"]


def _golden_section(dist_pro: np.ndarray, label: np.ndarray, w: int, n: int,
                    beta: float) -> tuple[float, float]:
    finite = dist_pro[np.isfinite(dist_pro)]
    if len(finite) == 0:
        return np.nan, 0.0
    a, b = float(finite.min()), float(finite.max())
    tol = max((b - a) * 0.001, 1e-4)
    c = b - (b - a) / _GOLD
    d = a + (b - a) / _GOLD
    while abs(c - d) > tol:
        cs = _f_meas(_predict_from_profile(dist_pro, c, w, n), label, w, beta)
        ds = _f_meas(_predict_from_profile(dist_pro, d, w, n), label, w, beta)
        if cs > ds:
            b = d
        else:
            a = c
        c = b - (b - a) / _GOLD
        d = a + (b - a) / _GOLD
    th = (a + b) / 2
    return th, _f_meas(_predict_from_profile(dist_pro, th, w, n), label, w, beta)


def sdts_train(data: np.ndarray, label: np.ndarray, window_size,
               beta: float = 1.0, pat_max: int | float = np.inf) -> SdtsModel:
    data = np.asarray(data, dtype=np.float64)
    label = np.asarray(label).astype(bool)
    windows = [int(w) for w in np.atleast_1d(window_size)]
    n = len(data)
    segs = _segments(label)
    if not segs:
        raise ValueError("label has no positive segments")

    # candidates: per (window, positive segment) the most conserved window of
    # the Inf-separated concatenation of positives
    candidates: list[dict] = []
    for w in windows:
        parts, seg_starts = [], []
        for st, ed in segs:
            seg_starts.append(sum(len(p) for p in parts) + 1)
            parts.append(np.concatenate([[np.inf], data[st:ed]]))
        pos = np.concatenate(parts)
        prof = stomp(np.where(np.isfinite(pos), pos, np.nan), w)
        for k, (st, ed) in enumerate(segs):
            lo = seg_starts[k]
            hi = min(lo + (ed - st) - w + 1, len(prof.mp))
            if hi <= lo:
                continue
            seg_mp = prof.mp[lo:hi]
            if not np.isfinite(seg_mp).any():
                continue
            rel = int(np.argmin(seg_mp))
            candidates.append({
                "pattern": pos[lo + rel : lo + rel + w].copy(),
                "idx": st + rel, "w": w,
            })

    # fit individual thresholds on the full series
    pre = mass_pre(data, windows[0]) if len(set(windows)) == 1 else None
    for c in candidates:
        p = pre if (pre is not None and c["w"] == windows[0]) else mass_pre(data, c["w"])
        d, _ = mass_v3(p, c["pattern"])
        lo = max(0, c["idx"] - c["w"])
        d[lo : c["idx"] + c["w"] + 1] = np.inf  # exclude the source region
        c["profile"] = d
        th, sc = _golden_section(d, label, c["w"], n, beta)
        c["thold"], c["score"] = th, sc
    candidates = [c for c in candidates if np.isfinite(c.get("thold", np.nan))]
    candidates.sort(key=lambda c: -c["score"])

    pat_max = int(min(pat_max, max(1, len(segs) // 2))) if np.isfinite(pat_max) \
        else max(1, len(segs) // 2)
    if pat_max < 2 or len(candidates) <= 1:
        best = candidates[0]
        return SdtsModel(patterns=[best["pattern"]], tholds=[best["thold"]],
                         windows=[best["w"]], score=best["score"],
                         score_hist=[best["score"]])

    # greedy combination: add the candidate that best improves the OR-combined
    # segment F; stop when no candidate improves (stage-3 stop rule)
    chosen: list[dict] = []
    best_score = -np.inf
    hist = []
    while len(chosen) < pat_max:
        best_j, best_js = None, best_score
        for j, c in enumerate(candidates):
            if any(c is ch for ch in chosen):
                continue
            trial = chosen + [c]
            pred = np.zeros(n - min(windows) + 1, dtype=bool)
            for t in trial:
                p = _predict_from_profile(t["profile"], t["thold"], t["w"], n)
                pred[: len(p)] |= p[: len(pred)]
            sc = _f_meas(pred, label, trial[-1]["w"], beta)
            if sc > best_js:
                best_js, best_j = sc, j
        if best_j is None:
            break
        chosen.append(candidates[best_j])
        best_score = best_js
        hist.append(best_js)
    if not chosen:
        chosen = [candidates[0]]
        best_score = candidates[0]["score"]
        hist = [best_score]
    return SdtsModel(patterns=[c["pattern"] for c in chosen],
                     tholds=[c["thold"] for c in chosen],
                     windows=[c["w"] for c in chosen],
                     score=best_score, score_hist=hist)


def sdts_predict(model: SdtsModel, data: np.ndarray,
                 window_size: int | None = None) -> np.ndarray:
    data = np.asarray(data, dtype=np.float64)
    n = len(data)
    w_min = min(model.windows)
    pred = np.zeros(n - w_min + 1, dtype=bool)
    for pat, th, w in zip(model.patterns, model.tholds, model.windows):
        pre = mass_pre(data, w)
        d, _ = mass_v3(pre, pat)
        p = _predict_from_profile(d, th, w, n)
        pred[: len(p)] |= p[: len(pred)]
    return pred


def sdts_score(pred: np.ndarray, gtruth: np.ndarray, beta: float = 1.0,
               sub_len: int | None = None) -> dict:
    """Segment-level F_beta with the 80%-overlap TP rule
    (sdts-predict.R:124-187)."""
    pred = np.asarray(pred).astype(bool)
    gtruth = np.asarray(gtruth).astype(bool)
    if len(pred) > len(gtruth):
        pred = pred[: len(gtruth)]
    elif len(pred) < len(gtruth):
        pred = np.concatenate([pred, np.zeros(len(gtruth) - len(pred), bool)])
    p_segs = _segments(pred)
    g_segs = _segments(gtruth)
    if sub_len is None:
        lens = [ed - st for st, ed in p_segs]
        sub_len = int(np.bincount(lens).argmax()) if lens else 1
    tp_pre = sum(gtruth[st:ed].sum() > 0.8 * sub_len for st, ed in p_segs)
    tp_rec = sum(pred[st:ed].sum() > 0.8 * sub_len for st, ed in g_segs)
    pre = tp_pre / len(p_segs) if p_segs else 0.0
    rec = tp_rec / len(g_segs) if g_segs else 0.0
    denom = beta**2 * pre + rec
    f = (1 + beta**2) * pre * rec / denom if denom > 0 else 0.0
    return {"f_score": float(f), "precision": float(pre), "recall": float(rec)}
