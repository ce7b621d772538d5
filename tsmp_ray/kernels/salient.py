"""Salient subsequences — MDL-driven selection of representative windows.

Re-implementation of the reference's ``salient_subsequences`` /
``salient_mds`` / ``salient_score`` (/root/reference/R/salient.R:44-479) and
their MDL helpers (``discrete_norm_pre``/``discrete_norm``
/root/reference/R/misc.R:866-948, ``get_bitsize`` misc.R:851-864,
``get_sorted_idx`` misc.R:816-849), per Matrix Profile III (Yeh, Van Herle,
Keogh, ICDM 2017).

Algorithm: discretize z-normed windows to ``n_bits`` symbols using GLOBAL
min/max over all windows (a two-pass min/max aggregate — in the engine a
``Dataset.aggregate`` pre-pass, SURVEY.md §2.2 ``discrete_norm_pre``); then
greedily grow a dictionary: each candidate (lowest remaining mp values, with
exclusion-zone dedup) is scored as a new HYPOTHESIS (bits saved compressing
its nearest neighbor against it) vs as COMPRESSIBLE (bits saved compressing it
against an existing hypothesis); pick the best; track total description
length; the knee of that curve is the natural cutoff (used by
``salient_score``).
"""

from __future__ import annotations

import numpy as np

from ..config import EPS, exclusion_zone
from .profile_types import MatrixProfile

__all__ = ["discrete_norm_pre", "discrete_norm", "get_sorted_idx",
           "salient_subsequences", "salient_mds", "salient_score"]


def discrete_norm_pre(data: np.ndarray, w: int) -> tuple[float, float]:
    """Global (min, max) over all z-normalized windows."""
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(np.asarray(data, dtype=np.float64), w)
    mu = wins.mean(axis=1, keepdims=True)
    sd = wins.std(axis=1, keepdims=True)
    z = np.where(sd > 0, (wins - mu) / np.where(sd == 0, 1, sd), wins - mu)
    return float(z.min()), float(z.max())


def discrete_norm(window: np.ndarray, n_bits: int, mx: float, mn: float) -> np.ndarray:
    """z-norm then quantize to integer symbols (misc.R:915-932). Symbols are
    1..2^n_bits when (mn, mx) bound the z-normed input — always true in the
    salient flow, whose bounds come from discrete_norm_pre over ALL windows
    — and deliberately NOT clipped outside that range, matching the
    reference (its test feeds raw data extremes and counts the resulting
    0-symbols)."""
    window = np.asarray(window, dtype=np.float64)
    mu, sd = window.mean(), window.std()
    z = (window - mu) / sd if sd > 0 else window - mu
    levels = (1 << n_bits) - 1
    return np.round((z - mn) / (mx - mn) * levels + EPS) + 1


def _bitsize(diff: np.ndarray, mismatch_bit: float) -> float:
    """Description length of a difference vector: count(non-zero)·mismatch_bit
    (misc.R:851-864)."""
    return float(np.count_nonzero(diff)) * mismatch_bit


def get_sorted_idx(mp: np.ndarray, n_cand: int, zone: int = 0) -> np.ndarray:
    """Candidate ordering by ascending mp with exclusion-zone dedup
    (misc.R:816-849)."""
    idx = np.argsort(mp, kind="stable")
    if zone > 0:
        kept: list[int] = []
        for i in idx:
            if len(kept) >= n_cand:
                break
            if all(abs(int(i) - k) >= zone for k in kept):
                kept.append(int(i))
        idx = np.array(kept, dtype=np.int64)
    idx = idx[np.isfinite(mp[idx])]
    return idx[:n_cand]


def salient_subsequences(data: np.ndarray, profile: MatrixProfile,
                         n_bits: int = 8, n_cand: int = 10) -> dict:
    data = np.asarray(data, dtype=np.float64)
    w = profile.w
    zone = exclusion_zone(w, profile.ez)
    p = len(profile.mp)
    mn, mx = discrete_norm_pre(data, w)
    max_index_num = int(round(len(data) / w + EPS))

    mp = profile.mp.copy()
    uncompressed_bit = n_bits * w
    mismatch_bit = n_bits + np.log2(w)

    hyps: list[np.ndarray] = []
    indexes: list[int] = []
    bit_sizes: list[float] = [uncompressed_bit * p]
    compress_cost = 0.0
    n_comp = 0

    def disc(i: int) -> np.ndarray:
        return discrete_norm(data[i : i + w], n_bits, mx, mn)

    while len(indexes) < max_index_num:
        cand = get_sorted_idx(mp, n_cand, zone)
        if len(cand) == 0:
            break
        best_save, best_i, best_kind, best_cost = -np.inf, None, None, np.inf
        for i in cand:
            ci = disc(int(i))
            # as hypothesis: compress its nearest neighbor against it
            j = int(profile.pi[i])
            save_h = -np.inf
            if 0 <= j < p:
                save_h = uncompressed_bit - _bitsize(disc(j) - ci, mismatch_bit)
            # as compressible: against the best existing hypothesis
            cost_c = min((_bitsize(ci - h, mismatch_bit) for h in hyps),
                         default=np.inf)
            save_c = uncompressed_bit - cost_c
            if save_h > save_c:
                if save_h > best_save:
                    best_save, best_i, best_kind = save_h, int(i), "hyp"
            else:
                if save_c > best_save:
                    best_save, best_i, best_kind, best_cost = \
                        save_c, int(i), "comp", cost_c
        if best_i is None:
            break
        indexes.append(best_i)
        mp[max(0, best_i - zone) : best_i + zone + 1] = np.inf
        if best_kind == "hyp":
            hyps.append(disc(best_i))
            bit_sizes.append(bit_sizes[-1])
        else:
            n_comp += 1
            compress_cost += best_cost
        hyp_cost = (uncompressed_bit * len(hyps)
                    + (n_comp * np.log2(len(hyps)) if hyps else 0.0))
        other = uncompressed_bit * (p - len(hyps) - n_comp)
        bit_sizes.append(compress_cost + hyp_cost + other)

    return {"indexes": np.array(indexes, dtype=np.int64),
            "idx_bit_size": np.array(bit_sizes[1 : len(indexes) + 1]),
            "n_bits": n_bits, "w": w}


def salient_mds(data: np.ndarray, salient: dict) -> np.ndarray:
    """Classical MDS (Torgerson) of the z-normed salient windows to 2-D —
    numpy eigendecomposition, no sklearn (salient.R:358-408)."""
    w = salient["w"]
    subs = []
    for i in salient["indexes"]:
        s = np.asarray(data[i : i + w], dtype=np.float64)
        sd = s.std()
        subs.append((s - s.mean()) / (sd if sd > 0 else 1.0))
    X = np.stack(subs)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    n = len(X)
    J = np.eye(n) - np.ones((n, n)) / n
    B = -0.5 * J @ d2 @ J
    vals, vecs = np.linalg.eigh(B)
    order = np.argsort(vals)[::-1][:2]
    return vecs[:, order] * np.sqrt(np.maximum(vals[order], 0))


def salient_score(salient: dict, gtruth: np.ndarray, w: int) -> dict:
    """Precision/recall/F1 of selected indexes vs ground truth with the
    0.2·w proximity rule and the description-length knee cutoff
    (salient.R:410-479)."""
    idxs = salient["indexes"]
    gtruth = np.atleast_1d(np.asarray(gtruth))
    hit = np.array([np.abs(i - gtruth).min() < 0.2 * w for i in idxs])
    dl = salient["idx_bit_size"]
    rising = np.flatnonzero(np.diff(dl) > 0)
    cutoff = int(rising[0]) if len(rising) else len(hit)
    if cutoff <= 0:
        return {"f_score": 0.0, "precision": 0.0, "recall": 0.0}
    hit = hit[:cutoff]
    precision = hit.sum() / len(hit)
    recall = hit.sum() / len(gtruth)
    f = (2 * precision * recall / (precision + recall)
         if precision + recall > 0 else 0.0)
    return {"f_score": float(f), "precision": float(precision),
            "recall": float(recall)}
