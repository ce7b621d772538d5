"""Flagship pipeline — the engine's ``analyze()`` preset (reference:
``analyze()`` → compute → motifs → discords, /root/reference/R/analyze.R:44-73,
re-hosted per SURVEY.md §7.0):

    read transcripts
      → add_turn_features (stateless, zero-copy Arrow)
      → groupby(conv_id) stable-ordered signals        [THE shuffle]
      → tier rollup raw→1m→1h→1d (+ gap-fill)          [partial aggs]
      → pack (delta-of-delta ts + Gorilla values)
      → matrix profiles (actor pool, salted long convs)
      → per-conv motif/discord/segment extraction
      → write tiers + profiles (resumable layout) or return Datasets
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import EngineConfig
from ..stages.profile_stage import compute_profiles
from ..stages.rollup import fold_tier, gap_fill_tier, rollup_from_signals
from ..stages.signals import derive_signals, pack_series


def build_tiers(ds_signals, cfg: EngineConfig, gap_fill: bool | None = None):
    """signals -> {'1m': ds, '1h': ds, '1d': ds}; coarser tiers fold the finer
    tier's partials (never re-read raw — the continuous-aggregate property).

    The finer tiers are ``materialize()``d before folding: tier points are
    orders of magnitude smaller than the raw turns (the legitimate
    small-reused-intermediate case — at 100 TB this would be the tier's
    parquet write that the next fold reads back), which stops each coarser
    tier from re-executing the whole upstream lineage.

    Gap-fill interpolation is bounded by ``cfg.gap_fill_max_buckets`` so a
    sparse series can't explode into one row per empty bucket across months.
    """
    if gap_fill is None:
        gap_fill = cfg.gap_fill
    mg = cfg.gap_fill_max_buckets
    # gap-fill is FUSED into each tier's fold (one shuffle per tier); folds
    # read the finer tier's materialized points and drop its gap rows first
    t1m = rollup_from_signals(ds_signals, "1m", mg, gap_fill=gap_fill).materialize()
    t1h = fold_tier(t1m, "1h", mg, gap_fill=gap_fill).materialize()
    t1d = fold_tier(t1h, "1d", mg, gap_fill=gap_fill)
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def analyze(ds_transcripts, cfg: EngineConfig | None = None):
    """Full pipeline on a transcript Dataset. Returns dict of lazy Datasets:
    signals, tiers (1m/1h/1d), profiles."""
    cfg = cfg or EngineConfig()
    signals = derive_signals(ds_transcripts)
    tiers = build_tiers(signals, cfg)
    packed = pack_series(ds_transcripts)
    profiles = compute_profiles(packed, cfg)
    return {"signals": signals, "tiers": tiers, "profiles": profiles}


def extract_mining(profiles_pdf: pd.DataFrame, packed_pdf: pd.DataFrame,
                   cfg: EngineConfig, n_motifs: int = 2, n_discords: int = 1):
    """Driver-side mining over computed profiles (small outputs): per
    (conv, signal) top motifs/discords + FLUSS segments."""
    from ..kernels.mining import find_discords, find_motifs, fluss_cac, fluss_extract
    from ..kernels.profile_types import MatrixProfile

    rows = []
    series_by_conv = {
        r["conv_id"]: r for _, r in packed_pdf.iterrows()
    }
    for (conv, sig), g in profiles_pdf.groupby(["conv_id", "signal"]):
        g = g.sort_values("window_idx")
        prof = MatrixProfile(
            mp=g["mp"].to_numpy(), pi=g["pi"].to_numpy(),
            lmp=g["lmp"].to_numpy(), lpi=g["lpi"].to_numpy(),
            rmp=g["rmp"].to_numpy(), rpi=g["rpi"].to_numpy(),
            w=int(g["w"].iloc[0]), ez=cfg.ez,
        )
        series = np.asarray(series_by_conv[conv][sig], dtype=np.float64)
        motifs = find_motifs(series, prof, n_motifs=n_motifs)
        discords = find_discords(series, prof, n_discords=n_discords)
        cac = fluss_cac(prof)
        segs = fluss_extract(cac, prof.w, num_segments=1)
        rows.append({
            "conv_id": conv, "signal": sig,
            "motif_a": motifs[0]["motifs"][0] if motifs else -1,
            "motif_b": motifs[0]["motifs"][1] if motifs else -1,
            "motif_dist": motifs[0]["distance"] if motifs else np.nan,
            "discord": discords[0]["discord"] if discords else -1,
            "discord_dist": discords[0]["distance"] if discords else np.nan,
            "segment": segs[0] if segs else -1,
        })
    return pd.DataFrame(rows)
