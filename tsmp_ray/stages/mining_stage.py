"""Distributed per-conversation mining — the downstream query catalog
(motifs/discords/segments/chains/mstomp/stompi/annotation) fanned out as
``map_batches`` tasks over packed-series rows, the same physical plan as the
profile stage (one conversation per task for Zipf load balancing); no driver
loops, no full-dataset ``to_pandas``.

Each op recomputes the needed matrix profile inline from the packed series
(one pass per conv: the profile is O(n²), the mining step O(n) — fusing them
avoids a profile→series shuffle join). Partitioning assumption: a single
conversation's series fits one task. Conversations above the salting
threshold would route through ``profile_stage.compute_profiles``'s diagonal
shards first; the mining ops below that consume only a finished profile
(`find_chains`, `fluss_cac`…) accept that profile unchanged.

Reference semantics per op cited in the kernels
(/root/reference/R/find-motifs.R, find-discord.R, fluss.R, find-chains.R,
mstomp.R, stompi.R, annotations.R); this module is only the Ray fan-out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_EZ, EngineConfig
from ..kernels.block_join import blocked_mp
from ..kernels.mining import (
    av_complexity,
    find_chains,
    find_discords,
    find_motifs,
    fluss,
    fluss_cac,
    fluss_extract,
)
from ..kernels.mpx import mpx
from ..kernels.mstomp import mstomp
from ..kernels.stompi import StreamingProfile
from .signals import SIGNAL_COLUMNS


def _auto_profile(series: np.ndarray, w: int, ez: float = DEFAULT_EZ):
    """Same kernel auto-pick as ProfileKernel: blocked BLAS for small w."""
    if w <= 32:
        return blocked_mp(series, w, ez=ez)
    return mpx(series, w, ez=ez)


def _series(batch: pa.Table, row: int, sig: str) -> np.ndarray:
    return (batch[sig][row].values
            .to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=False))


def per_conv_stage(ds_packed, fn, fn_kwargs: dict | None = None, *,
                   batch_size: int = 1, num_cpus: float = 1.0):
    """Generic fan-out: ``fn(conv_id, batch, row, **kw) -> pa.Table | None``
    over packed conversation rows; one conv per task by default."""

    def runner(batch: pa.Table, fn=fn, kw=fn_kwargs or {}) -> pa.Table:
        outs = []
        conv_ids = batch["conv_id"].to_pylist()
        for r, conv_id in enumerate(conv_ids):
            t = fn(conv_id, batch, r, **kw)
            if t is not None and t.num_rows:
                outs.append(t)
        if not outs:
            return fn(None, None, -1, **kw)  # schema-only empty table
        return pa.concat_tables(outs)

    return ds_packed.map_batches(runner, batch_format="pyarrow",
                                 batch_size=batch_size, num_cpus=num_cpus)


# ------------------------------------------------------------------- ops
# Every op returns its empty-schema table when called with conv_id=None so
# the runner can emit a typed empty block.

_MINING_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("signal", pa.string()),
    ("motif_a", pa.int64()), ("motif_b", pa.int64()),
    ("motif_dist", pa.float64()),
    ("discord", pa.int64()), ("discord_dist", pa.float64()),
    ("segment", pa.int64()),
])


def mining_op(conv_id, batch, r, *, w: int, ez: float = DEFAULT_EZ,
              n_motifs: int = 2, n_discords: int = 1,
              signals: tuple[str, ...] = SIGNAL_COLUMNS):
    """Per (conv, signal): top motif pair + top discord + first FLUSS segment
    (the reference's ``analyze()`` mining tail, /root/reference/R/analyze.R:69-72)."""
    if conv_id is None:
        return _MINING_SCHEMA.empty_table()
    rows = []
    for sig in signals:
        x = _series(batch, r, sig)
        if len(x) < 2 * w:
            continue
        prof = _auto_profile(x, w, ez)
        motifs = find_motifs(x, prof, n_motifs=n_motifs)
        discords = find_discords(x, prof, n_discords=n_discords)
        segs = fluss_extract(fluss_cac(prof), w, num_segments=1)
        rows.append({
            "conv_id": conv_id, "signal": sig,
            "motif_a": motifs[0]["motifs"][0] if motifs else -1,
            "motif_b": motifs[0]["motifs"][1] if motifs else -1,
            "motif_dist": motifs[0]["distance"] if motifs else np.nan,
            "discord": discords[0]["discord"] if discords else -1,
            "discord_dist": discords[0]["distance"] if discords else np.nan,
            "segment": segs[0] if segs else -1,
        })
    if not rows:
        return None
    return pa.Table.from_pylist(rows, schema=_MINING_SCHEMA)


_FLUSS_SCHEMA = pa.schema([("conv_id", pa.string()), ("segment", pa.int64())])


def fluss_op(conv_id, batch, r, *, w: int, signal: str = "tool_call"):
    if conv_id is None:
        return _FLUSS_SCHEMA.empty_table()
    x = _series(batch, r, signal)
    if len(x) < 4 * w:
        return None
    res = fluss(x, w, num_segments=1)
    seg = res["fluss"][0] if res["fluss"] else -1
    return pa.Table.from_pylist(
        [{"conv_id": conv_id, "segment": seg}], schema=_FLUSS_SCHEMA)


_CHAINS_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("signal", pa.string()),
    ("best_chain_len", pa.int64()), ("n_chains", pa.int64()),
])


def chains_op(conv_id, batch, r, *, w: int, ez: float = DEFAULT_EZ,
              signals: tuple[str, ...] = SIGNAL_COLUMNS):
    if conv_id is None:
        return _CHAINS_SCHEMA.empty_table()
    rows = []
    for sig in signals:
        x = _series(batch, r, sig)
        if len(x) < 2 * w:
            continue
        res = find_chains(_auto_profile(x, w, ez))
        rows.append({"conv_id": conv_id, "signal": sig,
                     "best_chain_len": len(res["best"]),
                     "n_chains": len(res["chains"])})
    if not rows:
        return None
    return pa.Table.from_pylist(rows, schema=_CHAINS_SCHEMA)


_MSTOMP_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("k_dim", pa.int64()),
    ("window_idx", pa.int64()), ("mp", pa.float64()), ("pi", pa.int64()),
    ("lmp", pa.float64()), ("lpi", pa.int64()),
    ("rmp", pa.float64()), ("rpi", pa.int64()),
])


def _mstomp_table(conv_id: str, res, offset: int = 0) -> pa.Table:
    """Long-format rows from a (possibly index-range) MultiMatrixProfile;
    ``offset`` = the range's global start (window_idx stays global)."""
    d, p = res.mp.shape
    k_dim = np.repeat(np.arange(1, d + 1, dtype=np.int64), p)
    idx = np.tile(np.arange(offset, offset + p, dtype=np.int64), d)
    return pa.table({
        "conv_id": pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(d * p, dtype=np.int32)),
            pa.array([conv_id])).cast(pa.string()),
        "k_dim": pa.array(k_dim),
        "window_idx": pa.array(idx),
        "mp": pa.array(res.mp.reshape(-1)),
        "pi": pa.array(res.pi.reshape(-1).astype(np.int64)),
        "lmp": pa.array(res.lmp.reshape(-1)),
        "lpi": pa.array(res.lpi.reshape(-1).astype(np.int64)),
        "rmp": pa.array(res.rmp.reshape(-1)),
        "rpi": pa.array(res.rpi.reshape(-1).astype(np.int64)),
    }, schema=_MSTOMP_SCHEMA)


def mstomp_op(conv_id, batch, r, *, w: int,
              signals: tuple[str, ...] = SIGNAL_COLUMNS):
    if conv_id is None:
        return _MSTOMP_SCHEMA.empty_table()
    mats = [_series(batch, r, s) for s in signals]
    if len(mats[0]) < 2 * w:
        return None
    return _mstomp_table(conv_id, mstomp(np.stack(mats, axis=1), w))


def compute_mstomp(ds_packed, cfg: EngineConfig,
                   signals: tuple[str, ...] = SIGNAL_COLUMNS):
    """Multivariate profiles for EVERY conversation, salting the long tail:
    convs ≤ ``cfg.salt_turn_threshold`` run one task each (``mstomp_op``);
    longer ones fan out as INDEX-RANGE shard tasks over the mstomp QT
    recurrence — the reference's own mstomp_par partitioning
    (/root/reference/R/mstomp-par.R:110-127) — each shard re-seeded by one
    FFT per dim and emitting its final rows directly (no merge: every query
    index is computed exactly once). Same physical plan as
    ``profile_stage._sharded_profiles_ds``: block refs to tasks, results
    stay in the object store, ``from_arrow_refs`` at the end."""
    import ray

    thr = cfg.salt_turn_threshold
    pool = cfg.profile_concurrency or max(
        2, int(ray.cluster_resources().get("CPU", 8)))
    ds_packed = ds_packed.materialize()
    small = ds_packed.filter(expr=f"n_turns <= {thr}")
    out_small = per_conv_stage(small, mstomp_op,
                               {"w": cfg.window_size, "signals": signals})
    big = ds_packed.filter(expr=f"n_turns > {thr}").materialize()
    out_big = _sharded_mstomp_ds(big, cfg, signals, pool)
    if out_big is None:
        return out_small
    return out_small.union(out_big)


def _sharded_mstomp_ds(big_ds, cfg: EngineConfig,
                       signals: tuple[str, ...], pool: int):
    import pandas as pd
    import ray

    w = cfg.window_size

    @ray.remote(num_cpus=0)
    def _block_meta(tbl):
        # num_cpus=0: driver blocks on this planning read (see profile_stage)
        if isinstance(tbl, pd.DataFrame):
            if "conv_id" not in tbl.columns:
                return [], []
            return tbl["conv_id"].tolist(), tbl["n_turns"].tolist()
        if "conv_id" not in tbl.column_names:
            return [], []
        return tbl["conv_id"].to_pylist(), tbl["n_turns"].to_pylist()

    @ray.remote
    def _shard(tbl: pa.Table, row: int, lo: int, hi: int, conv_id: str):
        mats = [_series(tbl, row, s) for s in signals]
        res = mstomp(np.stack(mats, axis=1), w, index_range=(lo, hi))
        return _mstomp_table(conv_id, res, offset=lo)

    table_refs = []
    for bundle in big_ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            conv_ids, n_turns = ray.get(_block_meta.remote(block_ref))
            for row, (cid, n) in enumerate(zip(conv_ids, n_turns)):
                if n < 2 * w:
                    continue
                p = int(n) - w + 1
                # equal-width index ranges: every query row costs O(p)
                # (full distance row), so the index axis IS the cost axis
                n_shards = min(max(2, pool), p)
                edges = np.linspace(0, p, n_shards + 1).astype(np.int64)
                table_refs.extend(
                    _shard.remote(block_ref, row, int(lo), int(hi), cid)
                    for lo, hi in zip(edges[:-1], edges[1:]) if hi > lo)
    if not table_refs:
        return None
    return ray.data.from_arrow_refs(table_refs)


_STOMPI_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("window_idx", pa.int64()),
    ("mp", pa.float64()), ("pi", pa.int64()),
])


def stompi_op(conv_id, batch, r, *, w: int, signal: str = "text_len"):
    """2/3 batch seed + 1/3 incremental append (equals the batch profile —
    asserted in tests; /root/reference/R/stompi.R:52-96 semantics)."""
    if conv_id is None:
        return _STOMPI_SCHEMA.empty_table()
    x = _series(batch, r, signal)
    if len(x) < 4 * w:
        return None
    cut = 2 * len(x) // 3
    sp = StreamingProfile(x[:cut], w)
    sp.update(x[cut:])
    p = len(sp.profile.mp)
    return pa.table({
        "conv_id": pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(p, dtype=np.int32)),
            pa.array([conv_id])).cast(pa.string()),
        "window_idx": pa.array(np.arange(p, dtype=np.int64)),
        "mp": pa.array(sp.profile.mp),
        "pi": pa.array(sp.profile.pi.astype(np.int64)),
    }, schema=_STOMPI_SCHEMA)


_DISTPROF_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("window_idx", pa.int64()),
    ("d_v3", pa.float64()), ("d_weighted", pa.float64()),
])


def distprofile_op(conv_id, batch, r, *, w: int, signal: str = "text_len",
                   query_at: int = 0):
    """Per-conv distance profiles of the conv's own window at ``query_at``:
    MASS v3 plus the weighted variant with a center-emphasis weight vector
    (dist_profile dispatcher parity — /root/reference/R/dist_profile.R:69-180,
    mass-pre-w.R:35-91). Skip locations stay +Inf (valid float64 parquet)."""
    if conv_id is None:
        return _DISTPROF_SCHEMA.empty_table()
    from ..kernels.mass import dist_profile

    x = _series(batch, r, signal)
    if len(x) < 2 * w + query_at:
        return None
    q = x[query_at : query_at + w]
    d3, _ = dist_profile(x, q, method="v3")
    wt = 1.0 - 0.5 * np.abs(np.linspace(-1.0, 1.0, w))  # center-weighted
    dw, _ = dist_profile(x, q, method="weighted", weight=wt)
    p = len(d3)
    return pa.table({
        "conv_id": pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(p, dtype=np.int32)),
            pa.array([conv_id])).cast(pa.string()),
        "window_idx": pa.array(np.arange(p, dtype=np.int64)),
        "d_v3": pa.array(d3),
        "d_weighted": pa.array(dw),
    }, schema=_DISTPROF_SCHEMA)


_MP_EXACT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("window_idx", pa.int64()), ("mp", pa.float64()),
])


def mp_exact_op(conv_id, batch, r, *, w: int, zone: int,
                signal: str = "text_len", round_dp: int = 6):
    """Oracle-order matrix profile: per window, z-normalize with population
    mean/sd (windows with sd == 0 dropped on BOTH sides), distance =
    sqrt(min over |i-j|>zone of Σ_k (zi_k - zj_k)²) — the exact arithmetic a
    SQL self-join oracle performs, so rounded values hash-match. This is the
    oracle-friendly flagship-correctness query; the production kernels
    (blocked/mpx) are validated against brute force in pytest."""
    if conv_id is None:
        return _MP_EXACT_SCHEMA.empty_table()
    x = _series(batch, r, signal)
    if len(x) < 2 * w:
        return None
    win = np.lib.stride_tricks.sliding_window_view(x, w)
    mu = win.mean(axis=1)
    sd = win.std(axis=1)
    ok = sd > 0
    z = np.where(ok[:, None], (win - mu[:, None]) / np.where(ok, sd, 1.0)[:, None], 0.0)
    p = len(win)
    # pairwise squared distances between z-rows (vectorized, oracle order in
    # the k-sum is absorbed by round_dp), evaluated in ROW BLOCKS with a
    # per-block min-reduce: memory is O(block × p), never O(p²)
    col_idx = np.arange(p)
    mp2 = np.full(p, np.inf)
    blk_rows = p if p <= 2048 else 512
    for lo in range(0, p, blk_rows):
        hi = min(lo + blk_rows, p)
        d2 = ((z[lo:hi, None, :] - z[None, :, :]) ** 2).sum(axis=2)
        band = np.abs(np.arange(lo, hi)[:, None] - col_idx[None, :]) <= zone
        d2[band] = np.inf
        d2[:, ~ok] = np.inf
        mp2[lo:hi] = d2.min(axis=1)
    mp2[~ok] = np.inf
    mp = np.sqrt(mp2)
    keep = ok & np.isfinite(mp)
    idx = np.flatnonzero(keep)
    return pa.table({
        "conv_id": pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(len(idx), dtype=np.int32)),
            pa.array([conv_id])).cast(pa.string()),
        "window_idx": pa.array(idx.astype(np.int64)),
        "mp": pa.array(np.round(mp[idx], round_dp)),
    }, schema=_MP_EXACT_SCHEMA)


_ANNOT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("window_idx", pa.int64()), ("av", pa.float64()),
])


def annotation_op(conv_id, batch, r, *, w: int, signal: str = "text_len",
                  round_dp: int | None = None):
    """``round_dp`` rounds the av values so the result hash-matches the SQL
    oracle (numpy pairwise summation vs SQL sequential sums differ in the
    last ulp; the value is O(1) so 6 dp absorbs it)."""
    if conv_id is None:
        return _ANNOT_SCHEMA.empty_table()
    x = _series(batch, r, signal)
    if len(x) < 2 * w:
        return None
    av = av_complexity(x, w)
    if round_dp is not None:
        av = np.round(av, round_dp)
    p = len(av)
    return pa.table({
        "conv_id": pa.DictionaryArray.from_arrays(
            pa.array(np.zeros(p, dtype=np.int32)),
            pa.array([conv_id])).cast(pa.string()),
        "window_idx": pa.array(np.arange(p, dtype=np.int64)),
        "av": pa.array(av),
    }, schema=_ANNOT_SCHEMA)
