"""Ray Data stage tests: events→transcripts derivation vs DuckDB, signal
derivation + text-equality invariant, tiered rollup vs SQL oracle, tier fold
identity, gap-fill, distributed profiles vs numpy oracle (incl. salted path).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tsmp_ray.config import EngineConfig
from tsmp_ray.kernels import stomp
from tsmp_ray.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL, synthetic_transcripts, transcripts_from_events,
)
from tsmp_ray.stages.profile_stage import compute_profiles
from tsmp_ray.stages.rollup import fold_tier, gap_fill_tier, rollup_from_signals
from tsmp_ray.stages.signals import (
    add_turn_features, conversation_fingerprints, derive_signals, pack_series,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("events",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    con.execute(f"CREATE VIEW transcripts AS {TRANSCRIPTS_FROM_EVENTS_SQL}")
    return con


def sorted_df(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


def test_transcripts_from_events_matches_sql(ray_session, duck):
    got = transcripts_from_events(SF).to_pandas()
    want = duck.sql("SELECT * FROM transcripts").df()
    got = sorted_df(got, ["conv_id", "turn_idx"])[want.columns.tolist()]
    want = sorted_df(want, ["conv_id", "turn_idx"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_text_equality_invariant_under_shuffle(ray_session):
    import ray

    tbl = synthetic_transcripts(n_convs=6, seed=1, mean_turns=60)
    ds = ray.data.from_arrow(tbl)
    fp1 = conversation_fingerprints(ds).to_pandas()
    # a fully reshuffled copy must fingerprint identically (stable order wins)
    perm = np.random.default_rng(0).permutation(tbl.num_rows)
    ds2 = ray.data.from_arrow(tbl.take(pa.array(perm))).random_shuffle(seed=5)
    fp2 = conversation_fingerprints(ds2).to_pandas()
    a = sorted_df(fp1, ["conv_id"])
    b = sorted_df(fp2, ["conv_id"])
    pd.testing.assert_frame_equal(a, b)


def test_pack_series_arrow_equals_map_groups(ray_session):
    """The Arrow-native vectorized pack (one sort + per-block run packing +
    boundary-fragment merge) must produce value-identical packed rows to the
    blessed groupby.map_groups pack — including ts_delta across fragment
    boundaries. Small blocks force conversations to straddle block edges so
    the fragment-merge path is actually exercised."""
    import ray

    from tsmp_ray.stages.signals import pack_series_arrow

    tbl = synthetic_transcripts(n_convs=12, seed=7, mean_turns=80)
    # many small blocks → convs straddle block boundaries after the sort
    ds = ray.data.from_arrow(tbl).repartition(16)
    a = pack_series(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = (pack_series_arrow(ray.data.from_arrow(tbl).repartition(16))
         .to_pandas().sort_values("conv_id").reset_index(drop=True))
    assert list(a["conv_id"]) == list(b["conv_id"])
    assert list(a["n_turns"]) == list(b["n_turns"])
    for col in ("turn_idx", "ts", "ts_delta", "text_len", "tool_call"):
        for x, y in zip(a[col], b[col]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=col)


def test_pack_series_arrow_adversarial_layouts(ray_session):
    """Fragment-merge edge cases: one conversation spanning MANY blocks
    (middle fragments are whole blocks), a block holding exactly one row,
    single-turn conversations, and the empty input."""
    import ray

    from tsmp_ray.stages.signals import pack_series_arrow

    rng = np.random.default_rng(11)
    # conv A: 64 turns (will straddle many 4-row blocks); B/C: 1 turn each;
    # D: 3 turns
    sizes = {"convA": 64, "convB": 1, "convC": 1, "convD": 3}
    conv, turn, ts = [], [], []
    for cid, n in sizes.items():
        conv += [cid] * n
        turn += list(range(n))
        base = 1_700_000_000_000_000 + hash(cid) % 1000
        ts += [base + i * 7_000_000 for i in range(n)]
    n = len(conv)
    tbl = pa.table({
        "conv_id": pa.array(conv),
        "turn_idx": pa.array(turn, pa.int32()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "text_len": pa.array(rng.integers(1, 99, n).astype(np.float64)),
        "tool_call": pa.array((rng.random(n) < 0.5).astype(np.float64)),
    })
    perm = rng.permutation(n)
    shuffled = tbl.take(pa.array(perm))
    a = (pack_series(ray.data.from_arrow(shuffled).repartition(17))
         .to_pandas().sort_values("conv_id").reset_index(drop=True))
    b = (pack_series_arrow(ray.data.from_arrow(shuffled).repartition(17))
         .to_pandas().sort_values("conv_id").reset_index(drop=True))
    assert list(b["conv_id"]) == sorted(sizes)
    assert list(b["n_turns"]) == [sizes[c] for c in sorted(sizes)]
    for col in ("turn_idx", "ts", "ts_delta", "text_len", "tool_call"):
        for x, y in zip(a[col], b[col]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=col)
    # empty input
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    assert pack_series_arrow(empty).count() == 0


def test_derive_signals_values(ray_session):
    import ray

    tbl = synthetic_transcripts(n_convs=3, seed=2, mean_turns=50)
    ds = ray.data.from_arrow(tbl)
    sig = derive_signals(ds).to_pandas()
    # oracle: pandas per conv
    df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"])
    for conv, g in df.groupby("conv_id"):
        s = sig[sig.conv_id == conv].sort_values("turn_idx")
        assert (s["text_len"].to_numpy() ==
                g["text"].str.len().to_numpy()).all()
        assert (s["tool_call"].to_numpy() ==
                (g["tool"] != "").astype(float).to_numpy()).all()
        ts = g["ts"].astype("int64").to_numpy()
        want = np.concatenate([[0.0], np.diff(ts).astype(float)])
        np.testing.assert_allclose(s["ts_delta"].to_numpy(), want)


ROLLUP_SQL_1M = """
WITH sig AS (
  SELECT conv_id, turn_idx, ts,
         CAST(length(text) AS DOUBLE) AS text_len,
         CAST(tool <> '' AS DOUBLE)   AS tool_call,
         CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY conv_id ORDER BY turn_idx), 0) AS DOUBLE) AS ts_delta
  FROM transcripts
), long AS (
  SELECT conv_id, ts, 'ts_delta' AS signal, ts_delta AS v FROM sig
  UNION ALL
  SELECT conv_id, ts, 'text_len', text_len FROM sig
  UNION ALL
  SELECT conv_id, ts, 'tool_call', tool_call FROM sig
)
SELECT conv_id, signal,
       (epoch_us(ts) // 60000000) * 60000000 AS bucket_ts,
       count(*) AS n, sum(v) AS sum_v, min(v) AS min_v, max(v) AS max_v,
       sum(v*v) AS sumsq,
       min(epoch_us(ts)) AS first_ts, arg_min(v, epoch_us(ts)) AS first_v,
       max(epoch_us(ts)) AS last_ts,  arg_max(v, epoch_us(ts)) AS last_v,
       sum(v) / count(*) AS mean_v
FROM long
GROUP BY 1, 2, 3
"""


def test_rollup_1m_matches_duckdb(ray_session, duck):
    ds = transcripts_from_events(SF)
    sig = derive_signals(ds)
    got = rollup_from_signals(sig, "1m").to_pandas()
    want = duck.sql(ROLLUP_SQL_1M).df()
    keys = ["conv_id", "signal", "bucket_ts"]
    got = sorted_df(got.drop(columns=["gap_filled"]), keys)
    want = sorted_df(want, keys)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tier_fold_identity(ray_session):
    """1h-from-1m partials == 1h-from-raw (continuous-aggregate property)."""
    import ray

    tbl = synthetic_transcripts(n_convs=5, seed=3, mean_turns=120)
    sig = derive_signals(ray.data.from_arrow(tbl))
    t1m = rollup_from_signals(sig, "1m")
    via_1m = fold_tier(t1m, "1h").to_pandas()
    direct = rollup_from_signals(sig, "1h").to_pandas()
    keys = ["conv_id", "signal", "bucket_ts"]
    pd.testing.assert_frame_equal(sorted_df(via_1m, keys), sorted_df(direct, keys))


def test_gap_fill(ray_session):
    import ray

    # synthetic generator injects a 2h gap mid-conv -> 1m tier must fill
    tbl = synthetic_transcripts(n_convs=2, seed=4, mean_turns=100)
    sig = derive_signals(ray.data.from_arrow(tbl))
    t1m = rollup_from_signals(sig, "1m")
    filled = gap_fill_tier(t1m, "1m").to_pandas()
    g = filled[(filled.conv_id == filled.conv_id.iloc[0]) &
               (filled.signal == "text_len")].sort_values("bucket_ts")
    bts = g["bucket_ts"].to_numpy()
    assert (np.diff(bts) == 60_000_000).all(), "buckets contiguous after fill"
    gaps = g[g.gap_filled]
    assert len(gaps) > 0
    assert (gaps["n"] == 0).all()
    # interpolated means lie between the surrounding real means
    real = g[~g.gap_filled]["mean_v"]
    assert gaps["mean_v"].between(real.min() - 1e-9, real.max() + 1e-9).all()


def test_distributed_profiles_match_oracle(ray_session):
    import ray

    tbl = synthetic_transcripts(n_convs=4, seed=6, mean_turns=80)
    cfg = EngineConfig(window_size=8, profile_concurrency=2,
                       salt_turn_threshold=10_000)
    packed = pack_series(ray.data.from_arrow(tbl))
    prof = compute_profiles(packed, cfg).to_pandas()
    # oracle: per conv/signal numpy stomp on the stably ordered series
    df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"])
    checked = 0
    for conv, g in df.groupby("conv_id"):
        series = g["text"].str.len().to_numpy().astype(float)
        if len(series) < 16:
            continue
        want = stomp(series, 8)
        got = prof[(prof.conv_id == conv) & (prof.signal == "text_len")]
        got = got.sort_values("window_idx")
        np.testing.assert_allclose(got["mp"].to_numpy(), want.mp, atol=2e-5)
        np.testing.assert_allclose(got["rmp"].to_numpy(), want.rmp, atol=2e-5)
        checked += 1
    assert checked >= 3


def test_salted_path_equals_inline(ray_session):
    import ray

    tbl = synthetic_transcripts(n_convs=3, seed=7, mean_turns=60,
                                long_conv_turns=900)
    packed = pack_series(ray.data.from_arrow(tbl))
    inline = compute_profiles(
        packed, EngineConfig(window_size=8, salt_turn_threshold=10_000)
    ).to_pandas()
    salted = compute_profiles(
        packed, EngineConfig(window_size=8, salt_turn_threshold=500,
                             profile_concurrency=3)
    ).to_pandas()
    keys = ["conv_id", "signal", "window_idx"]
    a = sorted_df(inline, keys)
    b = sorted_df(salted, keys)
    assert len(a) > 0  # two empty frames would compare equal vacuously
    np.testing.assert_allclose(a["mp"].to_numpy(), b["mp"].to_numpy(), atol=2e-5)
    np.testing.assert_allclose(a["rmp"].to_numpy(), b["rmp"].to_numpy(), atol=2e-5)
    np.testing.assert_allclose(a["lmp"].to_numpy(), b["lmp"].to_numpy(), atol=2e-5)


def test_salted_path_equals_inline_large_window_mpx_branch(ray_session):
    """Same salted-vs-inline parity but with w=40 (> 32), which routes the
    shard path through the mpx DIAGONAL branch instead of the blocked
    strips — both kernel branches of _sharded_profiles_ds stay covered at
    stage level."""
    import ray

    tbl = synthetic_transcripts(n_convs=2, seed=11, mean_turns=60,
                                long_conv_turns=700)
    packed = pack_series(ray.data.from_arrow(tbl))
    inline = compute_profiles(
        packed, EngineConfig(window_size=40, salt_turn_threshold=10_000)
    ).to_pandas()
    salted = compute_profiles(
        packed, EngineConfig(window_size=40, salt_turn_threshold=300,
                             profile_concurrency=3)
    ).to_pandas()
    keys = ["conv_id", "signal", "window_idx"]
    a = sorted_df(inline, keys)
    b = sorted_df(salted, keys)
    assert len(a) == len(b) and len(a) > 0
    for col in ["mp", "lmp", "rmp"]:
        np.testing.assert_allclose(a[col].to_numpy(), b[col].to_numpy(),
                                   atol=2e-5)


def test_sharded_mstomp_equals_single_task(ray_session):
    """compute_mstomp's index-range shard path (mstomp_par analog,
    /root/reference/R/mstomp-par.R:110-127) == the one-task-per-conv path."""
    import ray

    from tsmp_ray.stages.mining_stage import compute_mstomp

    tbl = synthetic_transcripts(n_convs=3, seed=9, mean_turns=60,
                                long_conv_turns=900)
    packed = pack_series(ray.data.from_arrow(tbl))
    inline = compute_mstomp(
        packed, EngineConfig(window_size=8, salt_turn_threshold=10_000)
    ).to_pandas()
    sharded = compute_mstomp(
        packed, EngineConfig(window_size=8, salt_turn_threshold=500,
                             profile_concurrency=3)
    ).to_pandas()
    keys = ["conv_id", "k_dim", "window_idx"]
    a = sorted_df(inline, keys)
    b = sorted_df(sharded, keys)
    assert len(a) == len(b) and len(a) > 0
    for col in ["mp", "lmp", "rmp"]:
        np.testing.assert_allclose(a[col].to_numpy(), b[col].to_numpy(),
                                   atol=2e-5)
    # indices may legitimately differ only at numeric ties (FFT-seeded vs
    # recurrence-propagated QT rounding flips argmin between equidistant
    # candidates) — so any index mismatch must sit on a matching distance,
    # and mismatches must be rare
    for icol, dcol in (("pi", "mp"), ("lpi", "lmp"), ("rpi", "rmp")):
        ia, ib = a[icol].to_numpy(), b[icol].to_numpy()
        diff = ia != ib
        assert diff.mean() < 0.02, (icol, int(diff.sum()))
        np.testing.assert_allclose(a[dcol].to_numpy()[diff],
                                   b[dcol].to_numpy()[diff], atol=2e-5)


def test_conv_pair_stage_pairs_and_values(ray_session):
    """conv_pair_stage pairs c<2k> with c<2k+1> and the pair ops reproduce
    the direct kernel calls."""
    import ray

    from tsmp_ray.kernels.mining import mpdist
    from tsmp_ray.stages.mining_stage import (
        abjoin_pair_op, conv_pair_stage, mpdist_pair_op,
    )

    tbl = synthetic_transcripts(n_convs=5, seed=4, mean_turns=80)
    packed = pack_series(ray.data.from_arrow(tbl))
    w = 8

    out = conv_pair_stage(packed, mpdist_pair_op, {"w": w}).to_pandas()
    # numeric suffixes 0..4 → pairs (0,1), (2,3); 4 has no partner
    got_pairs = set(zip(out["conv_a"], out["conv_b"]))
    from tsmp_ray.stages.mining_stage import _conv_num
    df = tbl.to_pandas()
    series = {}
    for conv, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        series[conv] = g["text"].str.len().to_numpy().astype(np.float64)
    by_num = {_conv_num(c): c for c in series}
    nums = sorted(by_num)
    want_pairs = {(by_num[a], by_num[a + 1]) for a in nums[::2]
                  if a + 1 in by_num
                  and len(series[by_num[a]]) >= 2 * w
                  and len(series[by_num[a + 1]]) >= 2 * w}
    assert got_pairs == want_pairs and len(got_pairs) >= 1
    for _, r in out.iterrows():
        want = mpdist(series[r["conv_a"]], series[r["conv_b"]], w)
        assert abs(r["mpdist"] - want) < 1e-9

    ab = conv_pair_stage(packed, abjoin_pair_op, {"w": w}).to_pandas()
    assert set(ab["orientation"]) == {"ab", "ba"}
    from tsmp_ray.kernels.mpx import mpx
    one = ab[(ab["conv_a"] == sorted(got_pairs)[0][0])
             & (ab["orientation"] == "ab")].sort_values("window_idx")
    a_id, b_id = sorted(got_pairs)[0]
    prof = mpx(series[a_id], w, query=series[b_id])
    np.testing.assert_allclose(one["mp"].to_numpy(), prof.mp, atol=1e-9)


def test_checked_ops_gate_production_kernels(ray_session):
    """profile/distprof/stompi/abjoin _checked ops run green on real packed
    data (the in-op assertion passes) and raise on a poisoned kernel."""
    import ray

    from tsmp_ray.stages.mining_stage import (
        distprof_checked_op, per_conv_stage, profile_checked_op,
        stompi_checked_op,
    )

    tbl = synthetic_transcripts(n_convs=4, seed=11, mean_turns=100)
    packed = pack_series(ray.data.from_arrow(tbl))
    kw = {"w": 8, "zone": 4}
    prof = per_conv_stage(packed, profile_checked_op, kw).to_pandas()
    dp = per_conv_stage(packed, distprof_checked_op, {"w": 8}).to_pandas()
    st = per_conv_stage(packed, stompi_checked_op, kw).to_pandas()
    assert len(prof) > 0 and len(dp) > 0 and len(st) > 0
    # stompi emits the same oracle-order values as profile_checked (on the
    # convs long enough for both: stompi needs ≥ 4w, profile ≥ 2w)
    prof_c = prof[prof["conv_id"].isin(set(st["conv_id"]))]
    pd.testing.assert_frame_equal(
        prof_c.sort_values(["conv_id", "window_idx"]).reset_index(drop=True),
        st.sort_values(["conv_id", "window_idx"]).reset_index(drop=True))

    # poisoned tolerance must raise the GATE's own AssertionError — a bare
    # Exception match would also pass on e.g. a TypeError from a renamed
    # kwarg, leaving the gate silently un-exercised
    with pytest.raises(Exception, match="deviates"):
        per_conv_stage(packed, profile_checked_op,
                       dict(kw, atol=1e-14)).to_pandas()


def test_profile_kernel_batched_emit_equals_per_conv():
    """ProfileKernel.__call__'s one-table-per-batch accumulation must equal
    the per-conv profile_to_rows concat exactly — including a too-short
    conv skipped mid-batch — and an all-short batch must come out empty
    with the stable schema. Pure local (no Ray)."""
    from tsmp_ray.stages.profile_stage import (PROFILE_SCHEMA, ProfileKernel,
                                               profile_to_rows)

    rng = np.random.default_rng(3)
    w = 8
    kern = ProfileKernel(window_size=w)
    lengths = [40, 9, 55]  # middle conv < 2w -> skipped
    series = {cid: {sig: rng.integers(0, 50, n).astype(float)
                    for sig in kern.signals}
              for cid, n in zip(["c0", "c1", "c2"], lengths)}
    batch = pa.table({
        "conv_id": pa.array(list(series)),
        **{sig: pa.array([series[c][sig] for c in series],
                         type=pa.list_(pa.float64()))
           for sig in kern.signals},
    })
    got = kern(batch)
    want = pa.concat_tables(
        [profile_to_rows(cid, sig, kern._one_profile(series[cid][sig]))
         for cid in ("c0", "c2") for sig in kern.signals])
    assert got.schema.equals(PROFILE_SCHEMA)
    assert got.equals(want)

    empty = kern(batch.filter(pa.array([False, True, False])))
    assert empty.num_rows == 0 and empty.schema.equals(PROFILE_SCHEMA)


def test_tiers_from_packed_equals_build_tiers(ray_session):
    """The zero-shuffle packed-row tier path must equal the generic
    partial+groupby fold path BITWISE (same add order: ts order within
    buckets, bucket order across folds), gap rows included."""
    import ray

    from tsmp_ray.pipelines.analyze import build_tiers
    from tsmp_ray.stages.rollup import tiers_from_packed
    from tsmp_ray.stages.signals import unpack_signals

    tbl = synthetic_transcripts(n_convs=5, seed=8, mean_turns=150)
    packed = pack_series(ray.data.from_arrow(tbl)).materialize()
    cfg = EngineConfig(window_size=8)
    a = build_tiers(unpack_signals(packed), cfg)
    b = tiers_from_packed(packed, gap_fill=cfg.gap_fill,
                          max_gap=cfg.gap_fill_max_buckets)
    keys = ["conv_id", "signal", "bucket_ts"]
    for tier in ("1m", "1h", "1d"):
        x = sorted_df(a[tier].to_pandas(), keys)
        y = sorted_df(b[tier].to_pandas(), keys)[x.columns.tolist()]
        assert len(x) > 0
        pd.testing.assert_frame_equal(x, y, check_dtype=False)


def test_review_guards():
    """Loud-failure guards added in the round-5 review pass: unordered tier
    tuples, conv ids without a numeric pairing suffix, and FLOSS chunks
    that outrun the CAC window (each previously a silent wrong answer)."""
    from tsmp_ray.stages.floss_stage import FlossState
    from tsmp_ray.stages.mining_stage import _conv_num
    from tsmp_ray.stages.rollup import tiers_from_packed

    # tiers must widen and nest — validated before any Dataset work
    with pytest.raises(ValueError, match="ascending"):
        tiers_from_packed(None, tiers=("1h", "1m"))

    assert _conv_num("conv000042") == 42
    with pytest.raises(ValueError, match="numeric suffix"):
        _conv_num("alpha")

    st = FlossState(w=8, data_window=40)  # CAC window = 33
    with pytest.raises(ValueError, match="CAC window"):
        st.append(np.arange(200, dtype=np.float64), chunk=50)
