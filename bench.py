"""Benchmark harness.

Headline workload = the flagship transcript pipeline (derive signals → tiered
rollup raw→1m→1h→1d with gap-fill → matrix profiles incl. salted long convs)
over a DETERMINISTIC synthetic transcript table sized to ``$GRAFT_SF_DIR``
(the driver's events tables are far too small/sparse to exercise the O(n²)
kernels — the brief allows synthesizing the input-hint table for benchmarks).
The synthetic parquet is generated once into /tmp and reused (generation is
untimed; both scaling runs read the same file).

Secondary pipelines run the training-data ops over the driver's real tables.

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "n_turns": ..., "turns_per_sec": ...}

``--scaling``: same job in fresh processes at num_cpus=8 then 32 (one warm-up
run first), reporting both throughputs + efficiency — the sandbox stand-in
for the N vs 4N cluster rule (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

#: synthetic workload sizing per driver scale factor:
#: (n_convs, mean_turns, long_conv_turns) — long conv exceeds the salting
#: threshold to exercise diagonal sharding
#: (n_convs, mean_turns, long_conv_turns, max_turns): the zipf tail is capped
#: BELOW the salting threshold (20k) so exactly one forced conversation
#: exercises the diagonal-shard path
BENCH_SHAPES = {
    "sf0.001": (20, 150, 2_000, 1_200),
    "sf0.01": (60, 800, 8_000, 6_000),
    "sf0.1": (500, 2_500, 24_000, 18_000),
}


def ensure_bench_transcripts(sf_dir: str) -> tuple[str, int]:
    import pyarrow.parquet as pq

    name = os.path.basename(os.path.normpath(sf_dir))
    n_convs, mean_turns, long_turns, max_turns = BENCH_SHAPES.get(
        name, BENCH_SHAPES["sf0.1"])
    path = f"/tmp/tsmp_bench_cache/transcripts_{name}.parquet"
    if not os.path.exists(path):
        from tsmp_ray.sources.transcripts import synthetic_transcripts

        os.makedirs(os.path.dirname(path), exist_ok=True)
        tbl = synthetic_transcripts(n_convs=n_convs, seed=42,
                                    mean_turns=mean_turns,
                                    long_conv_turns=long_turns,
                                    max_turns=max_turns)
        pq.write_table(tbl, path + ".tmp", row_group_size=100_000)
        os.replace(path + ".tmp", path)
    return path, pq.read_metadata(path).num_rows


def headline_pipelines(sf_dir: str):
    """name -> zero-arg callable returning a consumed (executed) result."""
    import ray

    from tsmp_ray.pipelines.analyze import build_tiers
    from tsmp_ray.pipelines.queries import (
        CFG, q_dedup_exact, q_knn_topk, q_minhash_dedup, q_token_counts,
    )
    from tsmp_ray.stages.compression import pack_rollup_series
    from tsmp_ray.stages.profile_stage import compute_profiles
    from tsmp_ray.stages.signals import derive_signals, pack_series

    path, _ = ensure_bench_transcripts(sf_dir)

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    def read_tr():
        # ~2 blocks per CPU: enough sort/shuffle parallelism without the
        # quadratic shuffle-object overhead of hundreds of tiny partitions
        return ray.data.read_parquet(path, override_num_blocks=2 * ncpu)

    def rollup_tiers():
        tiers = build_tiers(derive_signals(read_tr()), CFG)
        return sum(t.count() for t in tiers.values())

    def profiles():
        return compute_profiles(pack_series(read_tr()), CFG).count()

    def pack_1m():
        from tsmp_ray.stages.rollup import rollup_from_signals

        t1m = rollup_from_signals(derive_signals(read_tr()), "1m")
        return pack_rollup_series(t1m).count()

    def dedup():
        return q_dedup_exact(sf_dir).count() + q_minhash_dedup(sf_dir).count()

    def text():
        return q_token_counts(sf_dir).count()

    def knn():
        return len(q_knn_topk(sf_dir))

    return {
        "rollup_tiers": rollup_tiers,
        "profiles": profiles,
        "pack_1m": pack_1m,
        "dedup": dedup,
        "token_counts": text,
        "knn_topk": knn,
    }


def run_bench() -> dict:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _path, n_turns = ensure_bench_transcripts(sf_dir)  # untimed generation

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    pipes = headline_pipelines(sf_dir)
    times = {}
    for name, fn in pipes.items():
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)
    total = round(sum(times.values()), 3)
    core = times["rollup_tiers"] + times["profiles"]
    out = {
        "metric": "rollup+matrix-profile wall time (headline pipelines)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / max(core, 1e-9), 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """N vs 4N parallelism scaling. Levels via $SCALE_LO / $SCALE_HI.

    Default 4 → 16: this box has 16 PHYSICAL cores (raw-CPU control: 1→16
    processes scale linearly, 16→32 only 1.6× = SMT threads), so 4→16 is the
    pair where added parallelism means added hardware — the situation a real
    N→4N node cluster reproduces. 8→32 is also recorded in BASELINE.md with
    the SMT/bandwidth caveat. Each level runs twice, keeping the faster run
    (single-box scheduling noise is large; min is the standard estimator)."""
    lo_n = int(os.environ.get("SCALE_LO", "4"))
    hi_n = int(os.environ.get("SCALE_HI", "16"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    core = lambda r: r["queries"]["rollup_tiers"] + r["queries"]["profiles"]
    run(hi_n)  # warm OS page cache + bench-input cache (untimed)
    lo = min(run(lo_n), run(lo_n), key=core)
    hi = min(run(hi_n), run(hi_n), key=core)
    eff = (core(lo) / core(hi)) / (hi_n / lo_n)
    return {
        "cpus": [lo_n, hi_n],
        f"sec_{lo_n}": core(lo), f"sec_{hi_n}": core(hi),
        f"turns_per_sec_{lo_n}": round(lo["n_turns"] / core(lo), 1),
        f"turns_per_sec_{hi_n}": round(hi["n_turns"] / core(hi), 1),
        "scaling_efficiency": round(eff, 3),
        "full_lo": lo, "full_hi": hi,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
