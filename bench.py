"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address='local',
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "turns_per_sec": ...}

``--scaling``: runs the headline pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs and
the scaling efficiency (the sandbox stand-in for the N vs 4N cluster rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def headline_pipelines():
    """name -> zero-arg callable returning a consumed (executed) result."""
    import ray

    from tsmp_ray.config import EngineConfig
    from tsmp_ray.pipelines.analyze import build_tiers
    from tsmp_ray.pipelines.queries import (
        CFG, q_dedup_exact, q_knn_topk, q_minhash_dedup, q_token_counts,
    )
    from tsmp_ray.sources.transcripts import transcripts_from_events
    from tsmp_ray.stages.compression import pack_rollup_series
    from tsmp_ray.stages.profile_stage import compute_profiles
    from tsmp_ray.stages.rollup import rollup_from_signals
    from tsmp_ray.stages.signals import derive_signals, pack_series

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def rollup_tiers():
        sig = derive_signals(transcripts_from_events(sf_dir))
        tiers = build_tiers(sig, CFG)
        total = 0
        for t in tiers.values():
            total += t.count()
        return total

    def profiles():
        packed = pack_series(transcripts_from_events(sf_dir))
        return compute_profiles(packed, CFG).count()

    def packed():
        t1m = rollup_from_signals(derive_signals(transcripts_from_events(sf_dir)), "1m")
        return pack_rollup_series(t1m).count()

    def dedup():
        return q_dedup_exact(sf_dir).count() + q_minhash_dedup(sf_dir).count()

    def text():
        return q_token_counts(sf_dir).count()

    def knn():
        return len(q_knn_topk(sf_dir))

    return sf_dir, {
        "rollup_tiers": rollup_tiers,
        "profiles": profiles,
        "pack_1m": packed,
        "dedup": dedup,
        "token_counts": text,
        "knn_topk": knn,
    }


def run_bench() -> dict:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    sf_dir, pipes = headline_pipelines()

    # count turns once (cheap metadata read) + warm the page cache
    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows

    times = {}
    for name, fn in pipes.items():
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "rollup+matrix-profile wall time (headline pipelines)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / max(times["rollup_tiers"]
                                             + times["profiles"], 1e-9), 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    run(8)  # warm OS page cache (untimed)
    lo = run(8)
    hi = run(32)
    core = lambda r: r["queries"]["rollup_tiers"] + r["queries"]["profiles"]
    eff = (core(lo) / core(hi)) / (32 / 8)
    return {
        "sec_8": core(lo), "sec_32": core(hi),
        "turns_per_sec_8": round(lo["n_turns"] / core(lo), 1),
        "turns_per_sec_32": round(hi["n_turns"] / core(hi), 1),
        "scaling_efficiency": round(eff, 3),
        "full_8": lo, "full_32": hi,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
