"""Resumable-output + retention-compaction tests (FIXTURES.md F3 retention):
partitioned atomic writes, manifest skip-on-rerun, byte-identical resume, TTL
compaction updating the manifest."""

import json
import os
import shutil

import numpy as np
import pytest

from tsmp_ray.sources.transcripts import synthetic_transcripts
from tsmp_ray.stages.rollup import rollup_from_signals
from tsmp_ray.stages.signals import derive_signals
from tsmp_ray.state.lineage import Manifest, read_partitioned, resumable_write


@pytest.fixture()
def tier_ds(ray_session):
    import ray

    tbl = synthetic_transcripts(n_convs=4, seed=20, mean_turns=80)
    return rollup_from_signals(derive_signals(ray.data.from_arrow(tbl)),
                               "1m").materialize()


def tree_bytes(d):
    out = {}
    for root, _dirs, files in sorted(os.walk(d)):
        for f in sorted(files):
            if f.startswith("_manifest"):
                continue
            p = os.path.join(root, f)
            out[os.path.relpath(p, d)] = open(p, "rb").read()
    return out


def test_resumable_write_and_resume(tier_ds, tmp_path):
    out = str(tmp_path / "tier1m")
    st1 = resumable_write(tier_ds, out, "signal")
    assert set(st1.values()) == {"written"}
    man = Manifest(out)
    assert len(man.data["partitions"]) == 3
    for entry in man.data["partitions"].values():
        assert entry["rows"] > 0 and "content_crc32" in entry

    # simulate a kill after the first partition: drop two partitions' manifest
    # entries + dirs, rerun → only those are rewritten, survivor untouched
    keys = sorted(man.data["partitions"])
    survivor = keys[0]
    before = tree_bytes(os.path.join(out, survivor))
    for k in keys[1:]:
        shutil.rmtree(os.path.join(out, k))
        man.drop(k)
    st2 = resumable_write(tier_ds, out, "signal")
    assert st2[survivor] == "skipped"
    assert all(v == "written" for k, v in st2.items() if k != survivor)
    after = tree_bytes(os.path.join(out, survivor))
    assert before == after  # byte-identical: untouched partition

    # full rerun: everything skipped
    st3 = resumable_write(tier_ds, out, "signal")
    assert set(st3.values()) == {"skipped"}

    # read back and compare FULL CONTENT to the source (a count+uniques
    # check passed on scrambled or duplicated-then-truncated data)
    import pandas as pd

    got = read_partitioned(out, "signal").to_pandas()
    want = tier_ds.to_pandas()
    keys = ["conv_id", "signal", "bucket_ts"]
    g = got.sort_values(keys).reset_index(drop=True)
    v = want[g.columns.tolist()].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, v, check_dtype=False)


def test_retention_compaction(tier_ds, tmp_path, ray_session):
    from tsmp_ray.stages.retention import apply_retention, compact, mark_expired

    out = str(tmp_path / "tier1m")
    resumable_write(tier_ds, out, "signal")
    pdf = tier_ds.to_pandas()
    lo, hi = pdf["bucket_ts"].min(), pdf["bucket_ts"].max()
    ttl = int(hi - (lo + (hi - lo) * 0.4))  # expire oldest ~40%

    marked = mark_expired(tier_ds, now_us=int(hi), ttl_us=ttl).to_pandas()
    assert marked["ttl_expired"].any() and not marked["ttl_expired"].all()
    kept_stream = apply_retention(tier_ds, now_us=int(hi), ttl_us=ttl).count()

    status = compact(out, now_us=int(hi), ttl_us=ttl)
    assert set(status.values()) <= {"compacted", "unchanged", "emptied"}
    assert "compacted" in status.values()
    got = read_partitioned(out, "signal").to_pandas()
    assert len(got) == kept_stream
    assert (got["bucket_ts"] >= int(hi) - ttl).all()
    man = Manifest(out)
    for key, entry in man.data["partitions"].items():
        if status[key] == "compacted":
            assert "compacted_at" in entry

    # idempotent: second compaction changes nothing
    status2 = compact(out, now_us=int(hi), ttl_us=ttl)
    assert set(status2.values()) == {"unchanged"}


def test_kill_and_resume_subprocess(tmp_path):
    """North-rule resume check with a REAL kill: a subprocess writes the tier
    partition-by-partition and is SIGKILLed after the first partition lands;
    a rerun skips completed work and the final layout is byte-identical to an
    uninterrupted run."""
    import signal
    import subprocess
    import sys
    import time as _time

    script = tmp_path / "writer.py"
    out_a = tmp_path / "killed"
    out_b = tmp_path / "clean"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script.write_text(f"""
import sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from tsmp_ray.sources.transcripts import synthetic_transcripts
from tsmp_ray.stages.rollup import rollup_from_signals
from tsmp_ray.stages.signals import derive_signals
from tsmp_ray.state.lineage import resumable_write

out_dir, slow = sys.argv[1], sys.argv[2] == "slow"
tbl = synthetic_transcripts(n_convs=4, seed=33, mean_turns=80)
tier = rollup_from_signals(derive_signals(ray.data.from_arrow(tbl)),
                           "1m").materialize()
for sig in ("text_len", "tool_call", "ts_delta"):
    resumable_write(tier, out_dir, "signal", partition_values=[sig])
    print("DONE", sig, flush=True)
    if slow:
        time.sleep(20)  # window for the kill
ray.shutdown()
""")
    env = dict(os.environ)
    # killed run: SIGKILL right after the first partition reports DONE
    proc = subprocess.Popen([sys.executable, str(script), str(out_a), "slow"],
                            stdout=subprocess.PIPE, text=True, env=env)
    t0 = _time.time()
    while _time.time() - t0 < 180:
        line = proc.stdout.readline()
        if line.startswith("DONE"):
            break
    proc.kill()
    proc.wait()
    man = Manifest(str(out_a))
    assert len(man.data["partitions"]) == 1  # exactly the finished partition

    # resume: completes the rest, skipping the survivor
    r = subprocess.run([sys.executable, str(script), str(out_a), "fast"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    # clean run for comparison
    r2 = subprocess.run([sys.executable, str(script), str(out_b), "fast"],
                        capture_output=True, text=True, env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]

    a = {k: v["rows"] for k, v in Manifest(str(out_a)).data["partitions"].items()}
    b = {k: v["rows"] for k, v in Manifest(str(out_b)).data["partitions"].items()}
    assert a == b and len(a) == 3
    crc_a = {k: v["content_crc32"]
             for k, v in Manifest(str(out_a)).data["partitions"].items()}
    crc_b = {k: v["content_crc32"]
             for k, v in Manifest(str(out_b)).data["partitions"].items()}
    assert crc_a == crc_b  # byte-identical partitions after resume


def test_compact_recovers_interrupted_rename(tier_ds, tmp_path, ray_session):
    """A compact killed between its two renames leaves the live partition at
    '<path>.old'; the next compact must restore it before reading (the old
    rmtree-then-replace sequence simply LOST those rows)."""
    from tsmp_ray.stages.retention import compact

    out = str(tmp_path / "tier1m")
    resumable_write(tier_ds, out, "signal")
    before = read_partitioned(out, "signal").to_pandas()
    hi = int(before["bucket_ts"].max())
    lo = int(before["bucket_ts"].min())

    man = Manifest(out)
    key = sorted(man.data["partitions"])[0]
    path = os.path.join(out, key)
    os.replace(path, path + ".old")  # simulate the crash window

    # ttl keeps everything: the restored partition must be byte-complete
    status = compact(out, now_us=hi, ttl_us=(hi - lo) + 1)
    assert status[key] == "unchanged"
    assert os.path.isdir(path) and not os.path.exists(path + ".old")
    after = read_partitioned(out, "signal").to_pandas()
    assert len(after) == len(before)


def test_compact_refreshes_manifest_after_promote_crash(tier_ds, tmp_path,
                                                        ray_session):
    """A compact killed between promoting tmp -> path and man.record leaves
    the COMPACTED rows on disk under the PRE-compaction manifest entry; the
    next run's n_keep == total takes the 'unchanged' branch, so it must
    detect the rows mismatch and refresh the entry (stale rows/crc would make
    any integrity consumer report the partition as corrupt forever)."""
    from tsmp_ray.stages.retention import compact
    from tsmp_ray.state.lineage import _content_hash

    out = str(tmp_path / "tier1m")
    resumable_write(tier_ds, out, "signal")
    pdf = tier_ds.to_pandas()
    lo, hi = int(pdf["bucket_ts"].min()), int(pdf["bucket_ts"].max())
    ttl = int(hi - (lo + (hi - lo) * 0.4))

    man = Manifest(out)
    stale_entries = {k: dict(v) for k, v in man.data["partitions"].items()}
    status = compact(out, now_us=hi, ttl_us=ttl)
    compacted = [k for k, v in status.items() if v == "compacted"]
    assert compacted
    key = compacted[0]
    # simulate the crash: disk state is post-compaction, manifest entry is
    # the pre-compaction one (rows too high, old crc, no compacted_at)
    man2 = Manifest(out)
    man2.record(key, stale_entries[key])

    status2 = compact(out, now_us=hi, ttl_us=ttl)
    assert status2[key] == "compacted"  # refreshed, not 'unchanged'
    entry = Manifest(out).data["partitions"][key]
    path = os.path.join(out, key)
    got = read_partitioned(out, "signal").to_pandas()
    on_disk = len(got[got[key.split("=")[0]] == key.split("=", 1)[1]])
    assert entry["rows"] == on_disk
    assert entry["content_crc32"] == _content_hash(path)
    assert "compacted_at" in entry


def test_compact_finishes_interrupted_empty_drop(tier_ds, tmp_path,
                                                 ray_session):
    """A compact killed between rmtree(path) (partition fully expired) and
    man.drop leaves a manifest entry pointing at a missing directory; the
    next run must finish the drop instead of failing the read."""
    from tsmp_ray.stages.retention import compact

    out = str(tmp_path / "tier1m")
    resumable_write(tier_ds, out, "signal")
    pdf = tier_ds.to_pandas()
    lo, hi = int(pdf["bucket_ts"].min()), int(pdf["bucket_ts"].max())

    man = Manifest(out)
    key = sorted(man.data["partitions"])[0]
    shutil.rmtree(os.path.join(out, key))  # crash window: dir gone,
    # manifest entry still present

    status = compact(out, now_us=hi, ttl_us=(hi - lo) + 1)  # keep-all ttl
    assert status[key] == "emptied"
    man2 = Manifest(out)
    assert key not in man2.data["partitions"]
    assert all(v == "unchanged" for k, v in status.items() if k != key)


def test_stale_tmp_dir_not_adopted(tier_ds, tmp_path, ray_session):
    """A '<key>.tmp-<pid>' leftover also starts with '<col>=' and already
    holds _SUCCESS (written before the promoting rename) — adoption must
    skip and clear it, not record it as a bogus extra partition whose rows
    read_partitioned would return twice."""
    out = str(tmp_path / "tier1m")
    resumable_write(tier_ds, out, "signal")
    n_rows = len(read_partitioned(out, "signal").to_pandas())

    man = Manifest(out)
    key = sorted(man.data["partitions"])[0]
    stale = os.path.join(out, key + ".tmp-99999")
    shutil.copytree(os.path.join(out, key), stale)  # crash leftover

    status = resumable_write(tier_ds, out, "signal")
    assert set(status.values()) == {"skipped"}
    man2 = Manifest(out)
    assert not any(".tmp-" in k for k in man2.data["partitions"])
    assert not os.path.exists(stale)
    assert len(read_partitioned(out, "signal").to_pandas()) == n_rows
