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

    # read back and compare to the source
    got = read_partitioned(out, "signal").to_pandas()
    want = tier_ds.to_pandas()
    assert len(got) == len(want)
    assert sorted(got["signal"].unique()) == sorted(want["signal"].unique())


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
