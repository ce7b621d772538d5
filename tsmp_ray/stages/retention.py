"""TTL-driven retention compaction over the tiered rollup store.

North-star requirement: "TTL-driven retention compaction". Each tier has a
TTL; a compaction pass drops expired buckets and rewrites only the partitions
that changed, updating the lineage manifest (so a later resume sees the
compacted state). The raw tier typically has the shortest TTL and coarser
tiers keep data longer — the classic downsample-retention policy.

``mark_expired`` is a pure stage (vectorized filter); ``compact`` is the
manifest-driven rewrite (read partition → filter → atomic replace → manifest
update with a ``compacted_at`` note).
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow.compute as pc

from ..state.lineage import Manifest, _content_hash


def mark_expired(ds_tier, now_us: int, ttl_us: int):
    """Append ``ttl_expired`` = bucket older than (now - ttl)."""
    cutoff = now_us - ttl_us

    def mark(batch):
        return batch.append_column(
            "ttl_expired", pc.less(batch["bucket_ts"], cutoff)
        )

    return ds_tier.map_batches(mark, batch_format="pyarrow")


def apply_retention(ds_tier, now_us: int, ttl_us: int):
    """Drop expired buckets (streaming filter)."""
    cutoff = now_us - ttl_us
    return ds_tier.filter(expr=f"bucket_ts >= {cutoff}")


def compact(out_dir: str, now_us: int, ttl_us: int) -> dict:
    """Manifest-driven retention rewrite of a resumable tier layout.

    For each completed partition: read, drop expired buckets, atomically
    replace the partition directory, refresh its manifest entry. Partitions
    with nothing expired are left untouched (cheap metadata check via parquet
    statistics would skip the read at scale; here we read and compare counts).
    Returns {partition: 'compacted'|'unchanged'|'emptied'}.
    """
    import ray

    man = Manifest(out_dir)
    cutoff = now_us - ttl_us
    status: dict[str, str] = {}
    for key in sorted(man.data["partitions"]):
        path = os.path.join(out_dir, key)
        # crash recovery: a previous compact that died between its two
        # renames left the live data at path+'.old' — restore it first
        old = path + ".old"
        if not os.path.exists(path) and os.path.exists(old):
            os.replace(old, path)
        shutil.rmtree(old, ignore_errors=True)
        if not os.path.exists(path):
            # a previous run emptied the partition (rmtree) but crashed
            # before man.drop — finish the drop now instead of failing the
            # read on a directory the manifest wrongly still records
            man.drop(key)
            status[key] = "emptied"
            continue
        ds = ray.data.read_parquet(path)
        total = ds.count()
        kept = ds.filter(expr=f"bucket_ts >= {cutoff}")
        n_keep = kept.count()
        if n_keep == total:
            entry = dict(man.data["partitions"][key])
            if entry.get("rows") != total:
                # a previous run promoted its rewrite (tmp -> path) but
                # crashed before man.record — the on-disk partition is the
                # compacted one while the manifest still records the
                # pre-compaction rows/crc; refresh the entry now so
                # integrity consumers don't read the partition as corrupt
                entry.update(
                    rows=total,
                    content_crc32=_content_hash(path),
                    compacted_at=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime()),
                    ttl_cutoff_us=cutoff,
                )
                man.record(key, entry)
                status[key] = "compacted"
            else:
                status[key] = "unchanged"
            continue
        if n_keep == 0:
            shutil.rmtree(path, ignore_errors=True)
            man.drop(key)
            status[key] = "emptied"
            continue
        tmp = path + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        kept.write_parquet(tmp)
        # rename the live dir ASIDE (not rmtree) before promoting tmp: a
        # crash anywhere in this window leaves the rows on disk — either
        # still live, or at '.old' where the recovery preamble above
        # restores them on the next run
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old)
        entry = dict(man.data["partitions"][key])
        entry.update(
            rows=n_keep,
            content_crc32=_content_hash(path),
            compacted_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            ttl_cutoff_us=cutoff,
        )
        man.record(key, entry)
        status[key] = "compacted"
    return status
