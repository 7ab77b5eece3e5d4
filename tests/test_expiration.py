"""Snapshot expiration + orphan-file GC (Iceberg expire_snapshots /
remove_orphan_files analogue): storage stays bounded for a long-running
streaming sink while the replay guard and retention-window time travel
survive."""

from __future__ import annotations

import datetime
import glob
import os

import pytest

from kafka2iceberg_spark.sink import IcebergLite

BASE = datetime.datetime(2024, 9, 1, 12, 0, 0)


def _batch(spark, lo, hi, day=1):
    rows = [
        (f"c{i % 2}", i, f"t{i}",
         BASE.replace(day=day) + datetime.timedelta(minutes=i), i, 0, False)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "offset long, partition_idx int, is_cdc_delete boolean",
    )


def _parquet_count(t):
    return len(glob.glob(os.path.join(t.data_dir, "**", "*.parquet"),
                         recursive=True))


def test_expire_keeps_data_replay_guard_and_recent_travel(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    for b in range(5):
        t.commit_upsert(_batch(spark, b * 4, b * 4 + 4), str(b))
    rows_before = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in t.read(spark).collect()
    )
    files_before = _parquet_count(t)
    v = t.current_version()

    stats = t.expire_snapshots(keep_last=2)
    assert stats["expired_snapshots"] >= 3
    assert stats["deleted_data_files"] >= 1
    assert _parquet_count(t) < files_before

    # current read unchanged
    rows_after = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in t.read(spark).collect()
    )
    assert rows_after == rows_before
    # time travel inside the window works; outside raises
    assert t.read(spark, version=v - 1) is not None
    with pytest.raises(FileNotFoundError):
        t.snapshot_at(0)
    # replay guard survives: every expired batch id is still known
    assert t.committed_batches() == {"0", "1", "2", "3", "4"}
    assert t.commit_upsert(_batch(spark, 0, 4), "1") is False
    # a FRESH instance (cold cache) sees the same guard
    t2 = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    assert t2.committed_batches() == {"0", "1", "2", "3", "4"}


def test_expire_after_compaction_gcs_rewritten_files(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    for b in range(3):
        t.commit_append(_batch(spark, b * 3, b * 3 + 3), str(b))
    assert t.compact(spark, min_files_per_partition=2) >= 1
    files_with_precompact = _parquet_count(t)
    # keep only the compacted snapshot: pre-compaction originals are orphans
    t.expire_snapshots(keep_last=1)
    assert _parquet_count(t) < files_with_precompact
    got = sorted(r.turn_idx for r in t.read(spark).collect())
    assert got == list(range(9))
    assert t.committed_batches() == {"0", "1", "2"}


def test_expire_noop_within_retention(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    t.commit_append(_batch(spark, 0, 3), "0")
    stats = t.expire_snapshots(keep_last=10)
    assert stats == {"expired_snapshots": 0, "deleted_data_files": 0,
                     "deleted_manifests": 0}
    assert sorted(r.turn_idx for r in t.read(spark).collect()) == [0, 1, 2]


def test_expire_twice_is_stable(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    for b in range(6):
        t.commit_append(_batch(spark, b * 2, b * 2 + 2), str(b))
    t.expire_snapshots(keep_last=2)
    stats2 = t.expire_snapshots(keep_last=2)
    assert stats2["expired_snapshots"] == 0
    assert t.committed_batches() == {str(b) for b in range(6)}
    assert sorted(r.turn_idx for r in t.read(spark).collect()) == list(range(12))


def test_streaming_sink_inline_maintenance(spark, tmp_path):
    """maintenance_every compacts + expires inside the foreachBatch loop;
    the final table is identical to a no-maintenance run and replays stay
    no-ops."""
    import os as _os

    from kafka2iceberg_spark.gen import GenConfig, write_stream_files
    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        parsed_stream,
        start_upsert_sink,
    )
    from kafka2iceberg_spark.schema import transcript_task

    broker = str(tmp_path / "broker")
    paths = write_stream_files(
        GenConfig(n_convs=12, turns_per_conv=8, mega_convs=0, mega_turns=0,
                  ooo_fraction=0, late_fraction=0, dup_fraction=0,
                  delete_fraction=0),
        broker,
        files=6,
    )
    for i, p in enumerate(paths):
        _os.utime(p, (1_000_000 + i, 1_000_000 + i))
    spec = transcript_task()

    def run(loc, ck, maint):
        t = IcebergLite(str(tmp_path / loc), pk=spec.primary_keys)
        q = start_upsert_sink(
            parsed_stream(file_broker_stream(spark, broker, 2), spec),
            t,
            str(tmp_path / ck),
            trigger={"availableNow": True},
            maintenance_every=maint,
            keep_snapshots=1,
        )
        q.awaitTermination()
        return t

    t_plain = run("plain", "ck1", None)
    t_maint = run("maint", "ck2", 2)
    rows = lambda t: sorted(  # noqa: E731
        (r.conv_id, r.turn_idx, r.text) for r in t.read(spark).collect()
    )
    assert rows(t_maint) == rows(t_plain)
    # expiration actually ran: fewer retained snapshot files than versions
    metas = [f for f in _os.listdir(t_maint.meta_dir) if f.startswith("v")]
    assert len(metas) <= t_maint.current_version() + 1
    assert t_maint.current_version() >= 2
    # replay protection intact after maintenance: batch 0's snapshot was
    # expired, but its id was inherited — recommitting is a no-op
    assert (
        t_maint.commit_upsert(t_maint.read(spark).limit(0), "0") is False
    )
    assert "0" in t_maint.committed_batches()


def test_expire_widened_retention_after_deeper_expire(spark, tmp_path):
    """Widening keep_last after a prior deeper expiration must not crash on
    the already-deleted snapshots inside the new window (review finding:
    FileNotFoundError from inside foreachBatch maintenance)."""
    t = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    for b in range(7):
        t.commit_append(_batch(spark, b * 2, b * 2 + 2), str(b))
    t.expire_snapshots(keep_last=2)   # deletes v0..v5
    t.commit_append(_batch(spark, 14, 16), "7")
    # wider window than what survives — the anchor must skip the holes
    stats = t.expire_snapshots(keep_last=8)
    assert stats["expired_snapshots"] == 0  # nothing NEW to expire
    assert sorted(r.turn_idx for r in t.read(spark).collect()) == list(range(16))
    assert t.committed_batches() == {str(b) for b in range(8)}


def test_hint_loss_after_expiration_recovers_max_version(spark, tmp_path):
    """ADVICE: after expire_snapshots deletes v0, a lost version hint must
    recover from the max existing v*.json — probing forward from a phantom
    v0 would mint a fresh empty table and orphan the retained snapshots
    (and the replay guard) behind the v1..vN hole."""
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    for b in range(5):
        t.commit_upsert(_batch(spark, b * 4, b * 4 + 4), str(b))
    v_before = t.current_version()
    t.expire_snapshots(keep_last=2)
    assert not os.path.exists(os.path.join(t.meta_dir, "v0.json"))

    os.remove(os.path.join(t.meta_dir, "version-hint.text"))
    t2 = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    assert t2.current_version() == v_before
    assert t2.read(spark).count() == 20
    # replay guard intact: a replayed batch is still rejected
    assert t2.commit_upsert(_batch(spark, 0, 4), "1") is False
    # corrupt (not just missing) hint recovers the same way
    with open(os.path.join(t.meta_dir, "version-hint.text"), "w") as fh:
        fh.write("garbage")
    t3 = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    assert t3.current_version() == v_before


def test_inline_maintenance_sorted_compaction(spark, tmp_path):
    """maintenance.sort-by through the streaming sink: periodic compaction
    rewrites with the SORT strategy and the replay guard survives."""
    from kafka2iceberg_spark.gen import GenConfig, write_stream_files
    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        parsed_stream,
        start_upsert_sink,
    )
    from kafka2iceberg_spark.schema import transcript_task

    broker = str(tmp_path / "broker")
    write_stream_files(
        GenConfig(n_convs=8, turns_per_conv=8, mega_convs=0, mega_turns=0,
                  ooo_fraction=0, late_fraction=0, dup_fraction=0,
                  delete_fraction=0),
        broker, files=4,
    )
    spec = transcript_task()
    table = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
    q = start_upsert_sink(
        parsed_stream(
            file_broker_stream(spark, broker, max_files_per_trigger=1), spec
        ),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
        maintenance_every=2,
        compact_sort_by=["turn_idx"],
        compact_target_files=2,
    )
    q.awaitTermination()
    assert table.read(spark).count() == 64
    files = [
        f
        for fs in table.resolve_manifests(table.current_snapshot()).values()
        for f in fs
    ]
    assert all("stats" in f for f in files)
    # replay the whole broker on a fresh checkpoint: still 64 rows
    q2 = start_upsert_sink(
        parsed_stream(file_broker_stream(spark, broker, 10), spec),
        table,
        str(tmp_path / "ck2"),
        trigger={"availableNow": True},
    )
    q2.awaitTermination()
    assert table.read(spark).count() == 64
