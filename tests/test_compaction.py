"""Sink small-file compaction + streaming tumbling-window branch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka2iceberg_spark.sink import IcebergLite

BASE = datetime.datetime(2024, 9, 1, 12, 0, 0)


def _batch(spark, lo, hi, day=1):
    rows = [
        (f"c{i % 3}", i, "user", f"t{i}", None,
         BASE.replace(day=day) + datetime.timedelta(minutes=i))
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).withColumn("offset", F.col("turn_idx").cast("long")).withColumn(
        "partition_idx", F.lit(0)
    ).withColumn("is_cdc_delete", F.lit(False))


def test_compaction_preserves_data_and_replay_guard(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    for b, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 30)]):
        t.commit_append(_batch(spark, lo, hi), str(b))

    snap = t.current_snapshot()
    files_before = sum(
        len(v) for v in t.resolve_manifests(snap).values()
    )
    assert files_before >= 3  # one file per batch per partition

    before = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).collect()
    )
    v = t.current_version()
    n = t.compact(spark, min_files_per_partition=2)
    assert n >= 1
    assert t.current_version() == v + 1

    after_snap = t.current_snapshot()
    files_after = sum(
        len(v) for v in t.resolve_manifests(after_snap).values()
    )
    assert files_after < files_before
    assert files_after == len(after_snap["manifests"])  # one file/partition

    after = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).collect()
    )
    assert after == before
    # replay guard intact: old batch ids still recorded post-compaction
    assert {"0", "1", "2"} <= t.committed_batches()
    assert t.commit_append(_batch(spark, 0, 10), "1") is False


def test_streaming_tumbling_branch(spark, tmp_path):
    import json
    import os

    from kafka2iceberg_spark.gen import GenConfig, write_stream_files
    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        parsed_stream,
        start_window_sink,
    )
    from kafka2iceberg_spark.schema import transcript_task

    broker = str(tmp_path / "broker")
    write_stream_files(
        GenConfig(n_convs=6, turns_per_conv=8, mega_convs=0, mega_turns=0,
                  ooo_fraction=0, late_fraction=0,
                  dup_fraction=0, delete_fraction=0),
        broker,
        files=2,
    )
    with open(f"{broker}/zz.jsonl", "w") as fh:
        fh.write(
            json.dumps(
                {
                    "data": [
                        {
                            "conv_id": "zzz",
                            "turn_idx": "0",
                            "role": "user",
                            "text": "s",
                            "tool": "null",
                            "ts": "2030-01-01 00:00:00",
                        }
                    ],
                    "database": "chat",
                    "table": "transcripts",
                    "type": "INSERT",
                    "isDdl": False,
                    "ts": 1893456000000,
                    "es": 1893456000000,
                    "old": None,
                    "pkNames": ["conv_id", "turn_idx"],
                    "sql": "",
                    "_offset": 999999,
                    "_partition": 0,
                }
            )
            + "\n"
        )
    os.utime(f"{broker}/zz.jsonl", (2_000_000, 2_000_000))

    spec = transcript_task()
    table = IcebergLite(str(tmp_path / "wins"), pk=[], partition_field=None)
    q = start_window_sink(
        parsed_stream(file_broker_stream(spark, broker, 10), spec),
        table,
        str(tmp_path / "ck"),
        size="1 hour",
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    rows = table.read(spark).where(F.col("role") != "zzz").collect()
    assert rows
    total = sum(r["n"] for r in rows)
    assert total == 6 * 8  # every non-sentinel turn in exactly one window
    assert all(
        r["window_end_us"] - r["window_start_us"] == 3_600_000_000 for r in rows
    )
