"""Incremental snapshot reads + observed streaming metrics."""

from __future__ import annotations

import datetime
import time

from kafka2iceberg_spark.sink import IcebergLite

BASE = datetime.datetime(2024, 9, 1, 12, 0, 0)


def _batch(spark, lo, hi):
    rows = [
        (f"c{i % 2}", i, f"t{i}", BASE + datetime.timedelta(minutes=i),
         i, 0, False)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "offset long, partition_idx int, is_cdc_delete boolean",
    )


def test_incremental_append_scan(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    t.commit_append(_batch(spark, 0, 5), "0")
    v1 = t.current_version()
    t.commit_append(_batch(spark, 5, 12), "1")
    v2 = t.current_version()

    inc = t.read_appends_between(spark, v1, v2)
    got = sorted(r["turn_idx"] for r in inc.collect())
    assert got == list(range(5, 12))
    assert t.read_appends_between(spark, v2, v2) is None


def test_observed_ingest_metrics(spark, tmp_path):
    from kafka2iceberg_spark.gen import GenConfig, write_stream_files
    from kafka2iceberg_spark.metrics import ThroughputListener
    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        parsed_stream,
        start_append_sink,
    )
    from kafka2iceberg_spark.schema import transcript_task

    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        write_stream_files(
            GenConfig(n_convs=5, turns_per_conv=6, mega_convs=0, mega_turns=0,
                      ooo_fraction=0, late_fraction=0, dup_fraction=0,
                      delete_fraction=0),
            str(tmp_path / "broker"),
            files=2,
        )
        spec = transcript_task()
        table = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
        raw = file_broker_stream(spark, str(tmp_path / "broker"), 10)
        q = start_append_sink(
            parsed_stream(raw, spec, observe=True),
            table,
            str(tmp_path / "ck"),
            trigger={"availableNow": True},
        )
        q.awaitTermination()
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            obs = [
                r["observed"].get("ingest")
                for r in listener.records
                if r["event"] == "progress" and r.get("observed")
            ]
            if obs:
                break
            time.sleep(0.5)
        assert obs, "no observed metrics captured"
        assert sum(o["rows"] for o in obs if o) == 30
    finally:
        spark.streams.removeListener(listener)
