"""X3 runtime metrics: the StreamingQueryListener captures per-batch
throughput/watermark/state rows for the ingest pipeline."""

from __future__ import annotations

import json
import time

from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.metrics import ThroughputListener
from kafka2iceberg_spark.pipeline import run_ingest_once
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite


def test_listener_captures_progress(spark, tmp_path):
    mpath = str(tmp_path / "metrics.jsonl")
    listener = ThroughputListener(path=mpath)
    spark.streams.addListener(listener)
    try:
        write_stream_files(
            GenConfig(n_convs=6, turns_per_conv=8), str(tmp_path / "broker"), files=2
        )
        spec = transcript_task()
        table = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
        run_ingest_once(
            spark, str(tmp_path / "broker"), spec, table, str(tmp_path / "ck")
        )
        # listener callbacks arrive asynchronously after termination
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if any(r["event"] == "terminated" for r in listener.records):
                break
            time.sleep(0.5)
        prog = [r for r in listener.records if r["event"] == "progress"]
        assert prog, "no progress events captured"
        assert sum(r["input_rows"] for r in prog) > 0
        tp = listener.throughput()
        assert tp["rows"] > 0 and tp["rows_per_sec"] > 0
        with open(mpath) as fh:
            lines = [json.loads(line) for line in fh]
        assert any(r["event"] == "progress" for r in lines)
    finally:
        spark.streams.removeListener(listener)
