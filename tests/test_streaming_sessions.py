"""Streaming session-window branch (pipeline.start_session_sink): finalized
gap-closed sessions are appended exactly once and match the batch twin.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka2iceberg_spark import windows as win
from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.pipeline import (
    file_broker_stream,
    parsed_stream,
    start_session_sink,
)
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite

# clean stream: no late/ooo/dup/delete so the batch twin is exact
CFG = GenConfig(
    n_convs=8,
    turns_per_conv=10,
    mega_convs=0,
    mega_turns=0,
    ooo_fraction=0.0,
    late_fraction=0.0,
    dup_fraction=0.0,
    delete_fraction=0.0,
)
GAP = "30 minutes"
DELAY = "10 minutes"


def _sentinel_file(path: str) -> None:
    """Far-future row to push the watermark past every real session end."""
    env = {
        "data": [
            {
                "conv_id": "zzz_sentinel",
                "turn_idx": "0",
                "role": "user",
                "text": "sentinel",
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
        "_offset": 10_000_000,
        "_partition": 0,
    }
    with open(path, "w") as fh:
        fh.write(json.dumps(env, separators=(",", ":")) + "\n")


def test_streaming_sessions_match_batch(spark, tmp_path):
    broker = str(tmp_path / "broker")
    write_stream_files(CFG, broker, files=3)
    _sentinel_file(f"{broker}/zz-sentinel.jsonl")

    spec = transcript_task()
    table = IcebergLite(str(tmp_path / "sess_tbl"), pk=[], partition_field=None)
    raw = file_broker_stream(spark, broker, max_files_per_trigger=10)
    parsed = parsed_stream(raw, spec)
    q = start_session_sink(
        parsed,
        table,
        str(tmp_path / "ck"),
        gap=GAP,
        watermark_delay=DELAY,
        trigger={"availableNow": True},
    )
    q.awaitTermination()

    got = {
        (r["conv_id"], r["session_start_us"], r["session_end_us"], r["n_turns"])
        for r in table.read(spark).collect()
    }
    assert all(c != "zzz_sentinel" for c, *_ in got), "open session must not emit"

    # batch twin over the same parsed rows (sans sentinel)
    batch_raw = spark.read.text(broker).select("value")
    batch = parsed_stream(batch_raw, spec).where(
        F.col("conv_id") != "zzz_sentinel"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expect = {
        (r["conv_id"], r["session_start_us"], r["session_end_us"], r["n_turns"])
        for r in win.sessionize(
            batch,
            GAP,
            ["conv_id"],
            [F.count(F.lit(1)).alias("n_turns"), F.max("turn_idx").alias("max_turn")],
        ).collect()
    }
    assert got == expect


def test_streaming_sessions_emit_once_across_restart(spark, tmp_path):
    """Re-running the drained checkpoint appends nothing (batch-id guard)."""
    broker = str(tmp_path / "broker")
    write_stream_files(CFG, broker, files=2)
    _sentinel_file(f"{broker}/zz-sentinel.jsonl")
    spec = transcript_task()
    table = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field=None)

    def run():
        raw = file_broker_stream(spark, broker, max_files_per_trigger=10)
        q = start_session_sink(
            parsed_stream(raw, spec),
            table,
            str(tmp_path / "ck"),
            gap=GAP,
            watermark_delay=DELAY,
            trigger={"availableNow": True},
        )
        q.awaitTermination()

    run()
    n1 = table.read(spark).count()
    v1 = table.current_version()
    run()
    assert table.read(spark).count() == n1
    assert table.current_version() == v1


def test_session_state_recovers_mid_stream(spark, tmp_path):
    """Kill/resume with the SAME checkpoint mid-stream: session state (open
    sessions spanning the restart) recovers from the state store and the
    final emitted sessions equal a single-shot run (north_rule resume)."""
    import shutil

    staged_dir = str(tmp_path / "staged")
    staged = write_stream_files(CFG, staged_dir, files=6)
    sentinel = str(tmp_path / "sentinel.jsonl")
    _sentinel_file(sentinel)

    def feed(dst, names):
        os.makedirs(dst, exist_ok=True)
        for i, p in enumerate(names):
            out = f"{dst}/{os.path.basename(p)}"
            shutil.copy(p, out)
            os.utime(out, (1_000_000 + i, 1_000_000 + i))

    def run(broker, ck, tbl):
        spec = transcript_task()
        table = IcebergLite(tbl, pk=[], partition_field=None)
        raw = file_broker_stream(spark, broker, max_files_per_trigger=2)
        q = start_session_sink(
            parsed_stream(raw, spec), table, ck,
            gap=GAP, watermark_delay=DELAY, trigger={"availableNow": True},
        )
        q.awaitTermination()
        return table

    # reference single-shot
    ref_broker = str(tmp_path / "ref_broker")
    feed(ref_broker, staged + [sentinel])
    ref = run(ref_broker, str(tmp_path / "ref_ck"), str(tmp_path / "ref_tbl"))

    # two-phase with shared checkpoint: crash after half the stream
    broker = str(tmp_path / "broker")
    ck = str(tmp_path / "ck")
    tbl = str(tmp_path / "tbl")
    feed(broker, staged[:3])
    run(broker, ck, tbl)
    feed(broker, staged + [sentinel])
    table = run(broker, ck, tbl)

    key = lambda t: sorted(
        (r["conv_id"], r["session_start_us"], r["session_end_us"], r["n_turns"])
        for r in t.read(spark).where("conv_id <> 'zzz_sentinel'").collect()
    )
    assert key(table) == key(ref)
