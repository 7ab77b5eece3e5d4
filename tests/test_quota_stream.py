"""Deterministic admission control (windows.quota_admit / quota_stream):
stream == batch parity under out-of-order arrival, bounded state (eager
eviction verdicts), window closure on watermark, and late-row drop."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka2iceberg_spark.windows import quota_admit, quota_stream

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _rows():
    # conv A: 7 turns in hour-window 0 (quota 3 -> 4 rejects), 2 in window 1
    # conv B: exactly at quota
    rows = []
    for i in range(7):
        rows.append(("A", i, f"2024-01-01 00:{5 * i + 1:02d}:00"))
    rows.append(("A", 100, "2024-01-01 01:10:00"))
    rows.append(("A", 101, "2024-01-01 01:20:00"))
    for i in range(3):
        rows.append(("B", i, f"2024-01-01 00:{7 * i + 2:02d}:00"))
    return rows


def _write_files(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.json")
        with open(p, "w") as fh:
            for c, t, ts in chunk:
                fh.write(
                    json.dumps({"conv_id": c, "turn_idx": t, "ts": ts}) + "\n"
                )
        os.utime(p, (1000 + i, 1000 + i))


def _run_stream(spark, tmp_path, chunks, quota=3):
    src = str(tmp_path / "src")
    _write_files(src, chunks)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = quota_stream(
        stream,
        "conv_id",
        "ts",
        "1 hour",
        quota,
        "turn_idx",
        watermark_delay="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("quota_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {
        (r["conv_id"], r["turn_idx"]): (r["ts_us"], r["window_us"], r["admitted"])
        for r in spark.sql("select * from quota_out").collect()
    }


SENTINEL = [("ZZ", 0, "2030-01-01 00:00:00")]


def _batch(spark, rows, quota=3):
    df = spark.createDataFrame(
        [(c, t, ts) for c, t, ts in rows], "conv_id string, turn_idx long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return {
        (r["conv_id"], r["turn_idx"]): (r["ts_us"], r["window_us"], r["admitted"])
        for r in quota_admit(
            df, "conv_id", "ts", "1 hour", quota, "turn_idx"
        ).collect()
    }


def test_stream_matches_batch_in_order(spark, tmp_path):
    rows = _rows()
    got = _run_stream(spark, tmp_path, [rows, SENTINEL])
    want = _batch(spark, rows)
    assert got == want  # sentinel's own window never closes in-stream
    # sanity on the semantics themselves: first 3 turns of A admitted
    assert [got[("A", i)][2] for i in range(7)] == [True] * 3 + [False] * 4


def test_out_of_order_arrival_same_verdicts(spark, tmp_path):
    """Rows arrive shuffled across micro-batches (newest first within the
    watermark): event-time admission, not arrival-order admission — a
    smaller-ts straggler evicts a provisionally-buffered row."""
    rows = _rows()
    # reverse event order within each conv, interleave convs
    shuffled = sorted(rows, key=lambda r: (-int(r[1]), r[0]))
    got = _run_stream(spark, tmp_path, [shuffled, SENTINEL])
    want = _batch(spark, rows)
    assert got == want


def test_rejections_are_eager_state_bounded(spark, tmp_path):
    """Over-quota verdicts are emitted before the window closes: feed only
    in-window rows (no sentinel yet) and the 4 rejects are already out
    while the 3 admitted rows are still buffered."""
    rows = [r for r in _rows() if r[0] == "A"][:7]
    src = str(tmp_path / "src")
    _write_files(src, [rows[:4], rows[4:]])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = quota_stream(
        stream, "conv_id", "ts", "1 hour", 3, "turn_idx", watermark_delay="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("quota_eager")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    res = spark.sql("select * from quota_eager").collect()
    assert {r["turn_idx"] for r in res} == {3, 4, 5, 6}
    assert all(not r["admitted"] for r in res)


def test_late_beyond_watermark_dropped(spark, tmp_path):
    """A row older than the watermark when it arrives gets no verdict —
    the shared late policy (its window already closed and was emitted)."""
    rows = [r for r in _rows() if r[0] == "B"]
    late = [("B", 50, "2024-01-01 00:30:00")]  # arrives after sentinel
    got = _run_stream(spark, tmp_path, [rows, SENTINEL, late])
    assert ("B", 50) not in got
    want = _batch(spark, rows)
    assert got == want
