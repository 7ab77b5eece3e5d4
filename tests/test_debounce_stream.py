"""Streaming kept-anchor debounce: stream == batch parity, anchor
persistence across micro-batches, exactly-once finalization."""

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

from kafka2iceberg_spark import timeseries as ts

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)

GAP_US = 120_000_000  # 2 minutes


def _rows():
    # user 7 "a": burst at 0s,30s,130s,150s,260s -> kept {0,130,260}
    # user 7 "b": single event -> kept
    # user 8 "a": 0s, 500s -> both kept
    base = "2024-01-01 00:"
    return [
        (0, base + "00:00", 7, "a"),
        (1, base + "00:30", 7, "a"),
        (2, base + "02:10", 7, "a"),
        (3, base + "02:30", 7, "a"),
        (4, base + "04:20", 7, "a"),
        (5, base + "00:10", 7, "b"),
        (6, base + "00:05", 8, "a"),
        (7, base + "08:25", 8, "a"),
    ]


def _write_files(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.json")
        with open(p, "w") as fh:
            for eid, t, u, ty in chunk:
                fh.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": t,
                            "user_id": u,
                            "event_type": ty,
                        }
                    )
                    + "\n"
                )
        os.utime(p, (1000 + i, 1000 + i))


def test_debounce_stream_matches_batch(spark, tmp_path):
    rows = _rows()
    # chunks split by event TIME (the late-beyond-watermark policy drops
    # cross-chunk stragglers by design) + a far-future flush sentinel
    sentinel = [(999, "2030-01-01 00:00:00", 999, "zz")]
    early = [r for r in rows if r[1] <= "2024-01-01 00:02:30"]
    late = [r for r in rows if r[1] > "2024-01-01 00:02:30"]
    chunks = [early, late, sentinel]
    src = str(tmp_path / "src")
    _write_files(src, chunks)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = ts.debounce_stream(
        stream,
        ["user_id", "event_type"],
        min_gap_us=GAP_US,
        watermark_delay="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("debounce_out")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (x["user_id"], x["event_type"], x["event_id"]): (
            x["ts_us"],
            x["kept"],
        )
        for x in spark.sql(
            "select * from debounce_out where user_id != 999"
        ).collect()
    }

    batch = spark.createDataFrame(
        [(e, t, u, ty) for e, t, u, ty in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expected = {
        (x["user_id"], x["event_type"], x["event_id"]): (
            x["ts_us"],
            x["kept"],
        )
        for x in ts.debounce(
            batch, ["user_id", "event_type"], min_gap_us=GAP_US
        ).collect()
    }
    assert got == expected
    # sanity: the anchor rule produced the hand-computed keeps for 7/a
    kept_7a = sorted(
        eid
        for (u, t, eid), (_, k) in expected.items()
        if (u, t) == (7, "a") and k
    )
    assert kept_7a == [0, 2, 4]


def test_debounce_stream_exactly_once_across_triggers(spark, tmp_path):
    # the same event must be finalized exactly once even though it sits
    # in state across several triggers before the watermark passes it
    rows = [(0, "2024-01-01 00:00:00", 1, "a")]
    later = [(1, "2024-01-01 01:00:00", 1, "a")]
    sentinel = [(99, "2030-01-01 00:00:00", 9, "z")]
    src = str(tmp_path / "src2")
    _write_files(src, [rows, later, sentinel])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = ts.debounce_stream(
        stream, ["user_id", "event_type"], min_gap_us=GAP_US,
        watermark_delay="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("debounce_once")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "select event_id, count(*) c from debounce_once "
        "where user_id = 1 group by event_id"
    ).collect()
    assert {x["event_id"]: x["c"] for x in got} == {0: 1, 1: 1}
