"""Streaming windowFunnel: stream == batch parity, at-most-once level
emission, anchor persistence across micro-batches."""

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

STEPS = ["view", "click", "purchase"]
WINDOW_US = 3600 * 1_000_000  # 1 hour


def _rows():
    base = "2024-01-01 "
    return [
        # user 1: full funnel inside the window
        (0, base + "00:00:00", 1, "view"),
        (1, base + "00:10:00", 1, "click"),
        (2, base + "00:20:00", 1, "purchase"),
        # user 2: click outside the window -> depth 1
        (3, base + "00:00:00", 2, "view"),
        (4, base + "02:00:00", 2, "click"),
        # user 3: purchase with no prior view -> depth 0 (no emission)
        (5, base + "00:00:00", 3, "purchase"),
        # user 4: later view restarts the clock, then completes
        (6, base + "00:00:00", 4, "view"),
        (7, base + "00:50:00", 4, "view"),
        (8, base + "00:55:00", 4, "click"),
        (9, base + "01:10:00", 4, "purchase"),
    ]


def _write_files(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.json")
        with open(p, "w") as fh:
            for eid, t, u, ty in chunk:
                fh.write(
                    json.dumps(
                        {"event_id": eid, "ts": t, "user_id": u, "event_type": ty}
                    )
                    + "\n"
                )
        os.utime(p, (1000 + i, 1000 + i))


def _run(spark, tmp_path, chunks, name):
    src = str(tmp_path / f"src_{name}")
    _write_files(src, chunks)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = ts.window_funnel_stream(
        stream, STEPS, WINDOW_US, watermark_delay="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName(f"funnel_{name}")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from funnel_{name} where user_id < 900").collect()


def test_funnel_stream_matches_batch(spark, tmp_path):
    rows = _rows()
    # time-ordered chunks + far-future sentinel to flush state
    early = [r for r in rows if r[1] <= "2024-01-01 00:20:00"]
    late = [r for r in rows if r[1] > "2024-01-01 00:20:00"]
    sentinel = [(99, "2030-01-01 00:00:00", 999, "view")]
    got = _run(spark, tmp_path, [early, late, sentinel], "parity")
    stream_depth = {}
    for r in got:
        stream_depth[r["user_id"]] = max(
            stream_depth.get(r["user_id"], 0), r["depth"]
        )

    batch = spark.createDataFrame(
        _rows(), "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expected = {
        r["user_id"]: r["funnel_depth"]
        for r in ts.window_funnel(batch, STEPS, WINDOW_US).collect()
        if r["funnel_depth"] > 0
    }
    assert stream_depth == expected
    assert expected == {1: 3, 2: 1, 4: 3}


def test_funnel_stream_levels_emitted_once_increasing(spark, tmp_path):
    rows = _rows()
    sentinel = [(99, "2030-01-01 00:00:00", 999, "view")]
    got = _run(spark, tmp_path, [rows, sentinel], "once")
    seen = {}
    for r in got:
        seen.setdefault(r["user_id"], []).append((r["at_us"], r["depth"]))
    for _u, levels in seen.items():
        ds = [d for _, d in sorted(levels)]
        assert ds == sorted(set(ds))  # strictly increasing, no repeats
        assert ds[0] == 1
