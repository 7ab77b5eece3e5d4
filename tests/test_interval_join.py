"""Streaming interval join (windows.interval_join_stream): Spark's native
stream-stream join with a time-range condition is the Flink IntervalJoin
analogue — state bounded by watermark + range, matches emitted eagerly,
and the output matches the batch banded range join on the same input."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka2iceberg_spark.windows import interval_join_stream, range_join_within

B = datetime.datetime(2024, 9, 1, 0, 0, 0)
SCHEMA = "event_id long, user_id long, ts timestamp"


def _events(spark):
    rows = []
    eid = 0
    for u in range(6):
        for i in range(12):
            rows.append((eid, u, B + datetime.timedelta(minutes=7 * i + u)))
            eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def _split(df):
    left = df.where(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    right = df.where(F.col("event_id") % 3 != 0).select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    return left, right


def test_stream_interval_join_matches_batch_band_join(spark, tmp_path):
    ev = _events(spark)
    left_b, right_b = _split(ev)
    expected = sorted(
        (r.click_id, r.view_id, r.user_id)
        for r in range_join_within(
            left_b, right_b, on=["user_id"], interval_sec=1200
        ).collect()
    )
    assert expected  # non-trivial input

    ev.write.parquet(str(tmp_path / "events"))
    src = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "events"))
    left_s, right_s = _split(src)
    out = interval_join_stream(
        left_s, right_s, on=["user_id"], interval_sec=1200
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.click_id, r.view_id, r.user_id)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == expected


def test_stream_interval_join_excludes_out_of_range(spark, tmp_path):
    """Rows outside (ts, ts+interval] and cross-key rows never pair."""
    rows = [
        (1, 0, B),                                        # left
        (2, 0, B + datetime.timedelta(seconds=100)),      # in range
        (3, 0, B + datetime.timedelta(seconds=1200)),     # exactly at edge
        (4, 0, B + datetime.timedelta(seconds=1201)),     # out
        (5, 1, B + datetime.timedelta(seconds=50)),       # other key
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    df.write.parquet(str(tmp_path / "ev"))
    src = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "ev"))
    left = src.where(F.col("event_id") == 1).select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    right = src.where(F.col("event_id") > 1).select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    out = interval_join_stream(left, right, on=["user_id"], interval_sec=1200)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r.view_id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [2, 3]
