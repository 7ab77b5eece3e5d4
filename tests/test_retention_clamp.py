"""Poison-robust retention cutoff (pipeline.robust_event_max) and the
empty-table maintenance no-op.

A retention cutoff anchored on a batch's raw max event time is one bad
producer clock away from dropping most of a table: a single far-future
timestamp advances the cutoff by however wrong the clock is. The anchor
is therefore min(max, p99 + clamp) — deterministic over batch content
(replay-safe), immune to <1% poisoned rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka2iceberg_spark.pipeline import robust_event_max

HOUR_US = 3_600_000_000


def _ts_df(spark, micros):
    rows = [
        (dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=int(u)),)
        for u in micros
    ]
    return spark.createDataFrame(rows, "ts timestamp")


def test_clean_batch_anchor_is_raw_max(spark):
    # 200 rows one minute apart: p99 + 1h clamp comfortably covers max.
    base = 1_000_000_000_000
    us = [base + i * 60_000_000 for i in range(200)]
    df = _ts_df(spark, us)
    assert robust_event_max(df, "ts", HOUR_US) == max(us)


def test_poisoned_clock_cannot_advance_anchor(spark):
    # one year-3000-ish row in 200: anchor stays within p99 + 1h of the
    # bulk instead of jumping 30+ years forward.
    base = 1_000_000_000_000
    us = [base + i * 60_000_000 for i in range(199)]
    poison = base + 10_000 * 24 * HOUR_US  # ~27 years in the future
    df = _ts_df(spark, us + [poison])
    anchor = robust_event_max(df, "ts", HOUR_US)
    assert anchor <= max(us) + HOUR_US  # bounded by the sane bulk
    assert anchor < poison - 365 * 24 * HOUR_US  # nowhere near the poison


def test_clamp_none_restores_raw_max(spark):
    base = 1_000_000_000_000
    us = [base, base + 10_000 * 24 * HOUR_US]
    df = _ts_df(spark, us)
    assert robust_event_max(df, "ts", None) == max(us)


def test_empty_batch_returns_none(spark):
    df = _ts_df(spark, []).where(F.lit(False))
    assert robust_event_max(df, "ts", HOUR_US) is None


def test_poisoned_row_does_not_age_out_table(spark, tmp_path):
    """End-to-end: a single bad-clock row flows through the upsert sink
    with retention enabled; the sane rows all survive the TTL tick
    (pre-clamp, the poisoned anchor would have aged out every sane row)."""
    from kafka2iceberg_spark.sink import IcebergLite

    base = dt.datetime(2024, 1, 1)
    sane = [
        (i, base + dt.timedelta(minutes=i), f"t{i}") for i in range(100)
    ]
    poison = [(999, base + dt.timedelta(days=10_000), "poison")]
    df = spark.createDataFrame(
        sane + poison, "pk long, ts timestamp, text string"
    )
    table = IcebergLite(str(tmp_path / "tbl"), pk=["pk"])
    table.commit_upsert(df, "0")
    mx = robust_event_max(df, "ts", HOUR_US)
    cutoff = mx - 6 * HOUR_US
    from kafka2iceberg_spark.pipeline import _us_to_ts

    table.delete_range(spark, "ts", hi=_us_to_ts(cutoff), batch_id="ret:0")
    left = table.read(spark).count()
    # all 100 sane rows (span 99 min << 6h below the clamped anchor)
    # survive; only nothing or the poison itself could age out.
    assert left >= 100


def test_maintenance_retention_on_empty_table_is_noop(tmp_path, capsys):
    """maintenance.run + maintenance.retention against a just-created
    table with zero data files records a no-op instead of raising."""
    from kafka2iceberg_spark.__main__ import main
    from kafka2iceberg_spark.sink import IcebergLite

    IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"]).create()
    main(
        [
            "source-database=chat",
            "source-table=transcripts",
            f"table.location={tmp_path}/tbl",
            "maintenance.run=true",
            "maintenance.retention=6 hours",
        ]
    )
    out = capsys.readouterr().out
    assert "maintenance:" in out
