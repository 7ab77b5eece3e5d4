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


def test_poisoned_clock_mid_stream_does_not_age_out_live_data(
    spark, tmp_path
):
    """End-to-end through start_upsert_sink: a far-future bad-clock row
    arrives MID-STREAM (inside an otherwise-sane broker file) with the
    event-time TTL enabled; every maintenance tick anchors its cutoff on
    the poison-clamped robust_event_max, so the survivor set of sane
    rows is identical to an unpoisoned twin run. Pre-clamp, the poisoned
    batch's raw-max anchor (year 2052 − 365d retention) would have aged
    out every sane 2024 row at that tick."""
    import json as _json
    import os as _os

    from kafka2iceberg_spark.gen import GenConfig, write_stream_files
    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        parsed_stream,
        start_upsert_sink,
    )
    from kafka2iceberg_spark.schema import transcript_task
    from kafka2iceberg_spark.sink import IcebergLite

    # 480 sane rows over 6 files -> ~160 sane rows in the poisoned
    # micro-batch (2 files/trigger): 1 poisoned row is ~0.6% of the
    # batch, inside the clamp's <1% contract (at 33 rows/batch the
    # poison IS the p99 interpolation endpoint and the clamp cannot
    # help — that regime is the DLQ's job, not retention's)
    cfg = GenConfig(
        n_convs=12, turns_per_conv=40, mega_convs=0, mega_turns=0,
        ooo_fraction=0, late_fraction=0, dup_fraction=0,
        delete_fraction=0,
    )

    def _broker(name: str, poisoned: bool) -> str:
        d = str(tmp_path / name)
        paths = write_stream_files(cfg, d, files=6)
        if poisoned:
            # one bad-clock INSERT appended inside file 3 — it shares a
            # micro-batch with sane rows (a lone poisoned row in its own
            # batch is that batch's p99 by definition; the clamp guards
            # the <1%-poisoned case, per the robust_event_max contract)
            env = {
                "data": [{
                    "conv_id": "poison", "turn_idx": "0", "role": "user",
                    "text": "bad clock", "tool": "null",
                    "ts": "2052-01-01 00:00:00",
                }],
                "database": "chat", "table": "transcripts",
                "type": "INSERT", "isDdl": False,
                "ts": 2587680000000, "es": 2587680000000, "old": None,
                "pkNames": ["conv_id", "turn_idx"], "sql": "",
                "_offset": 10_000_000, "_partition": 0,
            }
            with open(paths[3], "a") as fh:
                fh.write(_json.dumps(env, separators=(",", ":")) + "\n")
        for i, p in enumerate(paths):
            _os.utime(p, (1_000_000 + i, 1_000_000 + i))
        return d

    spec = transcript_task()

    def run(tag: str, poisoned: bool) -> set:
        broker = _broker(f"broker-{tag}", poisoned)
        t = IcebergLite(str(tmp_path / f"tbl-{tag}"), pk=spec.primary_keys)
        q = start_upsert_sink(
            parsed_stream(file_broker_stream(spark, broker, 2), spec),
            t,
            str(tmp_path / f"ck-{tag}"),
            trigger={"availableNow": True},
            maintenance_every=1,  # retention tick on EVERY micro-batch
            retention_us=365 * 24 * 3_600_000_000,
        )
        q.awaitTermination()
        return {
            (r.conv_id, r.turn_idx)
            for r in t.read(spark).collect()
            if r.conv_id != "poison"
        }

    survivors_twin = run("twin", poisoned=False)
    survivors_poisoned = run("poisoned", poisoned=True)
    assert len(survivors_twin) == 12 * 40  # nothing sane aged out at all
    assert survivors_poisoned == survivors_twin


def test_pre_epoch_timestamps_integer_exact(spark):
    """Negative epoch-microseconds (pre-1970 event times) through the
    two-phase order-statistic selection: `div` truncates toward zero,
    which is still monotone for a positive divisor, so bucket 0 spans
    ±1s and the selection stays exact."""
    us = [-5_000_000, -1, 0, 1, 999_999, 40 * HOUR_US]
    df = _ts_df(spark, us)
    s = sorted(us)
    k, r = divmod(99 * (len(s) - 1), 100)
    lo, hi = s[k], s[min(k + 1, len(s) - 1)]
    expect = min(max(us), lo + (hi - lo) * r // 100 + HOUR_US)
    assert robust_event_max(df, "ts", HOUR_US) == expect
    assert robust_event_max(df, "ts", HOUR_US, narrow_above=0) == expect
    assert robust_event_max(df, "ts", None) == max(us)


def test_rank_straddles_day_boundary(spark):
    """The two order statistics land in DIFFERENT day buckets (and
    different second buckets): the narrowing carries the rank offset
    across two candidate buckets per phase. Asserted on BOTH paths —
    narrow_above=0 forces the hierarchical day->second narrowing that
    production only takes above 2M rows, and the default short-circuit
    must agree."""
    day = 86_400_000_000
    # n=200 -> k=197: s[197], s[198] are 1µs either side of a day edge
    us = list(range(1_000_000, 1_000_000 + 197)) + [
        10 * day - 1, 10 * day, 10 * day + 1,
    ]
    df = _ts_df(spark, us)
    s = sorted(us)
    k, r = divmod(99 * (len(s) - 1), 100)
    lo, hi = s[k], s[k + 1]
    assert (lo // day, hi // day) == (9, 10)  # genuinely straddles
    expect = min(max(us), lo + (hi - lo) * r // 100 + HOUR_US)
    assert robust_event_max(df, "ts", HOUR_US, narrow_above=0) == expect
    assert robust_event_max(df, "ts", HOUR_US) == expect


def test_heavy_duplicates_at_rank(spark):
    """Duplicate event times around the p99 rank: per-value counts, not
    distinct values, drive the cumulative rank (both selection paths)."""
    us = [5_000_000] * 150 + [6_000_000] * 49 + [7_000_000]
    df = _ts_df(spark, us)
    s = sorted(us)
    k, r = divmod(99 * (len(s) - 1), 100)
    expect = min(
        max(us), s[k] + (s[k + 1] - s[k]) * r // 100 + HOUR_US
    )
    assert robust_event_max(df, "ts", HOUR_US, narrow_above=0) == expect
    assert robust_event_max(df, "ts", HOUR_US) == expect
