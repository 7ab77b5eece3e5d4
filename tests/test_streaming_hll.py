"""StreamingHLL: register-table maintenance across micro-batches equals the
batch sketch over the union; replay cannot move registers; state stays 2^p."""

import os
import time

import pytest
from pyspark.sql import functions as F

from kafka2iceberg_spark import sketches as sk
from kafka2iceberg_spark.sink import IcebergLite


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _stamp_wave(df, src_dir, tag, mtime):
    """Write one micro-batch worth of files with a pinned mtime (the file
    source orders batches by mtime; distinct stamps pin batch order)."""
    part = os.path.join(src_dir, f"wave-{tag}")
    df.coalesce(1).write.parquet(part)
    for root, _, files in os.walk(part):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def _write_wave(spark, src_dir, lo, hi, mtime):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id")
    )
    _stamp_wave(df, src_dir, f"{lo}-{hi}", mtime)


def test_streaming_hll_equals_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    _write_wave(spark, src, 0, 4000, t0)
    _write_wave(spark, src, 3000, 9000, t0 + 1)  # overlapping ids

    table = IcebergLite(
        str(tmp_path / "hll"), pk=["register"], partition_field=None
    )
    shll = sk.StreamingHLL(table)
    stream = (
        spark.readStream.schema("conv_id string")
        .option("maxFilesPerTrigger", "1")  # force >= 2 micro-batches
        .parquet(src + "/*")
    )
    q = shll.start(stream, F.col("conv_id"), str(tmp_path / "ck"))
    q.awaitTermination()

    # incremental register table == one-shot batch sketch over everything
    batch_all = spark.read.parquet(src + "/*")
    want = sk.hll_registers(batch_all, F.col("conv_id")).collect()
    got = table.read(spark).select("register", "max_rank").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    est = shll.estimate(spark).collect()[0]
    assert abs(est.estimate - 9000) / 9000 < 0.08
    # bounded state: never more rows than registers
    assert table.read(spark).count() <= 4096

    # replay with a fresh checkpoint: max-merge + batch-id guard -> no drift
    q = shll.start(stream, F.col("conv_id"), str(tmp_path / "ck2"))
    q.awaitTermination()
    again = table.read(spark).select("register", "max_rank").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, want))


def test_streaming_hll_validates_pk(tmp_path):
    bad = IcebergLite(str(tmp_path / "b"), pk=["conv_id"])
    with pytest.raises(ValueError):
        sk.StreamingHLL(bad)


def _token_wave(spark, src_dir, tokens, mtime, tag):
    df = spark.createDataFrame([(t,) for t in tokens], ["token"])
    _stamp_wave(df, src_dir, tag, mtime)


def test_streaming_topk_guarantees_and_bounded_state(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    # skewed stream over 3 waves: "HOT" dominates, mid-weight tokens, and a
    # long tail that must churn through the summary without growing it
    _token_wave(spark, src, ["HOT"] * 60 + [f"tail{i}" for i in range(30)], t0, "a")
    _token_wave(spark, src, ["HOT"] * 40 + ["warm"] * 25 + [f"tail{i}" for i in range(30, 60)], t0 + 1, "b")
    _token_wave(spark, src, ["warm"] * 15 + [f"tail{i}" for i in range(60, 90)], t0 + 2, "c")

    table = IcebergLite(str(tmp_path / "topk"), pk=["token"], partition_field=None)
    stk = sk.StreamingTopK(table, k=10)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", "1")  # one wave per micro-batch
        .parquet(src + "/*")
    )
    q = stk.start(stream, F.col("token"), str(tmp_path / "ck"))
    q.awaitTermination()

    got = {r.token: (r.est_count, r.err) for r in stk.estimate(spark).collect()}
    assert len(got) <= 10  # bounded state, forever
    truth = {"HOT": 100, "warm": 40}
    for tok, true_n in truth.items():
        est, err = got[tok]  # heavy hitters guaranteed present
        assert est >= true_n, (tok, est, true_n)          # never under
        assert est - err <= true_n, (tok, est, err, true_n)  # bounded over
    # every counter obeys the bounds vs its own true count (tail = 1 each)
    for tok, (est, err) in got.items():
        true_n = truth.get(tok, 1)
        assert est >= true_n and est - err <= true_n, (tok, est, err)

    # replay with a fresh checkpoint: batch-id guard -> identical summary
    q = stk.start(stream, F.col("token"), str(tmp_path / "ck2"))
    q.awaitTermination()
    again = {r.token: (r.est_count, r.err) for r in stk.estimate(spark).collect()}
    assert again == got


def test_streaming_topk_validates_pk(tmp_path):
    bad = IcebergLite(str(tmp_path / "b2"), pk=["conv_id"])
    with pytest.raises(ValueError):
        sk.StreamingTopK(bad)


def _value_wave(spark, src_dir, rows, mtime, tag):
    df = spark.createDataFrame(rows, ["key", "cents"])
    _stamp_wave(df, src_dir, tag, mtime)


def test_streaming_zscore_moments_equal_batch_and_flags(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    wave1 = [("a", 100 + i) for i in range(50)] + [("b", 10)] * 20
    wave2 = [("a", 150 + i) for i in range(50)] + [("b", 12)] * 20
    _value_wave(spark, src, wave1, t0, "w1")
    _value_wave(spark, src, wave2, t0 + 1, "w2")

    table = IcebergLite(str(tmp_path / "zs"), pk=["key"], partition_field=None)
    zs = sk.StreamingZScore(table)
    stream = (
        spark.readStream.schema("key string, cents long")
        .option("maxFilesPerTrigger", "1")  # one wave per micro-batch
        .parquet(src + "/*")
    )
    q = zs.start(stream, F.col("key"), F.col("cents"), str(tmp_path / "ck"))
    q.awaitTermination()

    # maintained moment table == one-shot batch moments over everything
    batch_all = spark.read.parquet(src + "/*")
    want = {
        (r["key"]): (r["n"], r["s1"], r["s2"])
        for r in batch_all.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s1"),
            F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        )
        .collect()
    }
    got = {r["key"]: (r["n"], r["s1"], r["s2"]) for r in zs.moments(spark).collect()}
    assert got == want

    # scoring vs the committed baseline: obvious outlier flags, normal doesn't
    probe = spark.createDataFrame(
        [("a", 9_000), ("a", 140), ("b", 11), ("unseen", 5)],
        ["key", "cents"],
    )
    flags = {
        (r["key"], r["v"]): r["is_anomaly"]
        for r in zs.score(spark, probe, F.col("key"), F.col("cents")).collect()
    }
    assert flags[("a", 9_000)] is True
    assert flags[("a", 140)] is False
    assert flags[("b", 11)] is False
    assert flags[("unseen", 5)] is False  # no baseline -> never flags

    # replay with a fresh checkpoint: batch-id guard -> moments unchanged
    q = zs.start(stream, F.col("key"), F.col("cents"), str(tmp_path / "ck2"))
    q.awaitTermination()
    assert {
        r["key"]: (r["n"], r["s1"], r["s2"]) for r in zs.moments(spark).collect()
    } == want


def test_streaming_zscore_validates_pk_and_threshold(tmp_path):
    bad = IcebergLite(str(tmp_path / "zb"), pk=["conv_id"])
    with pytest.raises(ValueError):
        sk.StreamingZScore(bad)
    good = IcebergLite(str(tmp_path / "zg"), pk=["key"])
    with pytest.raises(ValueError):
        sk.StreamingZScore(good, z_ppm=0)


def test_streaming_drift_scores_each_batch_against_baseline(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    w1 = [("k", v) for v in [10, 11, 12, 13, 14] * 4]
    w2 = list(w1)                        # identical distribution -> d = 0
    w3 = [("k", v) for v in [500, 501, 502] * 5]  # disjoint -> d = 1
    _value_wave(spark, src, w1, t0, "w1")
    _value_wave(spark, src, w2, t0 + 1, "w2")
    _value_wave(spark, src, w3, t0 + 2, "w3")

    hist = IcebergLite(str(tmp_path / "h"), pk=["bucket"], partition_field=None)
    dlog = IcebergLite(str(tmp_path / "d"), pk=["batch_id"], partition_field=None)
    sd = sk.StreamingDrift(hist, dlog, bucket_width=1)
    stream = (
        spark.readStream.schema("key string, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = sd.start(stream, F.col("cents"), str(tmp_path / "ck"))
    q.awaitTermination()

    log = {r["batch_id"]: (r["n_base"], r["n_batch"], r["d"])
           for r in sd.drift_log(spark).collect()}
    assert log["0"] == (0, 20, None)       # no baseline yet
    assert log["1"] == (20, 20, 0.0)       # same distribution
    assert log["2"] == (40, 15, 1.0)       # disjoint support vs w1+w2
    # baseline histogram = exact value counts of all three waves
    got = {r["bucket"]: r["n"] for r in hist.read(spark).collect()}
    assert got[10] == 8 and got[500] == 5 and len(got) == 8

    # fresh-checkpoint replay: both tables replay-guarded, nothing moves
    q = sd.start(stream, F.col("cents"), str(tmp_path / "ck2"))
    q.awaitTermination()
    assert {r["batch_id"]: (r["n_base"], r["n_batch"], r["d"])
            for r in sd.drift_log(spark).collect()} == log
    assert {r["bucket"]: r["n"] for r in hist.read(spark).collect()} == got


def test_streaming_drift_validates_shape(tmp_path):
    h = IcebergLite(str(tmp_path / "h2"), pk=["bucket"])
    d = IcebergLite(str(tmp_path / "d2"), pk=["batch_id"])
    with pytest.raises(ValueError):
        sk.StreamingDrift(IcebergLite(str(tmp_path / "x"), pk=["k"]), d)
    with pytest.raises(ValueError):
        sk.StreamingDrift(h, IcebergLite(str(tmp_path / "y"), pk=["k"]))
    with pytest.raises(ValueError):
        sk.StreamingDrift(h, d, bucket_width=0)


def test_streaming_ohlc_matches_batch_under_out_of_order_waves(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    base_us = 1_700_000_000_000_000
    # wave 1 carries the LATER half of each bucket; wave 2 the earlier —
    # open/close must still land as a batch recompute would place them
    def rows(us_vals):
        import datetime as dt
        return [
            ("k", dt.datetime.utcfromtimestamp(u / 1e6), i + off, v)
            for i, (u, off, v) in enumerate(us_vals)
        ]
    w1 = rows([(base_us + 30_000_000, 100, 500), (base_us + 50_000_000, 200, 900)])
    w2 = rows([(base_us + 1_000_000, 300, 300), (base_us + 10_000_000, 400, 100)])
    for i, w in enumerate((w1, w2)):
        df = spark.createDataFrame(
            w, "key string, ts timestamp, event_id long, cents long"
        )
        _stamp_wave(df, src, f"w{i}", t0 + i)

    table = IcebergLite(
        str(tmp_path / "ohlc"), pk=["key", "bucket_us"], partition_field=None
    )
    so = sk.StreamingOHLC(table, step_us=60_000_000)
    stream = (
        spark.readStream.schema("key string, ts timestamp, event_id long, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = so.start(
        stream, F.col("key"), F.col("ts"), F.col("event_id"),
        F.col("cents"), str(tmp_path / "ck"),
    )
    q.awaitTermination()

    got = {
        (r["key"], r["bucket_us"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n"],
        )
        for r in so.bars(spark).collect()
    }
    # batch recompute over the union
    from kafka2iceberg_spark import timeseries as ts_mod

    batch_all = spark.read.parquet(src + "/*")
    want = {
        (r["key"], r["bucket_us"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n"],
        )
        for r in ts_mod.ohlc(
            batch_all, "ts", "event_id", ["key"], "cents", 60_000_000
        ).collect()
    }
    assert got == want
    # base_us is NOT bucket-aligned (base % 60s = 20s), so the +50s event
    # spills into the next bar: first bar merges wave-2's earlier events
    # under wave-1's +30s close; second bar is the lone +50s event
    b0 = base_us - base_us % 60_000_000
    assert got[("k", b0)] == (300, 500, 100, 500, 3)
    assert got[("k", b0 + 60_000_000)] == (900, 900, 900, 900, 1)

    # fresh-checkpoint replay: upserts replay-guarded, candles unchanged
    q = so.start(
        stream, F.col("key"), F.col("ts"), F.col("event_id"),
        F.col("cents"), str(tmp_path / "ck2"),
    )
    q.awaitTermination()
    assert {
        (r["key"], r["bucket_us"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n"],
        )
        for r in so.bars(spark).collect()
    } == got


def test_streaming_ohlc_validates_shape(tmp_path):
    with pytest.raises(ValueError):
        sk.StreamingOHLC(IcebergLite(str(tmp_path / "a"), pk=["key"]), 60)
    with pytest.raises(ValueError):
        sk.StreamingOHLC(
            IcebergLite(str(tmp_path / "b"), pk=["key", "bucket_us"]), 0
        )
