"""Sketch invariants: HLL error bound + mergeability, KMV bound, Count-Min
overestimate guarantee. All inputs deterministic."""

import pytest
from pyspark.sql import functions as F

from kafka2iceberg_spark import sketches as sk


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


def _vals(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("v")
    )


def test_hll_error_within_bound(spark):
    # 4096 registers -> stderr ~1.6%; assert within 5 sigma.
    for true_n in (1000, 20000):
        est = sk.hll_estimate(_vals(spark, true_n), F.col("v")).collect()[0]
        assert abs(est.estimate - true_n) / true_n < 0.08, (true_n, est)


def test_hll_small_range_linear_counting(spark):
    # 100 distinct values: E far below 2.5m -> linear-counting branch; with
    # so few hashes collisions are ~impossible, estimate is near-exact.
    est = sk.hll_estimate(_vals(spark, 100), F.col("v")).collect()[0]
    assert est.empty_registers >= 3996
    assert abs(est.estimate - 100) < 3


def test_hll_registers_merge(spark):
    # Sketch(A) merged with Sketch(B) == Sketch(A u B): union + re-max.
    a, b = _vals(spark, 5000), _vals(spark, 8000)  # overlapping prefixes
    ra = sk.hll_registers(a, F.col("v"))
    rb = sk.hll_registers(b, F.col("v"))
    merged = (
        ra.unionByName(rb)
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    direct = sk.hll_registers(a.unionByName(b), F.col("v"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_grouped(spark):
    df = spark.range(9000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("x"), (F.col("id") / 3).cast("long")).alias("v"),
    )
    rows = {
        r.g: r.estimate
        for r in sk.hll_estimate(df, F.col("v"), group=["g"]).collect()
    }
    assert set(rows) == {"0", "1", "2"}
    for est in rows.values():
        assert abs(est - 3000) / 3000 < 0.08


def test_kmv_exact_below_k(spark):
    est = sk.kmv_estimate(_vals(spark, 100), F.col("v"), k=256).collect()[0]
    assert est.sketch_size == 100 and est.estimate == 100.0


def test_kmv_error_within_bound(spark):
    # k=256 -> stderr ~1/sqrt(254) ~ 6.3%; assert within ~4 sigma.
    est = sk.kmv_estimate(_vals(spark, 30000), F.col("v"), k=256).collect()[0]
    assert abs(est.estimate - 30000) / 30000 < 0.25


def test_countmin_never_underestimates(spark):
    toks = spark.range(20000).select(
        F.pmod(F.col("id") * 7919, F.lit(500)).cast("string").alias("token")
    )
    cands = toks.distinct().limit(50)
    est = sk.countmin_heavy_hitters(toks, cands)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    joined = est.join(exact, "token").collect()
    assert len(joined) == 50
    for r in joined:
        assert r.est_count >= r.n, r


def test_countmin_heavy_hitter_near_exact(spark):
    # One dominant token among light noise: the min-over-rows estimate for
    # the heavy hitter is within the eps*N additive bound (eps = e/1024).
    heavy = spark.range(5000).select(F.lit("HEAVY").alias("token"))
    noise = spark.range(2000).select(
        F.concat(F.lit("n"), F.col("id")).alias("token")
    )
    toks = heavy.unionByName(noise)
    cand = spark.createDataFrame([("HEAVY",)], ["token"])
    est = sk.countmin_heavy_hitters(toks, cand).collect()[0]
    assert 5000 <= est.est_count <= 5000 + int(2.72 * 7000 / 1024) + 1
