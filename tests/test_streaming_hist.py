"""StreamingHist: sum-merged histogram table equals the batch sketch over
the union; replay cannot double-count; quantile readouts match the batch
hist_quantiles path."""

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


def _wave(spark, src_dir, cents, mtime, tag):
    df = spark.createDataFrame([(int(c),) for c in cents], ["cents"])
    part = os.path.join(src_dir, f"wave-{tag}")
    df.coalesce(1).write.parquet(part)
    for root, _, files in os.walk(part):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_streaming_hist_equals_batch_and_quantiles(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    wave_a = list(range(0, 1000, 10))          # 100 values, 0..990
    wave_b = list(range(500, 2500, 20))        # 100 values, 500..2480
    _wave(spark, src, wave_a, t0, "a")
    _wave(spark, src, wave_b, t0 + 1, "b")

    table = IcebergLite(str(tmp_path / "h"), pk=["bin"], partition_field=None)
    sh = sk.StreamingHist(table, bin_cents=100)
    stream = (
        spark.readStream.schema("cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = sh.start(stream, F.col("cents"), str(tmp_path / "ck"))
    q.awaitTermination()

    batch_all = spark.read.parquet(src + "/*")
    want = sorted(
        map(tuple, sk.hist_registers(
            batch_all, F.col("cents"), None, 100
        ).collect())
    )
    got = sorted(map(tuple, table.read(spark).select("bin", "c").collect()))
    assert got == want
    assert table.read(spark).count() <= 25  # bounded by value range / width

    # quantile readout == the batch hist_quantiles over the same registers
    got_q = {
        r.pct: r.est_cents for r in sh.quantiles(spark, [50, 95, 99]).collect()
    }
    want_q = {
        r.pct: r.est_cents
        for r in sk.hist_quantiles(
            sk.hist_registers(batch_all, F.col("cents"), None, 100),
            None, 100, [50, 95, 99],
        ).collect()
    }
    assert got_q == want_q and set(got_q) == {50, 95, 99}
    # sanity: p50 of the merged 200 values sits near the true median (~870)
    true_med = sorted(wave_a + wave_b)[99]
    assert abs(got_q[50] - true_med) <= 100  # one bin width


def test_streaming_hist_replay_guard(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(100)], ["cents"])
    table = IcebergLite(str(tmp_path / "h"), pk=["bin"], partition_field=None)
    sh = sk.StreamingHist(table, bin_cents=10)
    assert sh.apply_batch(df, F.col("cents"), "b0") is True
    before = sorted(map(tuple, table.read(spark).select("bin", "c").collect()))
    # re-feeding the SAME batch id must not double-count (sum-merge is not
    # idempotent; only the guard protects it)
    assert sh.apply_batch(df, F.col("cents"), "b0") is False
    after = sorted(map(tuple, table.read(spark).select("bin", "c").collect()))
    assert after == before


def test_streaming_hist_rejects_wrong_pk(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "x"), pk=["bucket"], partition_field=None)
    with pytest.raises(ValueError, match="pk"):
        sk.StreamingHist(t)
