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


def _write_wave(spark, src_dir, lo, hi, mtime):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id")
    )
    part = os.path.join(src_dir, f"wave-{lo}-{hi}")
    df.coalesce(1).write.parquet(part)
    for root, _, files in os.walk(part):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


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
