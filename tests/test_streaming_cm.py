"""StreamingCountMin: sum-merged counter table equals the batch sketch
over the union; replay cannot double-count (the non-idempotent merge is
protected ONLY by the batch-id guard); estimates keep the one-sided bound."""

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
    part = os.path.join(src_dir, f"wave-{tag}")
    df.coalesce(1).write.parquet(part)
    for root, _, files in os.walk(part):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def _token_wave(spark, src_dir, tokens, mtime, tag):
    df = spark.createDataFrame([(t,) for t in tokens], ["token"])
    _stamp_wave(df, src_dir, tag, mtime)


def test_streaming_cm_equals_batch_and_bounds(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 100
    _token_wave(
        spark, src, ["HOT"] * 50 + [f"t{i}" for i in range(40)], t0, "a"
    )
    _token_wave(
        spark, src,
        ["HOT"] * 30 + ["warm"] * 20 + [f"t{i}" for i in range(40, 80)],
        t0 + 1, "b",
    )

    table = IcebergLite(
        str(tmp_path / "cm"), pk=["row", "bucket"], partition_field=None
    )
    scm = sk.StreamingCountMin(table, depth=4, width=256)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", "1")  # one wave per micro-batch
        .parquet(src + "/*")
    )
    q = scm.start(stream, "token", str(tmp_path / "ck"))
    q.awaitTermination()

    # incremental counter table == one-shot batch sketch over everything
    batch_all = spark.read.parquet(src + "/*")
    want = sk.countmin_counters(batch_all, "token", 4, 256).collect()
    got = table.read(spark).select("row", "bucket", "counter").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert table.read(spark).count() <= 4 * 256  # bounded state, forever

    # one-sided estimate bound for candidates chosen AFTER the fact
    cands = spark.createDataFrame(
        [("HOT",), ("warm",), ("t0",), ("never-seen",)], ["token"]
    )
    est = {r.token: r.est_count for r in scm.estimate(spark, cands).collect()}
    truth = {"HOT": 80, "warm": 20, "t0": 1, "never-seen": 0}
    for tok, true_n in truth.items():
        assert est[tok] >= true_n, (tok, est[tok], true_n)

    # replay with a fresh checkpoint: sum-merge would double-count, the
    # batch-id guard must skip both committed batches entirely
    q = scm.start(stream, "token", str(tmp_path / "ck2"))
    q.awaitTermination()
    again = table.read(spark).select("row", "bucket", "counter").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, want))


def test_streaming_cm_validates_pk(tmp_path):
    bad = IcebergLite(str(tmp_path / "b"), pk=["token"])
    with pytest.raises(ValueError):
        sk.StreamingCountMin(bad)
