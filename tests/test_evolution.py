"""Schema evolution (reference addSignTime analogue) + snapshot time travel."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kafka2iceberg_spark.sink import IcebergLite

BASE = datetime.datetime(2024, 9, 1, 12, 0, 0)


def _batch(spark, lo, hi, with_sign_time=False):
    rows = []
    for i in range(lo, hi):
        r = [f"c{i % 2}", i, f"t{i}", BASE + datetime.timedelta(minutes=i),
             i * 2, 0, False]
        if with_sign_time:
            r.append(BASE + datetime.timedelta(hours=1, minutes=i))
        rows.append(tuple(r))
    schema = (
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "offset long, partition_idx int, is_cdc_delete boolean"
    )
    if with_sign_time:
        schema += ", sign_time timestamp"
    return spark.createDataFrame(rows, schema)


def test_add_column_evolution(spark, tmp_path):
    """A later batch carrying a new nullable column merges cleanly; old rows
    read back with NULL in the new column (Iceberg add-column semantics)."""
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    t.commit_upsert(_batch(spark, 0, 6), "0")
    t.commit_upsert(_batch(spark, 6, 10, with_sign_time=True), "1")

    df = t.read(spark)
    assert "sign_time" in df.columns
    old = df.where("turn_idx < 6")
    new = df.where("turn_idx >= 6")
    assert old.where(F.col("sign_time").isNotNull()).count() == 0
    assert new.where(F.col("sign_time").isNull()).count() == 0
    assert df.count() == 10


def test_time_travel_reads_old_version(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    t.commit_upsert(_batch(spark, 0, 5), "0")
    v1 = t.current_version()
    t.commit_upsert(_batch(spark, 5, 9), "1")

    assert t.read(spark).count() == 9
    assert t.read(spark, version=v1).count() == 5
    old_rows = {r["turn_idx"] for r in t.read(spark, version=v1).collect()}
    assert old_rows == set(range(5))


def test_compact_preserves_evolved_schema(spark, tmp_path):
    """ADVICE: compaction over a partition holding pre- and post-evolution
    files must mergeSchema — otherwise the rewrite adopts one file's schema
    and silently drops the evolved column from compacted data."""
    t = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    t.commit_append(_batch(spark, 0, 4), "0")
    t.commit_append(_batch(spark, 4, 8, with_sign_time=True), "1")

    assert t.compact(spark, min_files_per_partition=2) >= 1
    df = t.read(spark)
    assert "sign_time" in df.columns
    assert df.count() == 8
    assert df.where(
        (F.col("turn_idx") >= 4) & F.col("sign_time").isNotNull()
    ).count() == 4
    assert df.where(
        (F.col("turn_idx") < 4) & F.col("sign_time").isNull()
    ).count() == 4
