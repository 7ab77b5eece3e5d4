"""Batch read path of the IcebergLite Python data source.

spark.read.format("iceberglite"): head/time-travel/branch reads, filter
pushdown → manifest-stats file pruning (unit-tested on the planner so the
skip is proven, not assumed), and join-free MOR reconciliation via the
inlined delete set — with read-equivalence against IcebergLite.read.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka2iceberg_spark.sink import IcebergLite
from kafka2iceberg_spark.table_stream import (
    _TableBatchReader,
    _TableBatchReaderPushdown,
    table_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _day(d: int, h: int = 0) -> dt.datetime:
    return dt.datetime(2026, 3, d, h, 0, 0)


@pytest.fixture()
def table(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "t"), pk=["pk"], partition_field="ts")
    for d in range(1, 5):
        rows = [(d * 100 + i, _day(d, i % 24), d * 1000 + i) for i in range(10)]
        assert t.commit_append(spark.createDataFrame(rows, SCHEMA), f"b{d}")
    return t


def test_batch_read_equals_table_read(spark, table):
    got = sorted(map(tuple, table_batch(spark, table.location).collect()))
    want = sorted(map(tuple, table.read(spark).collect()))
    assert got == want and len(got) == 40


def test_batch_read_time_travel_and_branch(spark, table):
    assert table_batch(spark, table.location, version=1).count() == 10
    table.create_branch("audit", 2)
    assert table_batch(spark, table.location, branch="audit").count() == 20
    with pytest.raises(Exception):
        spark.read.format("iceberglite").option(
            "location", table.location
        ).option("version", "1").option("branch", "audit").load().collect()


def test_pushdown_prunes_files(spark, table):
    """Planner-level proof: a one-day bound plans exactly one of the four
    file partitions; strict bounds prune as inclusive supersets; an
    unknown-stats column prunes nothing."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        LessThanOrEqual,
    )

    schema = table.table_schema()
    r = _TableBatchReaderPushdown(table.location, schema, None, None)
    assert len(r.partitions()) == 4

    r = _TableBatchReaderPushdown(table.location, schema, None, None)
    rest = r.pushFilters(
        [
            GreaterThan(("ts",), _day(2)),
            LessThanOrEqual(("ts",), _day(2, 23)),
        ]
    )
    assert len(list(rest)) == 2  # everything re-applied by Spark
    assert len(r.partitions()) == 1

    # equality on the second stats column (v is monotone per file)
    r = _TableBatchReaderPushdown(table.location, schema, None, None)
    r.pushFilters([EqualTo(("v",), 3005)])
    assert len(r.partitions()) == 1

    # filters on a column without usable bounds keep every file
    r = _TableBatchReaderPushdown(table.location, schema, None, None)
    r.pushFilters([EqualTo(("pk",), None)])
    assert len(r.partitions()) == 4


def test_pushdown_e2e_results_exact(spark, table):
    """With pushdown enabled end-to-end, results equal the unpruned read
    (the residual filter catches everything inside kept files)."""
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = table_batch(spark, table.location).where(
            (F.col("ts") >= F.lit(_day(2))) & (F.col("ts") <= F.lit(_day(3, 4)))
        )
        want = table.read(spark).where(
            (F.col("ts") >= F.lit(_day(2))) & (F.col("ts") <= F.lit(_day(3, 4)))
        )
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_batch_read_applies_mor_deletes(spark, table):
    """Superseded rows drop without a join; the upserted image survives;
    read equivalence with the join-based MOR read holds."""
    table.commit_upsert(
        spark.createDataFrame([(201, _day(9), 9999)], SCHEMA),
        "up1",
        strategy="mor",
    )
    got = sorted(map(tuple, table_batch(spark, table.location).collect()))
    want = sorted(map(tuple, table.read(spark).collect()))
    assert got == want
    by_pk = {r[0]: r[2] for r in got}
    assert by_pk[201] == 9999 and len(got) == 41 - 1


def test_batch_read_delete_set_cap(spark, table, monkeypatch):
    """Beyond the inline cap the reader refuses with guidance instead of
    silently building an unbounded driver-side set."""
    import kafka2iceberg_spark.table_stream as ts

    table.commit_upsert(
        spark.createDataFrame([(101, _day(9), 1)], SCHEMA),
        "up-cap",
        strategy="mor",
    )
    monkeypatch.setattr(ts, "MAX_INLINE_DELETE_ROWS", 0)
    r = _TableBatchReader(table.location, table.table_schema(), None, None)
    with pytest.raises(Exception, match="materialize_deletes"):
        r.partitions()
