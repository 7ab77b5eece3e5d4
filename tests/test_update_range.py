"""Copy-on-write UPDATE WHERE range: stats-planned rewrite semantics.

Disjoint files must carry by reference (zero data IO), every possibly-
matching file rewrites with the SET expressions applied inside the range
and rows outside copied verbatim; NULL predicate values never match; MOR
deletes cannot resurrect; replays are no-ops; time travel keeps the
pre-update image.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka2iceberg_spark.sink import IcebergLite

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
        T.StructField("note", T.StringType()),
    ]
)


def _day(d: int, h: int = 0) -> dt.datetime:
    return dt.datetime(2026, 4, d, h, 0, 0)


def _mk(spark, path, days=4):
    t = IcebergLite(path, pk=["pk"], partition_field="ts")
    for d in range(1, days + 1):
        rows = [
            (d * 100 + i, _day(d, i % 24), d * 1000 + i, f"n{d}")
            for i in range(10)
        ]
        assert t.commit_append(spark.createDataFrame(rows, SCHEMA), f"b{d}")
    return t


def test_update_rewrites_only_overlapping_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    res = t.update_range(
        spark,
        "ts",
        {"note": "redacted", "v": F.lit(-1).cast("long")},
        lo=_day(2),
        hi=_day(2, 23),
        batch_id="u1",
    )
    assert res["files_rewritten"] == 1 and res["files_carried"] == 3
    got = t.read(spark)
    inside = got.where(
        (F.col("ts") >= F.lit(_day(2))) & (F.col("ts") <= F.lit(_day(2, 23)))
    )
    assert inside.count() == 10
    assert inside.where(
        (F.col("note") == "redacted") & (F.col("v") == -1)
    ).count() == 10
    # rows outside the range are byte-identical
    outside = got.where(F.col("ts") > F.lit(_day(2, 23)))
    assert outside.where(F.col("note") == "redacted").count() == 0
    assert got.count() == 40
    # time travel to the pre-update image
    old = t.read(spark, version=res["version"] - 1)
    assert old.where(F.col("note") == "redacted").count() == 0


def test_update_null_predicate_rows_unchanged(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "t"), pk=["pk"])
    rows = [(1, _day(1), 10, "a"), (2, None, 20, "b")]
    t.commit_append(spark.createDataFrame(rows, SCHEMA), "b0")
    t.update_range(
        spark, "ts", {"note": "x"}, lo=_day(1), hi=_day(1), batch_id="u"
    )
    got = {r["pk"]: r["note"] for r in t.read(spark).collect()}
    assert got == {1: "x", 2: "b"}


def test_update_replay_and_validation(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), days=1)
    assert t.update_range(
        spark, "v", {"note": "y"}, lo=1000, hi=1004, batch_id="u"
    )
    v = t.current_version()
    assert t.update_range(
        spark, "v", {"note": "y"}, lo=1000, hi=1004, batch_id="u"
    ) is None
    assert t.current_version() == v
    with pytest.raises(ValueError):
        t.update_range(spark, "v", {"nope": 1}, lo=0, hi=1)
    with pytest.raises(ValueError):
        t.update_range(spark, "v", {"note": "z"})
    with pytest.raises(ValueError):
        t.update_range(spark, "v", {}, lo=0, hi=1)


def test_update_after_mor_upsert_no_resurrection(spark, tmp_path):
    t = IcebergLite(str(tmp_path / "t"), pk=["pk"])
    base = [(i, _day(1, h=i), i, "a") for i in range(10)]
    t.commit_append(spark.createDataFrame(base, SCHEMA), "b0")
    t.commit_upsert(
        spark.createDataFrame([(3, _day(4), 333, "new")], SCHEMA),
        "b1",
        strategy="mor",
    )
    # update a range covering the superseded pk=3 row's old position
    t.update_range(
        spark, "ts", {"note": "u"}, lo=_day(1), hi=_day(1, 4), batch_id="u"
    )
    got = {r["pk"]: (r["v"], r["note"]) for r in t.read(spark).collect()}
    assert got[3] == (333, "new")  # upserted image untouched, not doubled
    assert len(got) == 10
    assert {got[i][1] for i in range(3)} == {"u"}


def test_update_set_expression_uses_row_values(spark, tmp_path):
    """SET with a Column expression over the row itself (v = v * 2)."""
    t = _mk(spark, str(tmp_path / "t"), days=2)
    res = t.update_range(
        spark, "v", {"v": F.col("v") * 2}, lo=1000, hi=1999, batch_id="u"
    )
    assert res["files_rewritten"] == 1 and res["files_carried"] == 1
    rows = {r["pk"]: r["v"] for r in t.read(spark).collect()}
    assert {rows[100 + i] for i in range(10)} == {2 * (1000 + i) for i in range(10)}
    assert {rows[200 + i] for i in range(10)} == {2000 + i for i in range(10)}
