"""Contract tests for the jar-gated integration paths (S1 real Kafka source,
K2 real-Iceberg MERGE). The sandbox ships neither spark-sql-kafka nor
iceberg-spark-runtime, so these pin the exact options/SQL those paths emit —
the ~30 lines a first real-cluster user exercises — and that the gates fail
fast with actionable guidance instead of deep stack traces.
"""

from __future__ import annotations

import pytest

from kafka2iceberg_spark.pipeline import (
    KAFKA_SELECT_COLS,
    kafka_reader_options,
    kafka_stream,
)
from kafka2iceberg_spark.sink import have_iceberg, merge_into_iceberg, merge_sql


def test_kafka_reader_options_match_reference_contract():
    # KafkaUtils.java:20-41: bootstrap servers, topic subscription, earliest
    opts = kafka_reader_options("broker1:9092,broker2:9092", "transcripts")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "transcripts",
        "startingOffsets": "earliest",
    }
    assert kafka_reader_options("b", "t", "latest")["startingOffsets"] == "latest"
    # the ingest layer consumes exactly value + the two metadata columns
    assert KAFKA_SELECT_COLS == ["value", "offset", "partition"]


def test_kafka_stream_fails_fast_without_jar(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "transcripts")


def test_merge_sql_contract():
    sql = merge_sql("cat.chat.transcripts", ["conv_id", "turn_idx"])
    assert "MERGE INTO cat.chat.transcripts t USING _m_src s" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # delete-wins before update; insert only for non-deletes (reference
    # equality-delete upsert semantics, Kafka2IcebergApp.java:95-113)
    i_del = sql.index("WHEN MATCHED AND s.is_cdc_delete THEN DELETE")
    i_upd = sql.index("WHEN MATCHED THEN UPDATE SET *")
    i_ins = sql.index("WHEN NOT MATCHED AND NOT s.is_cdc_delete THEN INSERT *")
    assert i_del < i_upd < i_ins


def test_merge_sql_requires_pk():
    with pytest.raises(ValueError):
        merge_sql("t", [])


def test_merge_parses_against_spark_catalyst(spark):
    """Without the Iceberg jar the MERGE can't execute, but Catalyst can
    still PARSE it — catching SQL-syntax regressions in the gated path."""
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(
        merge_sql("cat.ns.tbl", ["conv_id"])
    )
    assert "MergeIntoTable" in plan.toString()


def test_have_iceberg_is_false_in_sandbox(spark):
    assert have_iceberg(spark) is False


def test_merge_into_iceberg_fails_cleanly_without_catalog(spark):
    df = spark.createDataFrame(
        [("c1", 0, False)], "conv_id string, turn_idx int, is_cdc_delete boolean"
    )
    with pytest.raises(Exception):
        merge_into_iceberg(spark, "nocat.ns.tbl", df, ["conv_id", "turn_idx"])
