"""CDC egress (egress.changelog_envelopes / start_egress_sink): a table's
changelog re-encoded as Canal-JSON envelopes that THIS pipeline's own
ingest consumes — roundtrip table equality including deletes, MOR-upsert
netting, and envelope-shape parity with the generator."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka2iceberg_spark import egress, gen, pipeline
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite
from kafka2iceberg_spark.table_stream import table_stream

FIELDS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _build_source(spark, tmp_path) -> IcebergLite:
    """Table A via the normal ingest pipeline over generated CDC traffic
    (out-of-order, duplicates, deletes — the full envelope)."""
    broker = str(tmp_path / "brokerA")
    gen.write_stream_files(
        gen.GenConfig(n_convs=15, turns_per_conv=8, mega_convs=0,
                      delete_fraction=0.1, seed=21),
        broker, files=5,
    )
    spec = transcript_task()
    a = IcebergLite(str(tmp_path / "tableA"), pk=spec.primary_keys)
    # MOR upserts: the streaming-consumable write strategy (CoW commits
    # restate already-streamed rows and the changelog source refuses them)
    pipeline.run_ingest_once(spark, broker, spec, a,
                             str(tmp_path / "ckptA"), strategy="mor")
    return a


def _biz(table, spark):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"],
                                        r["ts"])
        for r in table.read(spark).select(*FIELDS).collect()
    }


def test_roundtrip_table_equality(spark, tmp_path):
    a = _build_source(spark, tmp_path)
    # egress A's full changelog as a broker feed
    broker2 = str(tmp_path / "brokerB")
    q = egress.start_egress_sink(
        table_stream(spark, a.location, starting_version=0,
                     changelog=True),
        broker2, "chat", "transcripts",
        pk=["conv_id", "turn_idx"], fields=FIELDS,
        checkpoint=str(tmp_path / "ckptE"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    # ingest the feed into table B with the SAME pipeline
    spec = transcript_task()
    b = IcebergLite(str(tmp_path / "tableB"), pk=spec.primary_keys)
    pipeline.run_ingest_once(spark, broker2, spec, b,
                             str(tmp_path / "ckptB"))
    got, want = _biz(b, spark), _biz(a, spark)
    assert got == want and len(got) > 50


def test_envelope_shape_matches_generator(spark, tmp_path):
    """Egressed envelopes carry exactly the generator's envelope keys, so
    any consumer of the reference's Canal feed can consume ours."""
    a = _build_source(spark, tmp_path)
    envs = egress.changelog_envelopes(
        _full_changelog(spark, a, tmp_path),
        "chat", "transcripts", pk=["conv_id", "turn_idx"], fields=FIELDS,
    )
    sample = json.loads(envs.limit(1).collect()[0]["value"])
    want_keys = set(gen.envelopes(gen.GenConfig(n_convs=1,
                                                turns_per_conv=1,
                                                mega_convs=0))[0])
    assert set(sample) == want_keys
    assert sample["database"] == "chat" and sample["isDdl"] is False
    assert isinstance(sample["data"], list) and len(sample["data"]) == 1
    assert set(sample["data"][0]) == set(FIELDS)


def _full_changelog(spark, table, tmp_path, name="cl"):
    """Drain the full changelog stream to parquet and read it back (the
    changelog source is streaming-first; CoW batch reads restate)."""
    q = (
        table_stream(spark, table.location, starting_version=0,
                     changelog=True)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / f"out-{name}"))
        .option("checkpointLocation", str(tmp_path / f"ckcl-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(tmp_path / f"out-{name}"))


def test_delete_envelopes_net_and_route(spark, tmp_path):
    """A MOR-style delete+insert pair at one version nets to ONE INSERT;
    a bare delete emits a DELETE envelope whose data carries the PK and
    textual nulls elsewhere (the parser's P8 contract)."""
    t = IcebergLite(str(tmp_path / "t"), pk=["conv_id", "turn_idx"])
    rows = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, "2024-01-01 00:00:00", False),
         ("c1", 1, "user", "bye", None, "2024-01-01 00:01:00", False)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, is_cdc_delete boolean",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.commit_upsert(rows, "0", strategy="mor")
    # update turn 0 and delete turn 1
    upd = spark.createDataFrame(
        [("c1", 0, "user", "hi again", None, "2024-01-01 00:02:00", False),
         ("c1", 1, None, None, None, None, True)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, is_cdc_delete boolean",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.commit_upsert(upd, "1", strategy="mor")
    envs = egress.changelog_envelopes(
        _full_changelog(spark, t, tmp_path), "chat", "transcripts",
        pk=["conv_id", "turn_idx"], fields=FIELDS,
    ).collect()
    parsed = [json.loads(r["value"]) for r in envs]
    by_key = {}
    for e in parsed:
        k = (e["data"][0]["conv_id"], int(e["data"][0]["turn_idx"]))
        by_key.setdefault(k, []).append(e)
    types_t0 = sorted(e["type"] for e in by_key[("c1", 0)])
    assert types_t0 == ["INSERT", "INSERT"]  # create + update, both netted
    dels = [e for e in by_key[("c1", 1)] if e["type"] == "DELETE"]
    assert len(dels) == 1
    assert dels[0]["data"][0]["text"] == "null"
    assert dels[0]["pkNames"] == ["conv_id", "turn_idx"]
    # offsets monotone within a partition
    offs = {}
    for e in parsed:
        offs.setdefault(e["_partition"], []).append(e["_offset"])
    for v in offs.values():
        assert v == sorted(v)
