"""Golden-envelope ingest tests — transcript analogue of the reference's
DeserializedSchemaTest (DeserializedSchemaTest.java:39, :64-146): one
captured Canal-JSON INSERT envelope deserialized into a fully-typed row,
asserting every field, NULL handling, and the derived
is_cdc_delete/offset/partition_idx columns.
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from kafka2iceberg_spark import gen, ingest
from kafka2iceberg_spark.schema import transcript_task

SPEC = transcript_task()

GOLDEN = {
    "data": [
        {
            "conv_id": "c00042",
            "turn_idx": "7",
            "role": "assistant",
            "text": "the plan shuffles once",
            "tool": "null",
            "ts": "2024-09-16 11:05:34",
        }
    ],
    "database": "chat",
    "table": "transcripts",
    "type": "INSERT",
    "isDdl": False,
    "ts": 1726484734000,
    "es": 1726484733500,
    "old": None,
    "pkNames": ["conv_id", "turn_idx"],
    "sql": "",
    "_offset": 135189,
    "_partition": 3,
}


def _raw(spark, envelopes):
    return spark.createDataFrame(
        [(json.dumps(e),) for e in envelopes], "value string"
    )


def test_golden_insert_envelope(spark):
    row = ingest.parse(_raw(spark, [GOLDEN]), SPEC).collect()[0]
    assert row.conv_id == "c00042"
    assert row.turn_idx == 7 and isinstance(row.turn_idx, int)
    assert row.role == "assistant"
    assert row.text == "the plan shuffles once"
    assert row.tool is None  # textual "null" → SQL NULL (P8)
    assert row.ts == datetime.datetime(2024, 9, 16, 11, 5, 34)
    assert row.offset == 135189  # P12
    assert row.partition_idx == 3  # P13
    assert row.is_cdc_delete is False  # P11


def test_delete_flag_case_insensitive(spark):
    e = dict(GOLDEN, type="delete")
    row = ingest.parse(_raw(spark, [e]), SPEC).collect()[0]
    assert row.is_cdc_delete is True


def test_routing_filter_drops_foreign_tables(spark):
    # P3: database/table equi-predicate (DeserializedSchema.java:100-107)
    wrong_db = dict(GOLDEN, database="other")
    wrong_tbl = dict(GOLDEN, table="other")
    out = ingest.parse(_raw(spark, [GOLDEN, wrong_db, wrong_tbl]), SPEC)
    assert out.count() == 1


def test_query_type_dropped(spark):
    # P4: 'query' events dropped, case-insensitive + trimmed
    q = dict(GOLDEN, type="  Query ")
    out = ingest.parse(_raw(spark, [GOLDEN, q]), SPEC)
    assert out.count() == 1


def test_tombstone_dropped(spark):
    # P1: null payloads (Kafka tombstones)
    df = spark.createDataFrame([(json.dumps(GOLDEN),), (None,)], "value string")
    assert ingest.parse(df, SPEC).count() == 1


def test_multi_row_batch_flattens(spark):
    # P6: one output row per data[] element (Canal batches rows)
    e = dict(GOLDEN)
    e["data"] = [
        dict(GOLDEN["data"][0], turn_idx=str(i), text=f"t{i}") for i in range(5)
    ]
    out = ingest.parse(_raw(spark, [e]), SPEC)
    assert out.count() == 5
    assert {r.turn_idx for r in out.collect()} == set(range(5))


def test_not_null_enforcement_raises(spark):
    # P8: not-null violation must fail the task like the reference's
    # IllegalArgumentException (DeserializedSchema.java:153-156)
    e = dict(GOLDEN)
    e["data"] = [dict(GOLDEN["data"][0], conv_id="null")]
    with pytest.raises(Exception, match="cannot be null"):
        ingest.parse(_raw(spark, [e]), SPEC).collect()


def test_violations_dead_letter_routing(spark):
    e = dict(GOLDEN)
    e["data"] = [dict(GOLDEN["data"][0], conv_id="null")]
    parsed = ingest.parse(_raw(spark, [GOLDEN, e]), SPEC, enforce_not_null=False)
    assert ingest.violations(parsed, SPEC).count() == 1


def test_generator_roundtrip(spark):
    # every generated envelope parses; per-turn text equality holds for the
    # deduped INSERT set vs the ground-truth turns (the parity invariant)
    cfg = gen.GenConfig(n_convs=5, turns_per_conv=6, mega_convs=0, seed=7)
    envs = gen.envelopes(cfg)
    parsed = ingest.parse(_raw(spark, envs), SPEC)
    truth = {(t["conv_id"], t["turn_idx"]): t["text"] for t in gen.turns(cfg)}
    got = (
        parsed.filter(~F.col("is_cdc_delete"))
        .select("conv_id", "turn_idx", "text")
        .dropDuplicates(["conv_id", "turn_idx"])
        .collect()
    )
    assert len(got) == len(truth)
    for r in got:
        assert truth[(r.conv_id, r.turn_idx)] == r.text


def test_timestamp_second_precision(spark):
    # reference parses yyyy-MM-dd HH:mm:ss (DateTimeUtils.java:15-20);
    # envelope ts strings are second-precision by construction
    cfg = gen.GenConfig(n_convs=2, turns_per_conv=3, mega_convs=0)
    parsed = ingest.parse(_raw(spark, gen.envelopes(cfg)), SPEC)
    r = parsed.select("ts").first()
    assert r.ts.microsecond == 0


def test_malformed_envelope_dropped_not_fatal(spark):
    """Garbage bytes / invalid JSON / wrong-shape envelopes are dropped by
    the parse chain (from_json → NULL → routing filter), never crash it."""
    from kafka2iceberg_spark.ingest import parse
    from kafka2iceberg_spark.schema import transcript_task

    good = (
        '{"data":[{"conv_id":"c1","turn_idx":"0","role":"user","text":"hi",'
        '"tool":"null","ts":"2024-09-01 10:00:00"}],"database":"chat",'
        '"table":"transcripts","type":"INSERT","isDdl":false,'
        '"ts":1725184800000,"es":1725184800000,"old":null,'
        '"pkNames":["conv_id","turn_idx"],"sql":"","_offset":1,"_partition":0}'
    )
    rows = [
        (good,),
        ("this is not json at all {{{",),
        ('{"unrelated": true}',),
        ('[]',),
        ("",),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse(df, transcript_task()).collect()
    assert len(out) == 1
    assert out[0]["conv_id"] == "c1" and out[0]["text"] == "hi"


def test_envelope_epoch_fallback_ts_es_committs(spark):
    """P14: configured BIGINT fields named ts/es/CommitTs absent from
    data[] fall back to the envelope epochs (DeserializedSchema.java:178-186);
    a field present in data[] never falls back."""
    from kafka2iceberg_spark.config import FieldSpec, TaskSpec

    spec = TaskSpec(
        source_database="chat",
        source_table="transcripts",
        fields=[
            FieldSpec("conv_id", 1, "string", is_nullable=False,
                      is_primary_key=True),
            FieldSpec("ts", 2, "bigint"),          # not in data[] -> envelope
            FieldSpec("es", 3, "bigint"),          # not in data[] -> envelope
            FieldSpec("commit_ts", 4, "bigint"),   # -> envelope CommitTs
            FieldSpec("turn_idx", 5, "int"),       # in data[] -> no fallback
        ],
        namespace="chat",
        table="transcripts",
    )
    env = {
        "data": [{"conv_id": "c1", "turn_idx": "5"}],
        "database": "chat",
        "table": "transcripts",
        "type": "INSERT",
        "isDdl": False,
        "ts": 1726484734000,
        "es": 1726484733500,
        "CommitTs": 424242424242,
        "old": None,
        "pkNames": ["conv_id"],
        "sql": "",
        "_offset": 1,
        "_partition": 0,
    }
    row = ingest.parse(_raw(spark, [env]), spec).collect()[0]
    assert row.ts == 1726484734000
    assert row.es == 1726484733500
    assert row.commit_ts == 424242424242
    assert row.turn_idx == 5

    # envelope without CommitTs: the fallback itself is NULL, not an error
    env2 = dict(env)
    del env2["CommitTs"]
    row2 = ingest.parse(_raw(spark, [env2]), spec).collect()[0]
    assert row2.commit_ts is None


def test_corrupt_envelopes_detected_not_silent(spark):
    """Malformed JSON must be observable (the declarative from_json yields
    NULL and the routing filter would silently drop it; the reference's
    Jackson parse would throw). corrupt_envelopes isolates exactly the
    malformed rows; valid and tombstone rows are excluded."""
    rows = [
        (json.dumps(GOLDEN),),          # valid
        ("{not json at all",),          # malformed
        ('{"foo": 1}',),                # json but not an envelope
        (None,),                        # tombstone — P1's business, not ours
    ]
    raw = spark.createDataFrame(rows, "value string")
    bad = ingest.corrupt_envelopes(raw).collect()
    assert len(bad) == 2
    # the full parse still processes the valid row and drops the garbage
    out = ingest.parse(raw, SPEC).collect()
    assert len(out) == 1 and out[0].conv_id == "c00042"


def test_pk_mismatch_envelopes_flagged(spark):
    """pkNames disagreeing with the configured PK is observable (the
    reference parses pkNames and never validates — a mis-keyed topic
    corrupts upserts silently)."""
    ok = dict(GOLDEN)  # pkNames = [conv_id, turn_idx] matches spec
    bad = dict(GOLDEN, pkNames=["conv_id"], _offset=9)
    missing = dict(GOLDEN, pkNames=None, _offset=10)  # Canal may omit: ok
    out = ingest.pk_mismatch_envelopes(
        _raw(spark, [ok, bad, missing]), SPEC
    ).collect()
    assert len(out) == 1
    assert out[0]["pk_names"] == ["conv_id"]
    assert out[0]["expected_pk"] == ["conv_id", "turn_idx"]
    assert out[0]["offset"] == 9
    # order-insensitive: reversed pkNames is NOT a mismatch
    swapped = dict(GOLDEN, pkNames=["turn_idx", "conv_id"])
    assert not ingest.pk_mismatch_envelopes(_raw(spark, [swapped]), SPEC).count()


def test_update_diffs_from_old_array(spark):
    """UPDATE envelopes' old[] pre-images become per-field diff rows;
    unchanged fields (absent from old[]) produce no rows."""
    upd = dict(
        GOLDEN,
        type="UPDATE",
        old=[{"text": "previous words", "tool": "calc"}],
    )
    ins = dict(GOLDEN)  # INSERT: no diffs
    rows = sorted(
        (r.field, r.old_value, r.new_value)
        for r in ingest.update_diffs(_raw(spark, [upd, ins]), SPEC).collect()
    )
    assert rows == [
        ("text", "previous words", "the plan shuffles once"),
        ("tool", "calc", None),  # textual "null" new value -> SQL NULL
    ]
    [r] = ingest.update_diffs(_raw(spark, [upd]), SPEC).select(
        "conv_id", "turn_idx"
    ).distinct().collect()
    assert (r.conv_id, r.turn_idx) == ("c00042", "7")


def test_field_drift_reports_missing_and_unexpected(spark):
    from kafka2iceberg_spark.config import FieldSpec, TaskSpec
    from kafka2iceberg_spark.ingest import field_drift

    import json as _json

    rows = [
        (_json.dumps({"data": [{"a": 1, "b": 2}]}),),
        (_json.dumps({"data": [{"a": 3, "zz_new": 9}]}),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    spec = TaskSpec(
        source_database="d",
        source_table="t",
        fields=[FieldSpec("a", 1, "int"), FieldSpec("b", 2, "int"),
                FieldSpec("never_sent", 3, "string")],
    )
    out = {r["field"]: r for r in field_drift(raw, spec).collect()}
    assert out["a"]["n_seen"] == 2 and out["a"]["expected"]
    assert out["b"]["n_seen"] == 1 and out["b"]["expected"]
    assert out["never_sent"]["n_seen"] == 0 and out["never_sent"]["expected"]
    assert out["zz_new"]["n_seen"] == 1 and not out["zz_new"]["expected"]
