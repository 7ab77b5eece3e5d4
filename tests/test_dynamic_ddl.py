"""DDL-driven live schema evolution (ingest.parse_add_columns /
evolve_spec / pipeline.start_dynamic_sink): an upstream ALTER TABLE ADD
COLUMN arriving mid-stream evolves the task spec inside one continuous
query; restart replays the spec journal; unsupported DDL is surfaced,
never half-applied."""

from __future__ import annotations

import json
import os

from kafka2iceberg_spark import ingest, pipeline
from kafka2iceberg_spark.config import FieldSpec, TaskSpec
from kafka2iceberg_spark.sink import IcebergLite

REF_ALTER = (
    "alter table test.t_busi_detail\n"
    "    add sign_time datetime null comment '签收时间' after is_valid"
)


def _spec() -> TaskSpec:
    return TaskSpec(
        source_database="chat",
        source_table="transcripts",
        fields=[
            FieldSpec("conv_id", 1, "string", is_nullable=False,
                      is_primary_key=True),
            FieldSpec("turn_idx", 2, "int", is_nullable=False,
                      is_primary_key=True),
            FieldSpec("text", 3, "string"),
            FieldSpec("ts", 4, "timestamp"),
        ],
    )


def _data_env(idx, ts, sign_time=None, offset=0):
    data = {
        "conv_id": "c1",
        "turn_idx": str(idx),
        "text": f"turn {idx}",
        "ts": ts,
    }
    if sign_time is not None:
        data["sign_time"] = sign_time
    return {
        "data": [data],
        "database": "chat",
        "table": "transcripts",
        "type": "INSERT",
        "isDdl": False,
        "ts": 1725184800000,
        "es": 1725184799500,
        "old": None,
        "pkNames": ["conv_id", "turn_idx"],
        "sql": "",
        "_offset": offset,
        "_partition": 0,
    }


def _ddl_env(sql, offset=0):
    return {
        "data": None,
        "database": "chat",
        "table": "transcripts",
        "type": "ALTER",
        "isDdl": True,
        "ts": 1725184800000,
        "es": 1725184799500,
        "old": None,
        "pkNames": [],
        "sql": sql,
        "_offset": offset,
        "_partition": 0,
    }


def _write(broker, name, envs, mtime):
    with open(os.path.join(broker, name), "w") as fh:
        for e in envs:
            fh.write(json.dumps(e) + "\n")
    os.utime(os.path.join(broker, name), (mtime, mtime))


def test_parse_add_columns_shapes():
    assert ingest.parse_add_columns(REF_ALTER) == [("sign_time", "timestamp")]
    assert ingest.parse_add_columns(
        "ALTER TABLE t ADD COLUMN `v` VARCHAR(255) NOT NULL"
    ) == [("v", "string")]
    assert ingest.parse_add_columns("alter table t add n decimal(10,2)") == [
        ("n", "double")
    ]
    assert ingest.parse_add_columns("alter table t drop column x") == []
    assert ingest.parse_add_columns("alter table t add x sometype") == []
    assert ingest.parse_add_columns("") == []


def test_evolve_spec_idempotent():
    s0 = _spec()
    s1 = ingest.evolve_spec(s0, REF_ALTER)
    assert [f.name for f in s1.fields][-1] == "sign_time"
    assert s1.fields[-1].type == "timestamp"
    assert s1.fields[-1].seq == 5
    assert ingest.evolve_spec(s1, REF_ALTER) is s1  # duplicate: no-op
    assert ingest.evolve_spec(s0, "alter table t modify c int") is s0


def test_mid_stream_ddl_evolves_spec_without_restart(spark, tmp_path):
    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    _write(broker, "b0.jsonl",
           [_data_env(i, f"2024-09-01 10:0{i}:00", offset=i)
            for i in range(3)], 1_000_000)
    _write(broker, "b1.jsonl",
           [_ddl_env(REF_ALTER, offset=3)] +
           [_data_env(i, f"2024-09-01 10:0{i}:00",
                      sign_time="2024-09-01 11:00:00", offset=i + 1)
            for i in range(3, 6)], 1_000_100)
    table = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    raw = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=1)
    q = pipeline.start_dynamic_sink(
        raw, _spec(), table, str(tmp_path / "ck"),
        str(tmp_path / "spec_journal.jsonl"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    rows = {r.turn_idx: r for r in table.read(spark).collect()}
    assert len(rows) == 6
    # pre-ALTER rows: NULL-backfilled new column
    assert all(rows[i].sign_time is None for i in (0, 1, 2))
    # post-ALTER rows: typed timestamps from the very batch the DDL
    # arrived in — the reference's TODO window, closed
    assert all(rows[i].sign_time is not None for i in (3, 4, 5))


def test_restart_replays_spec_journal(spark, tmp_path):
    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    journal = str(tmp_path / "spec_journal.jsonl")
    table = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    _write(broker, "b0.jsonl",
           [_ddl_env(REF_ALTER, offset=0),
            _data_env(0, "2024-09-01 10:00:00",
                      sign_time="2024-09-01 11:00:00", offset=1)], 1_000_000)
    raw = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=1)
    q = pipeline.start_dynamic_sink(
        raw, _spec(), table, str(tmp_path / "ck"), journal,
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    # restart: NEW sink instance from the ORIGINAL spec (no sign_time) +
    # new traffic that carries the field but no DDL — only the journal
    # knows the column exists
    _write(broker, "b1.jsonl",
           [_data_env(1, "2024-09-01 10:01:00",
                      sign_time="2024-09-01 11:30:00", offset=2)], 1_000_100)
    raw2 = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=1)
    q2 = pipeline.start_dynamic_sink(
        raw2, _spec(), table, str(tmp_path / "ck"), journal,
        trigger={"availableNow": True},
    )
    q2.awaitTermination()
    rows = {r.turn_idx: r for r in table.read(spark).collect()}
    assert rows[1].sign_time is not None


def test_unsupported_ddl_surfaced_not_applied(spark, tmp_path):
    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    _write(broker, "b0.jsonl",
           [_ddl_env("alter table t_busi_detail drop column is_valid",
                     offset=0),
            _data_env(0, "2024-09-01 10:00:00", offset=1)], 1_000_000)
    table = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    ddl_side = IcebergLite(str(tmp_path / "ddl"), pk=[],
                           partition_field=None)
    raw = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=1)
    q = pipeline.start_dynamic_sink(
        raw, _spec(), table, str(tmp_path / "ck"),
        str(tmp_path / "spec_journal.jsonl"),
        trigger={"availableNow": True}, ddl_table=ddl_side,
    )
    q.awaitTermination()
    assert table.read(spark).count() == 1
    assert "sign_time" not in table.read(spark).columns
    side = ddl_side.read(spark).collect()
    assert len(side) == 1 and "drop column" in side[0]["ddl_sql"]
    assert not os.path.exists(str(tmp_path / "spec_journal.jsonl"))


def test_parse_add_columns_multi_clause_all_or_nothing():
    assert ingest.parse_add_columns(
        "alter table t add a int, add column b text"
    ) == [("a", "int"), ("b", "string")]
    assert ingest.parse_add_columns(
        "alter table t add n decimal(10,2), add m datetime"
    ) == [("n", "double"), ("m", "timestamp")]
    # a comma inside a comment string must not split clauses
    assert ingest.parse_add_columns(
        "alter table t add a int comment 'has, comma', add b text"
    ) == [("a", "int"), ("b", "string")]
    # ANY unsupported clause poisons the whole statement — never
    # half-applied
    assert ingest.parse_add_columns(
        "alter table t add a int, drop column c"
    ) == []
    assert ingest.parse_add_columns(
        "alter table t add a int, add b sometype"
    ) == []


def test_parse_modify_columns_shapes():
    assert ingest.parse_modify_columns(
        "alter table test.t modify turn_idx bigint"
    ) == [("turn_idx", "bigint")]
    assert ingest.parse_modify_columns(
        "ALTER TABLE t MODIFY COLUMN `n` DOUBLE NULL COMMENT 'x'"
    ) == [("n", "double")]
    assert ingest.parse_modify_columns(
        "alter table t modify a bigint, modify column b double"
    ) == [("a", "bigint"), ("b", "double")]
    # CHANGE renames, drops, mixed ADDs: poisoned whole statements
    assert ingest.parse_modify_columns(
        "alter table t change a a2 bigint"
    ) == []
    assert ingest.parse_modify_columns(
        "alter table t modify a bigint, drop column b"
    ) == []
    assert ingest.parse_modify_columns(
        "alter table t add a int"
    ) == []
    assert ingest.parse_modify_columns("") == []


def test_evolve_spec_modify_widening_rules():
    s0 = _spec()
    # int -> bigint: widened in place, seq/name/pk untouched
    s1 = ingest.evolve_spec(s0, "alter table t modify turn_idx bigint")
    f = {x.name: x for x in s1.fields}["turn_idx"]
    assert f.type == "bigint" and f.seq == 2 and f.is_primary_key
    # replay / duplicate delivery: no-op
    assert ingest.evolve_spec(
        s1, "alter table t modify turn_idx bigint"
    ) is s1
    # narrowing: never applied
    assert ingest.evolve_spec(
        s1, "alter table t modify turn_idx int"
    ) is s1
    # non-lattice change (string -> int): never applied
    assert ingest.evolve_spec(
        s0, "alter table t modify text int"
    ) is s0
    # unknown column poisons the whole statement (all-or-nothing)
    assert ingest.evolve_spec(
        s0, "alter table t modify turn_idx bigint, modify nope bigint"
    ) is s0
    # a column named by >1 MODIFY clause is ambiguous (a widening could
    # be shadowed by a later no-op under dict collapse): rejected whole,
    # identity preserved
    assert ingest.evolve_spec(
        s0, "alter table t modify turn_idx bigint, modify turn_idx int"
    ) is s0
    assert ingest.evolve_spec(
        s0, "alter table t modify turn_idx bigint, modify turn_idx bigint"
    ) is s0


def test_evolve_spec_duplicate_add_clauses_rejected():
    s0 = _spec()
    # same ambiguity rule as MODIFY: 'add a smallint, add a bigint'
    # under first-wins would silently shadow the wider later type —
    # rejected whole, identity preserved
    assert ingest.evolve_spec(
        s0, "alter table t add a int, add a bigint"
    ) is s0
    assert ingest.evolve_spec(
        s0, "alter table t add a int, add a int"
    ) is s0
    # distinct new columns still apply in one statement
    out = ingest.evolve_spec(s0, "alter table t add a int, add b bigint")
    assert {f.name for f in out.fields} >= {"a", "b"}


def test_mid_stream_modify_widens_type_without_restart(spark, tmp_path):
    """VERDICT r3 task 5: an upstream MODIFY COLUMN int->bigint arriving
    mid-stream widens the live spec; a value beyond int32 in the very
    next envelopes parses losslessly and the sink widens the committed
    table schema — no restart, history intact."""
    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    big = 5_000_000_000  # > 2^31
    _write(broker, "b0.jsonl",
           [_data_env(i, f"2024-09-01 10:0{i}:00", offset=i)
            for i in range(3)], 1_000_000)
    _write(broker, "b1.jsonl",
           [_ddl_env("alter table chat.transcripts modify turn_idx bigint",
                     offset=3),
            _data_env(big, "2024-09-01 10:09:00", offset=4)], 1_000_100)
    table = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    raw = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=1)
    q = pipeline.start_dynamic_sink(
        raw, _spec(), table, str(tmp_path / "ck"),
        str(tmp_path / "spec_journal.jsonl"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    out = table.read(spark)
    assert dict(out.dtypes)["turn_idx"] == "bigint"
    vals = {r.turn_idx for r in out.collect()}
    assert vals == {0, 1, 2, big}  # history intact, wide value lossless
    # restart from the ORIGINAL (int) spec: journal replays the widening
    _write(broker, "b2.jsonl",
           [_data_env(big + 1, "2024-09-01 10:10:00", offset=5)], 1_000_200)
    raw2 = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=1)
    q2 = pipeline.start_dynamic_sink(
        raw2, _spec(), table, str(tmp_path / "ck"),
        str(tmp_path / "spec_journal.jsonl"),
        trigger={"availableNow": True},
    )
    q2.awaitTermination()
    assert big + 1 in {r.turn_idx for r in table.read(spark).collect()}
