"""P8 dead-letter routing: not-null violations go to a side table instead of
failing the stream; both sides stay replay-idempotent."""

from __future__ import annotations

import json
import os

from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.pipeline import (
    file_broker_stream,
    start_upsert_sink,
)
from kafka2iceberg_spark.ingest import parse
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite


def _bad_envelope_file(path: str) -> None:
    """Envelope whose row has a textual 'null' turn_idx (PK → not-null)."""
    env = {
        "data": [
            {
                "conv_id": "bad_conv",
                "turn_idx": "null",
                "role": "user",
                "text": "broken row",
                "tool": "null",
                "ts": "2024-09-01 10:00:00",
            }
        ],
        "database": "chat",
        "table": "transcripts",
        "type": "INSERT",
        "isDdl": False,
        "ts": 1725184800000,
        "es": 1725184800000,
        "old": None,
        "pkNames": ["conv_id", "turn_idx"],
        "sql": "",
        "_offset": 777777,
        "_partition": 1,
    }
    with open(path, "w") as fh:
        fh.write(json.dumps(env, separators=(",", ":")) + "\n")


def test_violations_routed_not_fatal(spark, tmp_path):
    broker = str(tmp_path / "broker")
    paths = write_stream_files(
        GenConfig(n_convs=5, turns_per_conv=6), broker, files=2
    )
    for i, p in enumerate(paths):
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    bad = f"{broker}/zz-bad.jsonl"
    _bad_envelope_file(bad)
    os.utime(bad, (1_100_000, 1_100_000))

    spec = transcript_task()
    table = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
    dlq = IcebergLite(str(tmp_path / "dlq"), pk=[], partition_field=None)
    raw = file_broker_stream(spark, broker, max_files_per_trigger=10)
    parsed = parse(raw, spec, enforce_not_null=False)
    q = start_upsert_sink(
        parsed,
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
        dead_letter=dlq,
        spec=spec,
    )
    q.awaitTermination()

    main_rows = table.read(spark)
    assert main_rows.where("conv_id = 'bad_conv'").count() == 0
    assert main_rows.count() > 0
    dead = dlq.read(spark).collect()
    assert len(dead) == 1
    assert dead[0]["conv_id"] == "bad_conv" and dead[0]["turn_idx"] is None

    # replay: both tables unchanged (shared batch-id guard)
    n_main, n_dlq = main_rows.count(), 1
    q = start_upsert_sink(
        parse(file_broker_stream(spark, broker, 10), spec, enforce_not_null=False),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
        dead_letter=dlq,
        spec=spec,
    )
    q.awaitTermination()
    assert table.read(spark).count() == n_main
    assert dlq.read(spark).count() == n_dlq


def test_corrupt_envelope_dlq_stream(spark, tmp_path):
    """Malformed payloads land in their own exactly-once DLQ table while
    the main ingest processes the valid rows from the same broker."""
    import json
    import os

    from kafka2iceberg_spark.gen import GenConfig, write_stream_files
    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        run_ingest_once,
        start_corrupt_dlq,
    )
    from kafka2iceberg_spark.schema import transcript_task
    from kafka2iceberg_spark.sink import IcebergLite

    broker = str(tmp_path / "broker")
    write_stream_files(
        GenConfig(n_convs=4, turns_per_conv=4, mega_convs=0, mega_turns=0,
                  ooo_fraction=0, late_fraction=0, dup_fraction=0,
                  delete_fraction=0),
        broker,
        files=2,
    )
    with open(os.path.join(broker, "zz_bad.jsonl"), "w") as fh:
        fh.write("{definitely not json\n")
        fh.write(json.dumps({"foo": 1}) + "\n")
    os.utime(os.path.join(broker, "zz_bad.jsonl"), (2_000_000, 2_000_000))

    spec = transcript_task()
    main_tbl = IcebergLite(str(tmp_path / "main"), pk=spec.primary_keys)
    run_ingest_once(spark, broker, spec, main_tbl, str(tmp_path / "ck_main"))
    assert main_tbl.read(spark).count() == 16  # garbage didn't poison it

    dlq = IcebergLite(str(tmp_path / "dlq"), pk=[], partition_field=None)
    q = start_corrupt_dlq(
        file_broker_stream(spark, broker, 10),
        dlq,
        str(tmp_path / "ck_dlq"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    bad = dlq.read(spark).collect()
    assert len(bad) == 2
    assert {r.raw_value for r in bad} == {"{definitely not json", '{"foo": 1}'}


def _ddl_envelope(db="chat", table="transcripts", sql="ALTER TABLE transcripts ADD COLUMN sign_time TIMESTAMP"):
    return {
        "data": None,
        "database": db,
        "table": table,
        "type": "ALTER",
        "isDdl": True,
        "ts": 1725184800000,
        "es": 1725184799000,
        "old": None,
        "pkNames": None,
        "sql": sql,
        "_offset": 31337,
        "_partition": 2,
    }


def test_ddl_events_routed_to_side_table(spark, tmp_path):
    """P5 closure: isDdl envelopes land in a queryable DDL side table while
    the main row path drops them exactly like the reference does."""
    from kafka2iceberg_spark.pipeline import start_ddl_sink

    broker = str(tmp_path / "broker")
    write_stream_files(
        GenConfig(n_convs=3, turns_per_conv=4, mega_convs=0, mega_turns=0,
                  ooo_fraction=0, late_fraction=0, dup_fraction=0,
                  delete_fraction=0),
        broker,
        files=1,
    )
    with open(f"{broker}/zz_ddl.jsonl", "w") as fh:
        fh.write(json.dumps(_ddl_envelope()) + "\n")
        # foreign table's DDL must NOT be routed
        fh.write(json.dumps(_ddl_envelope(table="other")) + "\n")
    os.utime(f"{broker}/zz_ddl.jsonl", (2_000_000, 2_000_000))

    spec = transcript_task()
    # main row path: DDL envelopes contribute zero rows
    raw = file_broker_stream(spark, broker, 10)
    ddl_tbl = IcebergLite(str(tmp_path / "ddl"), pk=[], partition_field=None)
    q = start_ddl_sink(
        raw, ddl_tbl, str(tmp_path / "ck_ddl"), spec=spec,
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    rows = ddl_tbl.read(spark).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["database"] == "chat" and r["table"] == "transcripts"
    assert r["ddl_sql"].startswith("ALTER TABLE")
    assert r["event_type"] == "ALTER"
    assert r["offset"] == 31337 and r["partition_idx"] == 2
    assert r["env_ts"] == 1725184800000

    # same broker through the CLI: main rows land, DDL rows don't pollute
    from kafka2iceberg_spark.__main__ import main

    main(
        [
            "source-database=chat",
            "source-table=transcripts",
            f"broker.dir={broker}",
            f"table.location={tmp_path}/tbl",
            f"checkpoint.location={tmp_path}/ckpt",
            f"ddl.location={tmp_path}/ddl_cli",
            "mode=availableNow",
        ]
    )
    main_tbl = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
    assert main_tbl.read(spark).count() == 12
    cli_ddl = IcebergLite(str(tmp_path / "ddl_cli"), pk=[])
    assert cli_ddl.read(spark).count() == 1
