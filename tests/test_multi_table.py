"""P3 routing in its production role: one broker carries envelopes for
multiple (database, table) sources; each pipeline instance ingests only its
own rows (the reference's multi-task deployment shape, task.json per table).
"""

from __future__ import annotations

import os
import shutil

from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.pipeline import run_ingest_once
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite


def test_two_tables_one_broker(spark, tmp_path):
    cfg_a = GenConfig(n_convs=6, turns_per_conv=5, mega_convs=0, mega_turns=0,
                      dup_fraction=0, delete_fraction=0,
                      database="chat", table="transcripts")
    cfg_b = GenConfig(n_convs=4, turns_per_conv=7, mega_convs=0, mega_turns=0,
                      dup_fraction=0, delete_fraction=0, seed=99,
                      database="chat", table="audit_log")
    a_files = write_stream_files(cfg_a, str(tmp_path / "a"), files=2)
    b_files = write_stream_files(cfg_b, str(tmp_path / "b"), files=2)

    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    for i, p in enumerate(a_files + b_files):
        dst = f"{broker}/{i:02d}-{os.path.basename(p)}"
        shutil.copy(p, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    spec_a = transcript_task("chat", "transcripts")
    spec_b = transcript_task("chat", "audit_log")

    tbl_a = IcebergLite(str(tmp_path / "tbl_a"), pk=spec_a.primary_keys)
    tbl_b = IcebergLite(str(tmp_path / "tbl_b"), pk=spec_b.primary_keys)
    run_ingest_once(spark, broker, spec_a, tbl_a, str(tmp_path / "ck_a"))
    run_ingest_once(spark, broker, spec_b, tbl_b, str(tmp_path / "ck_b"))

    n_a = tbl_a.read(spark).count()
    n_b = tbl_b.read(spark).count()
    assert n_a == 6 * 5
    assert n_b == 4 * 7
    # no cross-contamination: conversation id spaces are seed-disjoint sizes
    convs_a = {r["conv_id"] for r in tbl_a.read(spark).select("conv_id").distinct().collect()}
    convs_b = {r["conv_id"] for r in tbl_b.read(spark).select("conv_id").distinct().collect()}
    assert len(convs_a) == 6 and len(convs_b) == 4
