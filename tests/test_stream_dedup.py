"""O1 native streaming dedup: dropDuplicatesWithinWatermark collapses
duplicate envelopes ahead of an append-only sink."""

from __future__ import annotations

import os

from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.pipeline import (
    dedup_stream,
    file_broker_stream,
    parsed_stream,
    start_append_sink,
)
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite

# heavy duplication, no deletes/updates (append-sink scenario)
CFG = GenConfig(
    n_convs=8,
    turns_per_conv=10,
    mega_convs=0,
    mega_turns=0,
    ooo_fraction=0.0,
    late_fraction=0.0,
    dup_fraction=0.4,
    delete_fraction=0.0,
)


def test_stream_dedup_collapses_duplicates(spark, tmp_path):
    broker = str(tmp_path / "broker")
    paths = write_stream_files(CFG, broker, files=3)
    for i, p in enumerate(paths):
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    spec = transcript_task()
    raw = file_broker_stream(spark, broker, max_files_per_trigger=10)
    parsed = parsed_stream(raw, spec)

    # count raw envelopes (with duplicates) vs distinct PKs
    batch_parsed = parsed_stream(
        spark.read.text(broker).select("value"), spec
    )
    n_raw = batch_parsed.count()
    n_distinct = batch_parsed.select("conv_id", "turn_idx").distinct().count()
    assert n_raw > n_distinct, "generator must emit duplicates for this test"

    table = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field="ts")
    q = start_append_sink(
        dedup_stream(parsed),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()

    rows = table.read(spark).select("conv_id", "turn_idx").collect()
    pks = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert len(pks) == len(set(pks)), "append sink received duplicate PKs"
    assert len(pks) == n_distinct
