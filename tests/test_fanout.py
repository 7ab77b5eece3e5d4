"""Fan-out sink (pipeline.start_fanout_sink): one multiplexed CDC stream
lands every routed table atomically — per-table parity with the
single-table pipeline run over the same traffic, atomic multi-table
versions, and replay no-ops."""

from __future__ import annotations

import os

from kafka2iceberg_spark import gen, pipeline
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite
from kafka2iceberg_spark.transactions import CatalogLite

CFG_A = gen.GenConfig(n_convs=12, turns_per_conv=8, mega_convs=0, seed=3,
                      table="transcripts")
CFG_B = gen.GenConfig(n_convs=7, turns_per_conv=5, mega_convs=0, seed=9,
                      table="audit")


def _mixed_broker(tmp_path, files=4) -> str:
    """Interleave two tables' envelopes into one broker directory —
    a multiplexed topic."""
    import json

    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    envs = gen.envelopes(CFG_A) + gen.envelopes(CFG_B)
    envs.sort(key=lambda e: (e["ts"], e["table"], e["_partition"], e["_offset"]))
    chunk = max(1, (len(envs) + files - 1) // files)
    for i in range(0, len(envs), chunk):
        p = os.path.join(broker, f"batch-{i // chunk:05d}.jsonl")
        with open(p, "w") as fh:
            for e in envs[i : i + chunk]:
                fh.write(json.dumps(e, separators=(",", ":")) + "\n")
        os.utime(p, (1000 + i, 1000 + i))
    return broker


def _run_fanout(spark, tmp_path, broker):
    cat = CatalogLite(str(tmp_path / "cat"))
    spec_a = transcript_task(table="transcripts")
    spec_b = transcript_task(table="audit")
    cat.register(
        "t_a", IcebergLite(str(tmp_path / "t_a"), pk=spec_a.primary_keys)
    )
    cat.register(
        "t_b", IcebergLite(str(tmp_path / "t_b"), pk=spec_b.primary_keys)
    )
    raw = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=2)
    q = pipeline.start_fanout_sink(
        raw, [spec_a, spec_b], cat, ["t_a", "t_b"],
        str(tmp_path / "ckpt"), trigger={"availableNow": True},
    )
    q.awaitTermination()
    return cat


def _single_table_rows(spark, tmp_path, cfg, spec, tag):
    """The existing single-table pipeline over the same (mixed) broker —
    the parity reference."""
    broker = str(tmp_path / f"broker_{tag}")
    gen.write_stream_files(cfg, broker, files=4)
    t = IcebergLite(str(tmp_path / f"single_{tag}"), pk=spec.primary_keys)
    pipeline.run_ingest_once(
        spark, broker, spec, t, str(tmp_path / f"ckpt_{tag}")
    )
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(spark).collect()
    }


def test_fanout_matches_single_table_runs(spark, tmp_path):
    broker = _mixed_broker(tmp_path)
    cat = _run_fanout(spark, tmp_path, broker)
    got_a = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cat.read(spark, "t_a").collect()
    }
    got_b = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in cat.read(spark, "t_b").collect()
    }
    want_a = _single_table_rows(
        spark, tmp_path, CFG_A, transcript_task(table="transcripts"), "a"
    )
    want_b = _single_table_rows(
        spark, tmp_path, CFG_B, transcript_task(table="audit"), "b"
    )
    # exact per-key text equality with the pure single-table runs proves
    # both routing (no foreign rows) and parse parity on mixed traffic
    assert got_a == want_a and len(got_a) > 50
    assert got_b == want_b and len(got_b) > 20


def test_fanout_atomic_versions_and_replay(spark, tmp_path):
    broker = _mixed_broker(tmp_path, files=3)
    cat = _run_fanout(spark, tmp_path, broker)
    v = cat.current_version()
    # both tables advanced together: one catalog version per micro-batch
    # (3 broker files at 2/trigger → 2 batches) — and a full checkpoint
    # replay of the same traffic is a committed no-op
    n_a = cat.read(spark, "t_a").count()
    raw = pipeline.file_broker_stream(spark, broker, max_files_per_trigger=2)
    q = pipeline.start_fanout_sink(
        raw,
        [transcript_task(table="transcripts"), transcript_task(table="audit")],
        cat, ["t_a", "t_b"], str(tmp_path / "ckpt2"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    assert cat.current_version() == v
    assert cat.read(spark, "t_a").count() == n_a
