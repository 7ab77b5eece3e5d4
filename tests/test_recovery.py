"""Checkpoint recovery / exactly-once across restarts (north_rule: "resumable
from checkpoint ... re-emitting zero duplicate rows").

Strategy: feed the simulated broker in two phases against the SAME
checkpoint — run 1 sees half the files, stops (the "crash"), run 2 restarts
from the checkpoint with the rest present. The final table must equal a
single-shot reference run (same rows, no duplicates), with snapshot versions
strictly incremental and batch ids disjoint.
"""

from __future__ import annotations

import os
import shutil

import pytest

from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.pipeline import run_ingest_once
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite

CFG = GenConfig(n_convs=12, turns_per_conv=12, mega_convs=1, mega_turns=50)


def _feed(src_files, dst, n):
    os.makedirs(dst, exist_ok=True)
    for i, p in enumerate(src_files[:n]):
        out = os.path.join(dst, os.path.basename(p))
        shutil.copy(p, out)
        os.utime(out, (1_700_000_000 + i, 1_700_000_000 + i))


@pytest.fixture()
def spec():
    return transcript_task()


def _rows(spark, table):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in table.read(spark).collect()
    )


def test_two_phase_resume_no_duplicates(spark, tmp_path, spec):
    staged = write_stream_files(CFG, str(tmp_path / "staged"), files=8)

    # reference: single-shot run over everything
    ref_broker = str(tmp_path / "ref_broker")
    _feed(staged, ref_broker, 8)
    ref_tbl = IcebergLite(str(tmp_path / "ref_tbl"), pk=spec.primary_keys)
    run_ingest_once(spark, ref_broker, spec, ref_tbl, str(tmp_path / "ref_ck"))
    ref = _rows(spark, ref_tbl)
    assert len(ref) > 0

    # phase 1: half the stream, then "crash" (query stops at availableNow)
    broker = str(tmp_path / "broker")
    ck = str(tmp_path / "ck")
    tbl = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
    _feed(staged, broker, 4)
    run_ingest_once(spark, broker, spec, tbl, ck)
    v_mid = tbl.current_version()
    assert v_mid >= 1

    # phase 2: rest of the stream arrives; restart from the SAME checkpoint
    _feed(staged, broker, 8)
    run_ingest_once(spark, broker, spec, tbl, ck)

    got = _rows(spark, tbl)
    assert got == ref, "resumed run diverges from single-shot reference"
    # no duplicate PKs
    pks = [(c, t) for c, t, _ in got]
    assert len(pks) == len(set(pks))
    assert tbl.current_version() > v_mid
    # batch ids disjoint and complete in lineage
    batches = [rec["batch_id"] for rec in tbl.lineage()]
    assert len(batches) == len(set(batches))


def test_replay_after_commit_is_skipped(spark, tmp_path, spec):
    """Re-running a fully-committed checkpoint changes nothing (K3)."""
    staged = write_stream_files(CFG, str(tmp_path / "staged"), files=4)
    broker = str(tmp_path / "broker")
    _feed(staged, broker, 4)
    tbl = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
    ck = str(tmp_path / "ck")
    run_ingest_once(spark, broker, spec, tbl, ck)
    before_rows = _rows(spark, tbl)
    before_v = tbl.current_version()
    run_ingest_once(spark, broker, spec, tbl, ck)
    assert tbl.current_version() == before_v
    assert _rows(spark, tbl) == before_rows


def test_per_turn_text_parity_with_generator(spark, tmp_path, spec):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering vs the generator's ground truth, after the
    full envelope → parse → upsert → delete pipeline."""
    from kafka2iceberg_spark.gen import envelopes, turns

    staged = write_stream_files(CFG, str(tmp_path / "staged"), files=4)
    broker = str(tmp_path / "broker")
    _feed(staged, broker, 4)
    tbl = IcebergLite(str(tmp_path / "tbl"), pk=spec.primary_keys)
    run_ingest_once(spark, broker, spec, tbl, str(tmp_path / "ck"))

    # expected: last envelope op per PK wins (offset order per partition)
    last_op: dict[tuple, str] = {}
    texts: dict[tuple, str] = {}
    for e in envelopes(CFG):
        d = e["data"][0]
        k = (d["conv_id"], int(d["turn_idx"]))
        last_op[k] = e["type"]
        texts[k] = d["text"]
    expected = sorted(
        (c, t, texts[(c, t)])
        for (c, t), op in last_op.items()
        if op != "DELETE"
    )
    assert _rows(spark, tbl) == expected


def test_pairs_join_impl_resume_no_duplicates(spark, tmp_path, spec):
    """The JVM stream-stream pairs branch (dedup → join → append sink) must
    also resume from its checkpoint with zero duplicate emissions: Spark
    restores both join sides' state and the dedup state, and the sink's
    batch-id guard absorbs any replayed trigger."""
    import json as _json

    from kafka2iceberg_spark.pipeline import (
        file_broker_stream,
        parsed_stream,
        start_pairs_sink,
    )

    cfg = GenConfig(n_convs=10, turns_per_conv=8, mega_convs=0, mega_turns=0,
                    ooo_fraction=0, late_fraction=0, dup_fraction=0,
                    delete_fraction=0)
    staged = write_stream_files(cfg, str(tmp_path / "staged"), files=6)
    # far-future sentinel advances the watermark so trailing state flushes
    sentinel = str(tmp_path / "staged" / "zz.jsonl")
    with open(sentinel, "w") as fh:
        fh.write(_json.dumps({
            "data": [{"conv_id": "zzz", "turn_idx": "0", "role": "user",
                      "text": "s", "tool": "null",
                      "ts": "2030-01-01 00:00:00"}],
            "database": "chat", "table": "transcripts", "type": "INSERT",
            "isDdl": False, "ts": 1893456000000, "es": 1893456000000,
            "old": None, "pkNames": ["conv_id", "turn_idx"], "sql": "",
            "_offset": 9999999, "_partition": 0,
        }) + "\n")
    staged = list(staged) + [sentinel]

    def run(broker, tbl, ck):
        q = start_pairs_sink(
            parsed_stream(file_broker_stream(spark, broker, 2), spec),
            tbl,
            ck,
            trigger={"availableNow": True},
            impl="join",
        )
        q.awaitTermination()

    def pair_rows(t):
        return sorted(
            (r.conv_id, r.user_turn_idx, r.reply_turn_idx, r.reply_text)
            for r in t.read(spark)
            .where("conv_id <> 'zzz' AND reply_text IS NOT NULL")
            .collect()
        )

    # single-shot reference
    ref_broker = str(tmp_path / "ref_broker")
    _feed(staged, ref_broker, 7)
    ref_tbl = IcebergLite(str(tmp_path / "ref_tbl"), pk=[],
                          partition_field=None)
    run(ref_broker, ref_tbl, str(tmp_path / "ref_ck"))
    ref = pair_rows(ref_tbl)
    assert ref

    # two-phase resume against the same checkpoint
    broker = str(tmp_path / "broker")
    tbl = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field=None)
    ck = str(tmp_path / "ck")
    _feed(staged, broker, 3)
    run(broker, tbl, ck)
    _feed(staged, broker, 7)
    run(broker, tbl, ck)

    got = pair_rows(tbl)
    assert got == ref, "resumed join-impl run diverges from single-shot"
    keys = [(c, u) for c, u, _, _ in got]
    assert len(keys) == len(set(keys)), "duplicate pair emissions"
