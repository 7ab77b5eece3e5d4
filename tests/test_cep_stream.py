"""Streaming variable-length CEP (cep.match_stream): stream == batch
parity on gap-closed conversations, segment splitting at silences,
cross-batch buffering, and the shared late-row drop policy."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka2iceberg_spark import cep

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("ts", TimestampType()),
    ]
)

BASE = "2024-01-01 00:"
PAT = cep.compile_pattern("user tool+ user")  # 'ut+u'


def _write_files(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.json")
        with open(p, "w") as fh:
            for c, idx, r, t in chunk:
                fh.write(
                    json.dumps(
                        {
                            "conv_id": c,
                            "turn_idx": idx,
                            "role": r,
                            "ts": t,
                        }
                    )
                    + "\n"
                )
        os.utime(p, (1000 + i, 1000 + i))


def _run_stream(spark, tmp_path, chunks, gap_seconds=600, name="cep_out"):
    src = str(tmp_path / "src")
    _write_files(src, chunks)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = cep.match_stream(
        stream, PAT, gap_seconds=gap_seconds, watermark_delay="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


def _span_rows(df):
    return sorted(
        (
            r["conv_id"],
            r["match_seq"],
            r["start_turn"],
            r["end_turn"],
            r["match_len"],
            r["span_us"],
        )
        for r in df.collect()
    )


def test_match_stream_equals_batch(spark, tmp_path):
    # conv A: u t t u t u  -> greedy non-overlap: 'utt u' then no second
    #   ('uttu' consumes turns 0-3; remaining 'tu' has no leading u... the
    #   suffix is 't u' -> no match) = exactly what match_spans yields.
    # conv B: u a u (no tool) -> no match.
    rows = [
        ("A", 0, "user", BASE + "00:00"),
        ("A", 1, "tool", BASE + "00:30"),
        ("A", 2, "tool", BASE + "01:00"),
        ("A", 3, "user", BASE + "01:30"),
        ("A", 4, "tool", BASE + "02:00"),
        ("A", 5, "user", BASE + "02:30"),
        ("B", 0, "user", BASE + "00:10"),
        ("B", 1, "assistant", BASE + "00:40"),
        ("B", 2, "user", BASE + "01:10"),
    ]
    sentinel = [("ZZ", 0, "user", "2030-01-01 00:00:00")]
    early = [r for r in rows if r[3] <= BASE + "01:00"]
    late = [r for r in rows if r[3] > BASE + "01:00"]
    got = _span_rows(
        _run_stream(spark, tmp_path, [early, late, sentinel])
    )

    batch = spark.createDataFrame(
        [(c, i, r, t) for c, i, r, t in rows],
        "conv_id string, turn_idx int, role string, ts string",
    ).selectExpr("conv_id", "turn_idx", "role", "cast(ts as timestamp) ts")
    want = _span_rows(cep.match_spans(batch, PAT))
    assert got == want
    # A folds to 'uttutu': greedy leftmost takes 'uttu' (turns 0-3) and
    # the 'tu' tail cannot restart a match; B has no tool turn at all.
    assert got == [("A", 0, 0, 3, 4, 90_000_000)]


def test_match_stream_splits_on_gap(spark, tmp_path):
    # one conv with a silence longer than the gap: each burst is matched
    # as its own closed segment, match_seq restarting per segment.
    rows = [
        ("A", 0, "user", BASE + "00:00"),
        ("A", 1, "tool", BASE + "00:30"),
        ("A", 2, "user", BASE + "01:00"),
        # 30-minute silence >> 600 s gap
        ("A", 3, "user", BASE + "31:00"),
        ("A", 4, "tool", BASE + "31:30"),
        ("A", 5, "user", BASE + "32:00"),
    ]
    sentinel = [("ZZ", 0, "user", "2030-01-01 00:00:00")]
    got = _span_rows(
        _run_stream(spark, tmp_path, [rows[:3], rows[3:], sentinel])
    )
    assert got == [
        ("A", 0, 0, 2, 3, 60_000_000),
        ("A", 0, 3, 5, 3, 60_000_000),
    ]


def test_match_stream_buffers_across_batches_and_drops_late(
    spark, tmp_path
):
    # the match spans two micro-batches; a late row (ts behind the
    # watermark once the sentinel advances it) is dropped, so turn 9
    # never appears in any match.
    first = [
        ("A", 0, "user", BASE + "00:00"),
        ("A", 1, "tool", BASE + "00:30"),
    ]
    second = [("A", 2, "user", BASE + "01:00")]
    advance = [("Y", 0, "user", "2024-01-01 06:00:00")]
    late = [("A", 9, "tool", BASE + "02:00")]  # behind watermark now
    sentinel = [("ZZ", 0, "user", "2030-01-01 00:00:00")]
    got = _span_rows(
        _run_stream(
            spark, tmp_path, [first, second, advance, late, sentinel]
        )
    )
    assert got == [("A", 0, 0, 2, 3, 60_000_000)]
