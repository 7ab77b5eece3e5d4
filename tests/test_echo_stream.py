"""Streaming echo/loop detector: stream == batch parity, run-length
persistence across micro-batches, late-row drop policy."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka2iceberg_spark import cep

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("role", StringType()),
        StructField("signal", StringType()),
        StructField("ts", TimestampType()),
    ]
)

BASE = "2024-01-01 00:"


def _rows():
    # conv A assistant: x x x y x -> echoes at turns 2,3; runs 1,2,3,1,1
    # interleaved user turns with their own repeats
    return [
        ("A", "assistant", "x", BASE + "00:00"),
        ("A", "user", "q", BASE + "00:30"),
        ("A", "assistant", "x", BASE + "01:00"),
        ("A", "assistant", "x", BASE + "01:30"),
        ("A", "user", "q", BASE + "02:00"),
        ("A", "assistant", "y", BASE + "02:30"),
        ("A", "assistant", "x", BASE + "03:00"),
        # conv B: no echoes
        ("B", "assistant", "p", BASE + "00:10"),
        ("B", "assistant", "r", BASE + "00:40"),
    ]


def _write_files(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.json")
        with open(p, "w") as fh:
            for c, r, s, t in chunk:
                fh.write(
                    json.dumps(
                        {"conv_id": c, "role": r, "signal": s, "ts": t}
                    )
                    + "\n"
                )
        os.utime(p, (1000 + i, 1000 + i))


def test_echo_stream_matches_batch(spark, tmp_path):
    rows = _rows()
    sentinel = [("ZZ", "user", "zz", "2030-01-01 00:00:00")]
    early = [r for r in rows if r[3] <= BASE + "01:30"]
    late = [r for r in rows if r[3] > BASE + "01:30"]
    chunks = [early, late, sentinel]
    src = str(tmp_path / "src")
    _write_files(src, chunks)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = cep.echo_stream(stream, watermark_delay="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("echo_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (x["conv_id"], x["role"], x["ts_us"]): (
            x["signal"],
            x["echo"],
            x["run_len"],
        )
        for x in spark.sql(
            "select * from echo_out where conv_id != 'ZZ'"
        ).collect()
    }

    batch = spark.createDataFrame(rows, "conv_id string, role string, signal string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expected = {
        (x["conv_id"], x["role"], x["ts_us"]): (
            x["signal"],
            x["echo"],
            x["run_len"],
        )
        for x in cep.echo_flags(batch).collect()
    }
    assert got == expected
    # hand-check: the x-run reaches length 3 and y breaks it
    a_assist = sorted(
        (us, v) for (c, r, us), v in expected.items()
        if c == "A" and r == "assistant"
    )
    assert [(v[0], v[1], v[2]) for _, v in a_assist] == [
        ("x", False, 1), ("x", True, 2), ("x", True, 3),
        ("y", False, 1), ("x", False, 1),
    ]


def test_echo_stream_run_persists_across_batches(spark, tmp_path):
    # the x-run spans the chunk boundary: run_len continues, not resets
    rows = _rows()
    sentinel = [("ZZ", "user", "zz", "2030-01-01 00:00:00")]
    chunks = [[rows[0]], [rows[2]], [rows[3]], [rows[5]], [rows[6]],
              [sentinel[0]]]
    src = str(tmp_path / "src")
    _write_files(src, chunks)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = cep.echo_stream(stream, watermark_delay="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("echo_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (x["ts_us"], x["run_len"])
        for x in spark.sql(
            "select * from echo_out2 where conv_id = 'A'"
        ).collect()
    )
    assert [r for _, r in got] == [1, 2, 3, 1, 1]
