"""Timeout-pattern CEP (notFollowedBy within T): stream == batch parity,
reply absolution across micro-batches, breach emission on silent streams."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka2iceberg_spark import state as st

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("role", StringType()),
    ]
)

SLA_US = 120_000_000  # 2 minutes


def _rows():
    base = "2024-01-01 00:"
    return [
        # conv A: user@0 answered at +1 min (ok); user@5min never answered
        ("A", base + "00:00", 0, "user"),
        ("A", base + "01:00", 1, "assistant"),
        ("A", base + "05:00", 2, "user"),
        # conv B: user@0 answered only at +3 min -> breach (outside SLA);
        # a tool turn must not absolve user@10
        ("B", base + "00:00", 3, "user"),
        ("B", base + "03:00", 4, "assistant"),
        ("B", base + "10:00", 5, "user"),
        ("B", base + "10:30", 6, "tool"),
    ]


def _write_files(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(chunks):
        p = os.path.join(d, f"{i:03d}.json")
        with open(p, "w") as fh:
            for c, t, e, r in chunk:
                fh.write(
                    json.dumps(
                        {"conv_id": c, "ts": t, "event_id": e, "role": r}
                    )
                    + "\n"
                )
        os.utime(p, (1000 + i, 1000 + i))


def _run(spark, tmp_path, chunks, name):
    src = str(tmp_path / "src")
    _write_files(src, chunks)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = st.sla_breaches_stream(
        stream, sla_us=SLA_US, watermark_delay="1 minute"
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
    return {
        (x["conv_id"], x["event_id"]): (
            x["ts_us"], x["deadline_us"], x["next_reply_us"], x["breached"]
        )
        for x in spark.sql(
            f"select * from {name} where conv_id not like 'zz%'"
        ).collect()
    }


def test_sla_stream_matches_batch(spark, tmp_path):
    rows = _rows()
    sentinel = [("zz", "2030-01-01 00:00:00", 999, "user")]
    early = [r for r in rows if r[1] <= "2024-01-01 00:03:00"]
    late = [r for r in rows if r[1] > "2024-01-01 00:03:00"]
    got = _run(spark, tmp_path, [early, late, sentinel], "sla_out")

    batch = spark.createDataFrame(
        rows, "conv_id string, ts string, event_id long, role string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (x["conv_id"], x["event_id"]): (
            x["ts_us"], x["deadline_us"], x["next_reply_us"], x["breached"]
        )
        for x in st.sla_breaches_batch(batch, sla_us=SLA_US).collect()
    }
    assert got == want
    # hand-checked verdicts: in-SLA reply absolves, late reply does not,
    # silence and tool turns breach
    verdicts = {k[1]: v[3] for k, v in got.items()}
    assert verdicts == {0: False, 2: True, 3: True, 5: True}

    # the absolving reply's timestamp is carried for the non-breach
    assert got[("A", 0)][2] == got[("A", 0)][0] + 60_000_000


def test_sla_stream_reply_in_later_microbatch_absolves(spark, tmp_path):
    # trigger in batch 1, reply arrives in batch 2 BEFORE the watermark
    # passes the deadline -> no breach
    b1 = [("C", "2024-01-01 00:00:00", 0, "user")]
    b2 = [("C", "2024-01-01 00:01:30", 1, "assistant")]
    sentinel = [("zz", "2030-01-01 00:00:00", 999, "user")]
    got = _run(spark, tmp_path, [b1, b2, sentinel], "sla_out2")
    assert got[("C", 0)][3] is False


def test_sla_stream_silent_stream_still_emits_breach(spark, tmp_path):
    # only the sentinel advances the watermark; the pending trigger must
    # finalize as a breach via the event-time timeout
    b1 = [("D", "2024-01-01 00:00:00", 0, "user")]
    sentinel = [("zz", "2030-01-01 00:00:00", 999, "user")]
    got = _run(spark, tmp_path, [b1, sentinel], "sla_out3")
    assert got[("D", 0)][3] is True and got[("D", 0)][2] is None
