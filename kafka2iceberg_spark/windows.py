"""Event-time windowing (operators W1-W5, north_star CEP surface).

The reference declares flink-cep / windowing capability but never uses it
(pom.xml:276-281; its source explicitly attaches NO watermarks,
Kafka2IcebergApp.java:60-64). This module supplies the mandated surface with
Spark built-ins only — every aggregation is a hash-aggregate with map-side
partial combine, and all window assignment happens inside whole-stage codegen:

  W1 watermark            withWatermark(ts, delay)
  W2 tumbling             groupBy(window(ts, size))
  W3 sliding              groupBy(window(ts, size, slide))
  W4 session              groupBy(session_window(ts, gap), conv_id)
  W5 late-data handling   watermark-driven drop + observe() metrics

All functions are pure DataFrame transformations usable in batch AND
streaming. Window bounds are surfaced as epoch-microsecond BIGINTs
(unix_micros) so results are timezone-proof and exactly comparable across
engines.

Skew (X1): `salted_agg` breaks mega-conversation hot keys by salting the
grouping key, running the partial aggregate on (key, salt), then combining —
two shuffles but each balanced; with AQE on, the second is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WIN_STRUCTS = {"window", "session_window"}


def with_watermark(
    df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """W1 — no-op in batch mode, late-row cutoff in streaming.

    Spark event time must be TIMESTAMP (with-tz); the sink schema keeps the
    reference's TIMESTAMP_NTZ, so reinterpret here — the session TZ is pinned
    to UTC (SURVEY.md §7 hard-part e), making the cast value-preserving.
    """
    if not df.isStreaming:
        return df
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, delay)


def _flatten(out: DataFrame, keys: list[str], struct: str, prefix: str) -> DataFrame:
    aggs = [c for c in out.columns if c not in _WIN_STRUCTS and c not in keys]
    return out.select(
        F.unix_micros(F.col(f"{struct}.start")).alias(f"{prefix}_start_us"),
        F.unix_micros(F.col(f"{struct}.end")).alias(f"{prefix}_end_us"),
        *keys,
        *aggs,
    )


def tumbling(
    df: DataFrame,
    size: str,
    keys: list[str],
    aggs: list[Column],
    ts_col: str = "ts",
) -> DataFrame:
    """W2 — tumbling window aggregate (one hash-agg, map-side combine)."""
    out = df.groupBy(F.window(F.col(ts_col), size), *keys).agg(*aggs)
    return _flatten(out, list(keys), "window", "window")


def sliding(
    df: DataFrame,
    size: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    ts_col: str = "ts",
) -> DataFrame:
    """W3 — sliding window aggregate (each row lands in size/slide windows)."""
    out = df.groupBy(F.window(F.col(ts_col), size, slide), *keys).agg(*aggs)
    return _flatten(out, list(keys), "window", "window")


def sessionize(
    df: DataFrame,
    gap: str,
    keys: list[str] = ("conv_id",),
    aggs: list[Column] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """W4 — gap-closed session windows keyed by conv_id.

    Spark merges overlapping [ts, ts+gap) intervals; a quiet period ≥ gap
    closes the session. session_end = last event ts + gap (Spark semantics).

    Streaming late-data note (W5, verified empirically on this Spark
    version — tests/test_streaming_late.py): rows later than the watermark
    are NOT filtered before session aggregation; they merge into any
    still-in-state session, and a row arriving after its session was
    evicted starts a new (split) session. Emitted sessions are final —
    append mode emits each exactly once when the watermark passes its end —
    so late data degrades to session splits, never to updates of emitted
    rows. Plan parity oracles must model insert-then-evict per micro-batch,
    not a per-row late filter.
    """
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n_turns")]
    out = df.groupBy(F.session_window(F.col(ts_col), gap), *keys).agg(*aggs)
    return _flatten(out, list(keys), "session_window", "session")


def late_rows_batch(
    df: DataFrame,
    delay_seconds: int,
    ts_col: str = "ts",
    arrival_col: str = "arrival_seq",
) -> DataFrame:
    """W5 batch emulation of the streaming late-drop policy.

    A row is late iff its event time is older than (watermark at its
    arrival), where the watermark is the running max event time over all
    *previously arrived* rows minus the delay. Parity tests use this to
    compute, in batch, exactly the rows a streaming run would drop. Adds
    ``is_late``. The global ordering window is single-partition — use only on
    per-test inputs, never at scale (streaming handles this natively there).
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(arrival_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    running_max = F.max(F.unix_micros(F.col(ts_col))).over(w)
    return df.withColumn(
        "is_late",
        F.coalesce(
            F.unix_micros(F.col(ts_col))
            < (running_max - F.lit(delay_seconds * 1_000_000)),
            F.lit(False),
        ),
    )


def salted_agg(
    df: DataFrame,
    key: str,
    n_salts: int,
    count_col: str = "n",
) -> DataFrame:
    """X1 — skew-safe count per hot key: partial agg on (key, salt), then
    final combine. The salt spreads a mega-conversation over n_salts tasks."""
    salted = df.withColumn(
        "_salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias(count_col))
