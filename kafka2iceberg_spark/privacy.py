"""Right-to-be-forgotten: entity erasure across every table of a store.

A transcript warehouse holds one user's data in many tables (raw turns,
session summaries, pair tables, metrics side tables); a deletion request
must scrub ALL of them, survive crashes mid-way, and actually erase —
Iceberg-style time travel keeps deleted rows reachable until their
snapshots expire, a nuance most "DELETE and done" pipelines miss.

Built on the sink's CoW ``delete_range`` point-delete (manifest-stats
planning: disjoint files carried by reference, contained files dropped
metadata-only, only overlapping files rewritten — at 100 TB an
entity-clustered table erases a user by rewriting a handful of files).

Crash model: deletes run table-by-table under ONE shared ``forget_id``
replay guard per table — not atomic across tables, and deliberately so:
erasure is MONOTONE (a half-completed request leaves some tables already
scrubbed, which is strictly closer to compliance), and re-running the
same request heals to completion with committed tables as no-ops. The
verification report is the completion certificate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["forget_entity", "verify_forgotten"]


def forget_entity(
    spark: SparkSession,
    tables: dict,
    col: str,
    value,
    forget_id: str,
    expire: bool = False,
    keep_snapshots: int = 1,
) -> dict:
    """Erase every row with ``col == value`` from each named table.

    ``tables``: name → IcebergLite (each must carry ``col``). Per table:
    one replay-guarded CoW point delete (``delete_range(col, v, v)``),
    then — with ``expire=True`` — snapshot expiration down to
    ``keep_snapshots`` so the erased rows stop being time-travel
    reachable (TRUE erasure; without it the delete is only a logical
    tombstone until retention catches up). Returns per-table surgery
    counts ({} for replayed no-ops).
    """
    report = {}
    for name, table in tables.items():
        res = table.delete_range(
            spark, col, lo=value, hi=value,
            batch_id=f"forget:{forget_id}:{name}",
        )
        if expire:
            table.expire_snapshots(keep_last=keep_snapshots)
        report[name] = res or {}
    return report


def verify_forgotten(
    spark: SparkSession,
    tables: dict,
    col: str,
    value,
) -> DataFrame:
    """Completion certificate: per table, rows remaining and rows still
    matching the erased entity (must be 0). One metadata-pruned scan per
    table — the same manifest stats that planned the delete prove most
    files can't contain the entity without opening them."""
    parts = []
    for name, table in tables.items():
        df = table.read(spark)
        parts.append(
            df.agg(
                F.lit(name).alias("table"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    (F.col(col) == F.lit(value)).cast("long")
                ).alias("n_entity_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "table", "n_rows", F.coalesce("n_entity_rows", F.lit(0)).alias(
            "n_entity_rows"
        )
    )
