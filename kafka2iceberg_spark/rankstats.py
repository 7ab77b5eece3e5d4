"""Rank-based statistics: per-group Pareto fronts and Spearman correlation.

Both are classic OLAP asks the reference's Iceberg tables exist to serve
(the reference itself computes nothing — DeserializedSchema.java:157-171 is
its entire function surface). Both are implemented as per-group WINDOW
passes: hash-partition on the group key, sort only within the partition —
no global sort anywhere, so the plan is one exchange + one in-partition
sort regardless of total data size.

Determinism discipline (shared with timeseries.py): monetary values ride as
exact BIGINT cents, ranks come from row_number with a total-order tiebreak,
and Spearman's rho is computed from the exact integer sum of squared rank
differences — one final division, identical in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pareto_front(
    df: DataFrame,
    group_col: str,
    min_col: str,
    max_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Pareto front (skyline): rows not dominated on
    (minimise ``min_col``, maximise ``max_col``).

    Dominance here is the strict-or-duplicate form: q is off the front if
    some p has (p.min < q.min and p.max >= q.max) or (p.min <= q.min and
    p.max > q.max), or p ties q exactly on both and wins the ``tiebreak``
    (duplicates keep exactly one representative — set semantics).

    The O(n log n) single-pass recipe instead of the O(n²) NOT-EXISTS
    self-join: sort each group by (min_col asc, max_col desc, tiebreak),
    keep a row iff its max_col strictly exceeds the running max over all
    preceding rows — every preceding row is no-worse on min_col, so
    "strictly better on max_col than all of them" is exactly
    non-dominance. One window per group partition; the DuckDB oracle uses
    the independent quadratic NOT-EXISTS formulation.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(
            F.asc(min_col), F.desc(max_col), F.asc(tiebreak_col)
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_max = F.max(max_col).over(w)
    return (
        df.withColumn("_run_max", run_max)
        .filter(
            F.col("_run_max").isNull()
            | (F.col(max_col) > F.col("_run_max"))
        )
        .drop("_run_max")
    )


def spearman(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation, rank-tiebreak variant:

        rho = 1 - 6 * sum(d_i^2) / (n * (n^2 - 1)),  d_i = rank_x - rank_y

    Ranks are row_number() over (x desc, tiebreak) / (y desc, tiebreak) —
    the total-order variant (ties broken by a unique key) rather than
    average-rank, which keeps every intermediate an exact BIGINT: sum(d²)
    aggregates integers, and the single final division is the only float.
    Groups of n < 2 have no defined rho and are NULL via try_divide.

    Scale shape: two windows over the SAME per-group hash partition (one
    exchange, two in-partition sorts), then one partial-agg sum per group.
    """
    wx = Window.partitionBy(group_col).orderBy(
        F.desc(x_col), F.asc(tiebreak_col)
    )
    wy = Window.partitionBy(group_col).orderBy(
        F.desc(y_col), F.asc(tiebreak_col)
    )
    d: Column = F.row_number().over(wx) - F.row_number().over(wy)
    agg = (
        df.select(
            group_col, (d.cast("long") * d.cast("long")).alias("_d2")
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_d2").alias("_sd2"),
        )
    )
    n = F.col("n")
    return agg.select(
        group_col,
        "n",
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.lit(6) * F.col("_sd2"),
                n * (n * n - F.lit(1)),
            ),
            6,
        ).alias("rho"),
    )
