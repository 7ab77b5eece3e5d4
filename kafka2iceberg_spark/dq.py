"""Data-quality constraint verification (Deequ-style) — single-pass.

A 100 TB ingest pipeline gates publishes on declarative quality checks:
completeness (non-null fraction), key uniqueness, value bounds, and
set membership. The reference has only a hard not-null throw inside its
deserializer (DeserializedSchema.java:151-156); this module generalizes
that into a verification report computed in ONE distributed aggregate
pass over the table — every metric is an algebraic aggregate, so the
scan reads the table once, combines map-side, and reduces to a single
row regardless of input size. Only `unique` adds distinct aggregates
(Spark plans them via one Expand over the same scan — still a single
job; at extreme cardinality swap in the HLL sketch from sketches.py).

The single aggregated row is then unpivoted declaratively (stack) into
one row per constraint — no driver-side collect in the plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative check. kind in {completeness, unique, bounds,
    membership, non_negative}; threshold is the minimum metric value for
    `passed` (completeness/membership default 1.0)."""

    kind: str
    column: str
    threshold: float = 1.0
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default_factory=tuple)

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def completeness(column: str, threshold: float = 1.0) -> Constraint:
    return Constraint("completeness", column, threshold)


def unique(column: str) -> Constraint:
    return Constraint("unique", column)


def bounds(column: str, lo: float, hi: float) -> Constraint:
    return Constraint("bounds", column, lo=lo, hi=hi)


def membership(column: str, values, threshold: float = 1.0) -> Constraint:
    return Constraint("membership", column, threshold, values=tuple(values))


def non_negative(column: str) -> Constraint:
    return Constraint("non_negative", column)


def _metric(c: Constraint, total: Column) -> Column:
    """Metric in [0,1] as an exact-integer ppm ratio where possible
    (parity-safe: both engines divide the same two BIGINTs)."""
    col = F.col(c.column)
    if c.kind == "completeness":
        return F.count(col) / total
    if c.kind == "unique":
        return F.count_distinct(col) / total
    if c.kind == "bounds":
        return (
            F.sum(
                ((col >= F.lit(c.lo)) & (col <= F.lit(c.hi))).cast("long")
            )
            / total
        )
    if c.kind == "membership":
        return (
            F.sum(col.isin(list(c.values)).cast("long")) / total
        )
    if c.kind == "non_negative":
        return F.sum((col >= 0).cast("long")) / total
    raise ValueError(f"unknown constraint kind: {c.kind}")


def verify(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """One scan -> (constraint, column, metric, threshold, passed) rows.

    The report stays a DataFrame end to end: a global aggregate produces
    one row of metrics, and a `stack` projection unpivots it — Catalyst
    sees scan -> partial agg -> final agg -> generate, nothing touches
    the driver.
    """
    if not constraints:
        raise ValueError("no constraints given")
    total = F.count(F.lit(1))
    aggs = [
        F.round(_metric(c, total), 9).alias(f"m{i}")
        for i, c in enumerate(constraints)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c.name}', '{c.column}', double(m{i}), double({c.threshold})"
        for i, c in enumerate(constraints)
    )
    report = one.select(
        F.expr(
            f"stack({len(constraints)}, {stack_args}) "
            "as (constraint, column, metric, threshold)"
        )
    )
    return report.withColumn(
        "passed", (F.col("metric") >= F.col("threshold"))
    )


def profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Single-pass column profiling — the *analyzer* half of a Deequ/TFDV
    style DQ suite (``verify`` above is the assertion half): per column,
    row count, null count, exact distinct count, and min/max rendered as
    strings, one report row per column.

    ONE scan: a global aggregate computes every metric for every column,
    then a ``stack`` projection unpivots the single metrics row — scan →
    partial agg → final agg → generate, nothing on the driver. Scale note:
    multiple exact count_distinct over different columns plan through
    Spark's Expand (k× row amplification *before* the partial aggregate);
    at 100 TB profile in column batches or swap exact distincts for
    approx_count_distinct (HLL, no Expand) — exact is kept here because
    the DuckDB oracle must hash-match. min/max are computed on the native
    type (so numeric order, not lexicographic) and cast to string only in
    the report; callers pre-convert DOUBLE columns to exact integer units
    (cents) because float→string rendering differs across engines.
    """
    if not columns:
        raise ValueError("no columns given")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"nn{i}"),
            F.count_distinct(col).alias(f"nd{i}"),
            F.min(col).cast("string").alias(f"mn{i}"),
            F.max(col).cast("string").alias(f"mx{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n, __n - nn{i}, nd{i}, mn{i}, mx{i}"
        for i, c in enumerate(columns)
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) "
            "as (column, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


def key_skew(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Hot-key skew report — the diagnostic read *before* choosing a salt
    factor or enabling AQE skew-join on a key (X1's measurement half;
    ``windows.salted_agg`` is the mitigation half).

    Per heaviest key: row count, its share of all rows (ppm), and its
    multiple of the mean key load (ppm — 1_000_000 ≡ exactly average).
    A mega-conversation at 40× mean tells you the session/join stage
    needs ~40 salts before you ship it, not after it straggles.

    Scale shape: one partial-aggregated groupBy(key) (map-side combine
    shrinks the shuffle to |keys|), a TakeOrdered top-k (per-partition
    heap + driver merge of k rows — never a global sort), and two scalar
    totals broadcast back over the k survivors. Ties broken by key so
    both engines select identical rows. All outputs exact integers.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("n_rows"), F.col(key)).limit(top_k)
    w = Window.orderBy(F.desc("n_rows"), F.col(key))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            "rnk",
            key,
            "n_rows",
            F.expr("CAST(n_rows * 1000000 DIV _total AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                "CAST(n_rows * n_keys * 1000000 DIV _total AS BIGINT)"
            ).alias("x_mean_ppm"),
        )
    )


def k_anonymity(
    df,
    quasi_cols: list[str],
    k: int = 5,
):
    """k-anonymity audit over a quasi-identifier combination — the privacy
    gate a dataset release runs after PII redaction (textops.redact_pii
    removes direct identifiers; this catches the INDIRECT ones: a
    (source, lang, length-bucket) combo shared by only two documents
    re-identifies them, Sweeney 2002).

    One hash aggregate on the quasi-identifier tuple (map-side combined —
    the only data-volume pass), then a rollup: every equivalence class
    with its size and at-risk flag, plus per-class share of total rows in
    exact ppm. The caller buckets continuous columns BEFORE the call
    (raw values make every class a singleton, which is a modeling error,
    not a finding).

    Output: one row per equivalence class — (quasi cols..., class_size,
    at_risk = class_size < k, share_ppm).
    """
    from pyspark.sql import functions as F

    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    total = classes.agg(
        F.sum("class_size").cast("long").alias("_total")
    )
    out = classes.crossJoin(F.broadcast(total))
    return out.select(
        *quasi_cols,
        "class_size",
        (F.col("class_size") < F.lit(k)).alias("at_risk"),
        F.expr("class_size * 1000000 div _total")
        .cast("long")
        .alias("share_ppm"),
    )


def l_diversity(
    df,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
):
    """l-diversity audit — the k-anonymity follow-up (Machanavajjhala et
    al. 2007): an equivalence class can be large (k-anonymous) yet still
    leak if every member shares the SAME sensitive value (homogeneity
    attack). Each quasi-identifier class is graded by how many distinct
    sensitive values it contains.

    One hash aggregate on (quasi..., sensitive) — map-side combined, the
    only data-volume pass — then a class-level rollup counting distinct
    sensitive values exactly (the first agg already deduplicated them).

    Output: one row per equivalence class — (quasi cols..., class_size,
    n_sensitive, at_risk = n_sensitive < l).
    """
    from pyspark.sql import functions as F

    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.sum("_n").cast("long").alias("class_size"),
        F.count(F.lit(1)).cast("long").alias("n_sensitive"),
    )
    return classes.select(
        *quasi_cols,
        "class_size",
        "n_sensitive",
        (F.col("n_sensitive") < F.lit(l)).alias("at_risk"),
    )


def t_closeness(
    df,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = 200_000,
):
    """t-closeness audit — the l-diversity follow-up (Li, Li &
    Venkatasubramanian 2007): a class can hold l distinct sensitive values
    and still leak if its distribution is SKEWED relative to the corpus
    (a class that is 95% one language reveals language membership even
    with 3 languages present). Each quasi-identifier class is graded by
    the total-variation distance between its sensitive-value distribution
    and the global one, in exact integer ppm (TVD is the canonical
    categorical instantiation of the paper's EMD).

    Contract: a NULL sensitive value IS a domain value — "language
    unknown" is itself an attribute an attacker can learn, so NULL gets
    its own domain row and contributes to class_size, the global
    distribution, and per-class TVD exactly like any other value (the
    cell join is null-safe to make this hold).

    Scale shape: two hash aggregates over the (quasi, sensitive) cell
    relation (map-side combined — the only data-volume pass), a broadcast
    of the |sensitive-domain|-sized global distribution crossed onto the
    classes (TVD must count domain values ABSENT from a class), and one
    cell-level left join. The sensitive attribute is categorical by
    contract — the domain is small, so |classes| x |domain| stays the
    same order as the cell relation.

    Output: one row per equivalence class — (quasi cols..., class_size,
    tvd_ppm, at_risk = tvd_ppm > t_ppm). All arithmetic is exact integer
    (ppm shares via integer division), engine-portable.
    """
    from pyspark.sql import functions as F

    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.sum("_n").cast("long").alias("class_size")
    )
    glob = cells.groupBy(sensitive_col).agg(
        F.sum("_n").cast("long").alias("_gn")
    )
    total = glob.agg(F.sum("_gn").cast("long").alias("_total"))
    domain = glob.crossJoin(F.broadcast(total)).select(
        sensitive_col,
        F.expr("_gn * 1000000 div _total").cast("long").alias("_gp"),
    )
    # every class x every domain value; absent cells contribute p_class=0.
    # NULL is a first-class domain value: GROUP BY already buckets NULL
    # sensitive values into their own cell/domain row, so the cell join
    # must be null-safe (eqNullSafe) or those rows would inflate
    # class_size and the global total while never matching — distorting
    # TVD for any class containing NULLs.
    cells_j = cells.select(
        *[F.col(c).alias(f"_cj_{c}") for c in quasi_cols],
        F.col(sensitive_col).alias("_cj_s"),
        "_n",
    )
    cond = F.col(sensitive_col).eqNullSafe(F.col("_cj_s"))
    for c in quasi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_cj_{c}"))
    expanded = (
        classes.crossJoin(F.broadcast(domain))
        .join(cells_j, cond, "left")
    )
    per_value = expanded.select(
        *quasi_cols,
        "class_size",
        F.abs(
            F.expr("coalesce(_n, 0) * 1000000 div class_size") - F.col("_gp")
        ).cast("long").alias("_d"),
    )
    return per_value.groupBy(*quasi_cols, "class_size").agg(
        F.expr("sum(_d) div 2").cast("long").alias("tvd_ppm"),
    ).select(
        *quasi_cols,
        "class_size",
        "tvd_ppm",
        (F.col("tvd_ppm") > F.lit(t_ppm)).alias("at_risk"),
    )


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    order_col: str,
    epsilon_ppm: int = 1_000_000,
    row_cap: int = 8,
    group_cap: int = 4,
    release_id: str = "release-1",
) -> DataFrame:
    """Differentially-private per-group counts: the Laplace mechanism with
    per-entity contribution bounding (Dwork et al. 2006; the SQL shape
    follows Wilson et al. 2020, "Differentially Private SQL with Bounded
    User Contribution").

    A raw ``GROUP BY lang`` count over a crawled corpus leaks membership:
    adding one contributor's documents moves a published count by an
    unbounded amount. The release becomes eps-DP by (1) bounding what any
    one entity can contribute — at most ``row_cap`` rows per group
    (row_number per (entity, group), stable order) and at most
    ``group_cap`` distinct groups per entity (rank groups per entity by a
    stable hash) — so global sensitivity is exactly ``row_cap *
    group_cap`` — and (2) adding Laplace(sensitivity/eps) noise to each
    bounded count.

    The noise draw is PINNED: u = (h60(release_id || ':' || group) + 0.5)
    / 2^60 in (0,1), X = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|) — the
    exact inverse-CDF Laplace transform, reproducible in any engine. DP
    holds against consumers of the release when ``release_id`` is a
    secret high-entropy seed (it plays the PRNG-seed role); pinning is
    what lets an independent oracle replay the release bit-for-bit and
    lets a re-run publish identical numbers instead of burning privacy
    budget twice.

    Scale shape: two windows partitioned by entity (bounding), one
    partial-agg groupBy(group) (counting), noise as a literal expression
    per output row — output is |groups| rows, no collect, no second scan.

    Output: (group_col, released_count double). True counts never leave
    the plan. epsilon_ppm is exact-integer ppm (1_000_000 = eps 1.0).
    """
    from .textops import hash64 as _h60

    # 1. bound rows per (entity, group)
    w_rows = Window.partitionBy(entity_col, group_col).orderBy(order_col)
    bounded = (
        df.select(entity_col, group_col, order_col)
        .withColumn("_rn", F.row_number().over(w_rows))
        .where(F.col("_rn") <= row_cap)
    )
    # 2. bound groups per entity: keep the group_cap smallest group hashes
    #    (stable, data-independent order so the bound itself leaks nothing)
    w_groups = Window.partitionBy(entity_col).orderBy(
        _h60(F.col(group_col).cast("string")), F.col(group_col)
    )
    kept_groups = (
        bounded.select(entity_col, group_col)
        .distinct()
        .withColumn("_gr", F.row_number().over(w_groups))
        .where(F.col("_gr") <= group_cap)
        .select(entity_col, group_col)
    )
    bounded = bounded.join(
        F.broadcast(kept_groups), [entity_col, group_col], "left_semi"
    )
    # 3. bounded count per group + 4. pinned Laplace noise. The release
    #    covers the table's full group domain (treated as public — for a
    #    language/country code column it is): a group all of whose rows
    #    fell to the caps still publishes its noise-only row, so absence
    #    never signals a bounded-to-zero group.
    domain = df.select(group_col).distinct()
    counts = domain.join(
        bounded.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("double").alias("_b")
        ),
        group_col,
        "left",
    ).select(group_col, F.coalesce(F.col("_b"), F.lit(0.0)).alias("_n"))
    b = F.lit(float(row_cap * group_cap) * 1_000_000.0 / float(epsilon_ppm))
    u = (
        _h60(F.concat_ws(":", F.lit(release_id), F.col(group_col).cast("string")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    noise = -b * F.signum(u - F.lit(0.5)) * F.log(
        F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    )
    return counts.select(
        group_col, (F.col("_n") + noise).alias("released_count")
    )
