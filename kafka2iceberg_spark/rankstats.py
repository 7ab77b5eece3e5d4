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

import math

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


def winsorize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_col: str,
    lo_ppm: int = 10_000,
    hi_ppm: int = 990_000,
) -> DataFrame:
    """Per-group winsorization at EXACT rank-based percentiles — the
    standard outlier-robust feature normalization before training-data
    statistics (a p99 clip that moves with each group, not a global
    constant). Spark's ``percentile_approx`` is approximate and
    engine-specific; this uses the discrete percentile

        bound(q) = value at rank ceil(q * n)   (rank 1-based, clamped)

    computed with pure integer arithmetic (``(q_ppm*n + 999999) div 1e6``),
    so the clip bounds — and therefore every output row — are
    engine-identical.

    Plan shape: ONE per-group window pass (rank + count; hash exchange on
    keys, in-partition sort only — no global sort), one conditional
    aggregation collapsing each group to its (lo, hi) bound row, and one
    broadcast join back to the rows (bounds relation = |groups| rows).
    Ties order by (value, order_col) for a total order; equal values make
    the bound rank-order-independent anyway.

    Output: the key/order/value columns plus lo/hi bounds and the clipped
    value (``value`` unchanged when inside the bounds).
    """
    if not (0 < lo_ppm <= hi_ppm < 1_000_000):
        raise ValueError("need 0 < lo_ppm <= hi_ppm < 1e6")
    w = Window.partitionBy(*keys).orderBy(value_col, order_col)
    ranked = df.select(*keys, order_col, value_col).withColumn(
        "_r", F.row_number().over(w)
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    idx = lambda ppm: F.greatest(  # noqa: E731  (ceil via integer div)
        F.lit(1).cast("long"),
        F.expr(f"(cast({ppm} as bigint) * _n + 999999) div 1000000"),
    )
    bounds = (
        ranked.withColumn("_ilo", idx(lo_ppm))
        .withColumn("_ihi", idx(hi_ppm))
        .groupBy(*keys)
        .agg(
            F.max(
                F.when(F.col("_r") == F.col("_ilo"), F.col(value_col))
            ).alias("lo_bound"),
            F.max(
                F.when(F.col("_r") == F.col("_ihi"), F.col(value_col))
            ).alias("hi_bound"),
        )
    )
    out = df.select(*keys, order_col, value_col).join(
        F.broadcast(bounds), list(keys)
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("lo_bound")), F.col("hi_bound")
    )
    return out.withColumn(value_col + "_winsor", clipped)


def gini(
    df: DataFrame,
    weight_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gini coefficient of a non-negative weight distribution — the skew
    diagnostic that tells you BEFORE a run whether a key domain (e.g.
    per-conversation row counts) needs salting: 0 = uniform, →1 = a few
    mega-keys dominate.

    Uses the rank formulation G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) but
    NEVER ranks individual rows: equal weights are collapsed to a
    histogram first, and a tie-run of value v spanning ranks
    (c−cnt, c] contributes v·cnt·(2(c−cnt)+cnt+1) to 2·Σ i·x_(i) —
    exact arithmetic-series algebra, all BIGINT. The ordering window
    therefore runs over DISTINCT WEIGHT VALUES (for count-like weights,
    thousands at most — count distributions are heavy at small values),
    not over the key domain, so the plan survives a billion keys: one
    histogram aggregation + one tiny window + one final division.

    Output per group: (n keys, s total weight, gini rounded to 6).
    """
    g = list(group_cols or [])
    hist = (
        df.select(*g, F.col(weight_col).cast("long").alias("_v"))
        .groupBy(*g, "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy(*g).orderBy("_v")
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w))
    agg = (
        cum.select(
            *g,
            (
                F.col("_v")
                * F.col("_cnt")
                * (
                    2 * (F.col("_cum") - F.col("_cnt"))
                    + F.col("_cnt")
                    + 1
                )
            ).alias("_t2"),
            (F.col("_v") * F.col("_cnt")).alias("_s"),
            F.col("_cnt").alias("_n"),
        )
        .groupBy(*g)
        .agg(
            F.sum("_t2").alias("_T2"),
            F.sum("_s").alias("s"),
            F.sum("_n").alias("n"),
        )
    )
    return agg.select(
        *g,
        "n",
        "s",
        F.round(
            (F.col("_T2") - (F.col("n") + 1) * F.col("s"))
            / (F.col("n") * F.col("s")),
            6,
        ).alias("gini"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two labelings
    (e.g. a heuristic classifier vs gold labels), the standard eval
    metric for annotation/classifier-agreement pipelines:

        kappa = (n·po_num − pe_num) / (n² − pe_num)
        po_num = Σ diagonal counts,  pe_num = Σ_l row_l · col_l

    — the usual (po − pe)/(1 − pe) multiplied through by n², so every
    term stays an exact BIGINT and ONE final division produces the same
    IEEE double on any engine.

    Plan shape: one confusion-matrix aggregation over the pair relation
    (the only data-sized pass), then everything is |labels|-sized:
    marginals, their product join, and two 1-row cross joins. Degenerate
    case (both sides constant and equal: n² = pe_num) yields NULL.

    Output: one row — (n, po_num, pe_num, kappa).
    """
    conf = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_c"))
    rows = conf.groupBy("_a").agg(F.sum("_c").alias("_ra"))
    cols = conf.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    pe = (
        rows.join(cols, rows["_a"] == cols["_b"])
        .agg(
            F.coalesce(
                F.sum(F.col("_ra") * F.col("_cb")), F.lit(0)
            ).cast("long").alias("pe_num")
        )
    )
    tot = conf.agg(
        F.sum("_c").alias("n"),
        F.sum(
            F.when(F.col("_a") == F.col("_b"), F.col("_c")).otherwise(
                F.lit(0)
            )
        ).alias("po_num"),
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        "n",
        "po_num",
        "pe_num",
        F.round(
            # try_divide: the degenerate all-one-label case has a zero
            # denominator and must yield NULL, not an ANSI error
            F.try_divide(
                F.col("n") * F.col("po_num") - F.col("pe_num"),
                F.col("n") * F.col("n") - F.col("pe_num"),
            ),
            6,
        ).alias("kappa"),
    )


def ols2(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group least squares with TWO regressors — y ≈ b0 + b1·x1 +
    b2·x2 — the multiple-regression upgrade of ``timeseries.trend``:
    ONE aggregation pass collects the nine exact-BIGINT moment sums
    (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y) and the 3×3 normal
    equations are solved in closed form by Cramer's rule.

    Engine-exactness: the integer sums are exact and (for cent/ppm-scale
    inputs) below 2^53, so their double images are exact too; the four
    determinants use one fixed parenthesization replayed verbatim by the
    oracle — same IEEE ops, same doubles. Rank-deficient groups (constant
    or collinear regressors ⇒ zero determinant) yield NULL coefficients
    via try_divide, not an ANSI error.

    Scale shape: the moment aggregation is the only data-sized pass
    (map-side partial agg); everything after is |groups| rows.
    """
    x1, x2, y = (F.col(c).cast("long") for c in (x1_col, x2_col, y_col))
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("_s1"),
        F.sum(x2).alias("_s2"),
        F.sum(y).alias("_sy"),
        F.sum(x1 * x1).alias("_s11"),
        F.sum(x2 * x2).alias("_s22"),
        F.sum(x1 * x2).alias("_s12"),
        F.sum(x1 * y).alias("_s1y"),
        F.sum(x2 * y).alias("_s2y"),
    )
    d = {
        c: F.col(c).cast("double")
        for c in ("n", "_s1", "_s2", "_sy", "_s11", "_s22", "_s12",
                  "_s1y", "_s2y")
    }
    n, s1, s2, sy = d["n"], d["_s1"], d["_s2"], d["_sy"]
    s11, s22, s12, s1y, s2y = (
        d["_s11"], d["_s22"], d["_s12"], d["_s1y"], d["_s2y"]
    )
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return m.select(
        *group_cols,
        "n",
        F.round(F.try_divide(det0, det), 6).alias("b0"),
        F.round(F.try_divide(det1, det), 6).alias("b1"),
        F.round(F.try_divide(det2, det), 6).alias("b2"),
    )


def median_exact(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Exact per-group lower median (value at rank ceil(n/2)) — the
    deterministic discrete convention shared with :func:`winsorize`
    (engines disagree on interpolated medians; a rank-selected VALUE is
    engine-free). One per-group window pass + one conditional agg down
    to |groups| rows."""
    w = Window.partitionBy(*keys).orderBy(value_col, order_col)
    ranked = (
        df.select(*keys, order_col, value_col)
        .withColumn("_r", F.row_number().over(w))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
        )
    )
    return ranked.groupBy(*keys).agg(
        F.max(
            F.when(
                F.col("_r") == F.expr("(_n + 1) div 2"), F.col(value_col)
            )
        ).alias("median"),
    )


def mad_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_col: str,
    k_ppm: int = 3_000_000,
) -> DataFrame:
    """Robust outlier flags via the median absolute deviation — the
    breakdown-resistant alternative to z-scores (one mega-outlier drags
    a mean/sigma toward itself and masks its neighbours; medians don't
    move):

        flag(x)  iff  |x − median| * 1e6 > k_ppm * MAD,
        MAD = median of |x − median|

    Both medians are exact rank-selected values (:func:`median_exact`'s
    lower-median convention), and the comparison is pure integer
    arithmetic — no 1.4826 float scaling, no sigma estimate, so flags
    are engine-identical. Zero-MAD groups (majority at one value) flag
    everything off the median, the standard convention.

    Plan shape: two window+agg rounds over the same per-group hash
    partitioning (medians of values, then of deviations), one broadcast
    join of the |groups|-sized bounds back to the rows.
    """
    med = median_exact(df, keys, value_col, order_col)
    dev = (
        df.select(*keys, order_col, value_col)
        .join(F.broadcast(med), list(keys))
        .withColumn("_adev", F.abs(F.col(value_col) - F.col("median")))
    )
    mad = (
        median_exact(dev, keys, "_adev", order_col)
        .withColumnRenamed("median", "mad")
    )
    return (
        dev.join(F.broadcast(mad), list(keys))
        .select(
            *keys,
            order_col,
            value_col,
            "median",
            "mad",
            (
                F.col("_adev") * F.lit(1_000_000)
                > F.lit(int(k_ppm)) * F.col("mad")
            ).alias("is_outlier"),
        )
    )


def two_proportion_z(
    df: DataFrame,
    variant_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test — the A/B-test primitive: given per-unit
    (variant, success∈{0,1}) rows, test whether conversion differs
    between the two variants:

        z = (p_a − p_b) / sqrt( p̂(1−p̂) (1/n_a + 1/n_b) ),
        p̂ = pooled conversion

    The data-sized work is ONE aggregation to per-variant (n, x) exact
    BIGINT counts; the statistic is a single fixed-parenthesization
    double expression over four integers — engine-identical. Variant a =
    the lexicographically smaller label (deterministic sign). Degenerate
    pools (p̂ of 0 or 1 ⇒ zero denominator) yield NULL via try_divide.
    ``n_variants`` rides along so a mis-shaped input (≠2 variants) is
    visible rather than silently collapsed to min/max labels.

    Output: one row — (variant_a, variant_b, n_variants, n_a, x_a, n_b,
    x_b, z).
    """
    per = df.groupBy(F.col(variant_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(success_col).cast("long")).alias("_x"),
    )
    lbl = per.agg(
        F.min("_v").alias("variant_a"),
        F.max("_v").alias("variant_b"),
        F.count(F.lit(1)).alias("n_variants"),
    )
    one = (
        per.crossJoin(F.broadcast(lbl))
        .groupBy("variant_a", "variant_b", "n_variants")
        .agg(
            F.max(F.when(F.col("_v") == F.col("variant_a"), F.col("_n"))).alias("n_a"),
            F.max(F.when(F.col("_v") == F.col("variant_a"), F.col("_x"))).alias("x_a"),
            F.max(F.when(F.col("_v") == F.col("variant_b"), F.col("_n"))).alias("n_b"),
            F.max(F.when(F.col("_v") == F.col("variant_b"), F.col("_x"))).alias("x_b"),
        )
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    pool = (xa + xb) / (na + nb)
    return one.select(
        "variant_a",
        "variant_b",
        "n_variants",
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(
            F.try_divide(
                xa / na - xb / nb,
                F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)),
            ),
            6,
        ).alias("z"),
    )


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic — the
    distribution-drift test (did this week's feature distribution move
    vs last week's? does slice A match slice B?), complementing CUSUM
    (temporal drift) and PSI-style checks:

        D = max over x of | F_a(x) − F_b(x) |

    computed EXACTLY in integers: per-value counts for both samples,
    cumulative counts over the ordered distinct-value domain, and the
    sup taken over |ca·n_b − cb·n_a| (common-denominator form) so the
    only float is the final division. The ordering window runs over
    DISTINCT VALUES (the :func:`gini` discipline), never sample rows —
    a billion-row sample with a cent-scale domain costs one histogram
    aggregation and a tiny window. Group a = lexicographically smaller
    label; requires exactly two groups (``n_groups`` rides along as the
    shape check).

    Output: one row — (group_a, group_b, n_groups, n_a, n_b, d_num, d).
    """
    per = df.groupBy(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    lbl = per.agg(
        F.min("_g").alias("group_a"),
        F.max("_g").alias("group_b"),
        F.count_distinct("_g").alias("n_groups"),
    )
    byv = (
        per.crossJoin(F.broadcast(lbl))
        .groupBy("group_a", "group_b", "n_groups", "_v")
        .agg(
            F.sum(
                F.when(F.col("_g") == F.col("group_a"), F.col("_c")).otherwise(F.lit(0))
            ).alias("_ca"),
            F.sum(
                F.when(F.col("_g") == F.col("group_b"), F.col("_c")).otherwise(F.lit(0))
            ).alias("_cb"),
        )
    )
    w = Window.partitionBy("group_a").orderBy("_v").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = byv.withColumn("_cra", F.sum("_ca").over(w)).withColumn(
        "_crb", F.sum("_cb").over(w)
    )
    tot = byv.groupBy("group_a", "group_b", "n_groups").agg(
        F.sum("_ca").alias("n_a"), F.sum("_cb").alias("n_b")
    )
    diff = cum.join(
        F.broadcast(tot), ["group_a", "group_b", "n_groups"]
    ).select(
        "group_a",
        "group_b",
        "n_groups",
        "n_a",
        "n_b",
        F.abs(
            F.col("_cra") * F.col("n_b") - F.col("_crb") * F.col("n_a")
        ).alias("_d"),
    )
    return (
        diff.groupBy("group_a", "group_b", "n_groups", "n_a", "n_b")
        .agg(F.max("_d").alias("d_num"))
        .select(
            "group_a",
            "group_b",
            "n_groups",
            "n_a",
            "n_b",
            "d_num",
            F.round(
                F.try_divide(F.col("d_num"), F.col("n_a") * F.col("n_b")), 6
            ).alias("d"),
        )
    )


def psi(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: int = 100,
) -> DataFrame:
    """Population Stability Index between two slices — the third drift
    lens next to :func:`ks_test` (sup-difference) and CUSUM (temporal):

        PSI = Σ over bins of (p_a − p_b) · ln(p_a / p_b)

    over fixed-width value bins, with add-one (Laplace) smoothing so
    bins observed in only one slice contribute finite mass — the
    standard monitoring convention (rule of thumb: <0.1 stable, >0.25
    shifted). Bin counts are exact BIGINTs; each bin's term is ONE fixed
    double expression quantized to an integer nano before the sum, so
    the total is an order-free BIGINT sum — partition- and
    engine-identical (the :mod:`textops` nano-ln discipline).

    Plan: one histogram aggregation (the only data-sized pass), one
    |bins|-sized pivot + 1-row totals broadcast. Group a = smaller
    label; ``n_groups`` rides along as the shape check.

    Output: one row — (group_a, group_b, n_groups, n_a, n_b, n_bins,
    psi).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    v = F.col(value_col).cast("long")
    per = (
        df.select(
            F.col(group_col).alias("_g"),
            (v - v % F.lit(bucket_width)).alias("_b"),
        )
        .groupBy("_g", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    lbl = per.agg(
        F.min("_g").alias("group_a"),
        F.max("_g").alias("group_b"),
        F.count_distinct("_g").alias("n_groups"),
    )
    byb = (
        per.crossJoin(F.broadcast(lbl))
        .groupBy("group_a", "group_b", "n_groups", "_b")
        .agg(
            F.sum(
                F.when(F.col("_g") == F.col("group_a"), F.col("_c")).otherwise(F.lit(0))
            ).alias("_ca"),
            F.sum(
                F.when(F.col("_g") == F.col("group_b"), F.col("_c")).otherwise(F.lit(0))
            ).alias("_cb"),
        )
    )
    tot = byb.groupBy("group_a", "group_b", "n_groups").agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    terms = byb.join(
        F.broadcast(tot), ["group_a", "group_b", "n_groups"]
    ).select(
        "group_a",
        "group_b",
        "n_groups",
        "n_a",
        "n_b",
        "n_bins",
        F.round(
            (
                (F.col("_ca") + 1).cast("double")
                / (F.col("n_a") + F.col("n_bins")).cast("double")
                - (F.col("_cb") + 1).cast("double")
                / (F.col("n_b") + F.col("n_bins")).cast("double")
            )
            * F.log(
                (
                    (F.col("_ca") + 1).cast("double")
                    / (F.col("n_a") + F.col("n_bins")).cast("double")
                )
                / (
                    (F.col("_cb") + 1).cast("double")
                    / (F.col("n_b") + F.col("n_bins")).cast("double")
                )
            )
            * 1e9
        ).cast("long").alias("_t_nano"),
    )
    return (
        terms.groupBy("group_a", "group_b", "n_groups", "n_a", "n_b", "n_bins")
        .agg(F.sum("_t_nano").alias("_s"))
        .select(
            "group_a",
            "group_b",
            "n_groups",
            "n_a",
            "n_b",
            "n_bins",
            F.round(F.col("_s") / 1e9, 6).alias("psi"),
        )
    )


def cuped(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013) —
    adjust the post-period metric by each unit's pre-period covariate:

        y_adj = y − θ·(x − mean(x)),   θ = cov(x, y) / var(x)

    Everything derives ALGEBRAICALLY from exact BIGINT moment sums (per-
    variant n/Σx/Σy plus pooled Σxy/Σx²/Σy²): adjusted variant means are
    mean_y_v − θ·(mean_x_v − mean_x), and the variance reduction equals
    the squared pre/post correlation (var(y_adj) = var_y·(1 − ρ²)) — so
    no per-row double ever exists and the result is order-free and
    engine-identical, one aggregation pass over the units.

    Output: one row — (variant_a, variant_b, n_a, n_b, theta,
    mean_adj_a, mean_adj_b, adj_diff, rho2), rounded to 6; degenerate
    var_x = 0 or var_y = 0 yields NULLs via try_divide.
    """
    x, y = F.col(pre_col).cast("long"), F.col(post_col).cast("long")
    per = df.groupBy(F.col(variant_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
    )
    pooled = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    lbl = per.agg(
        F.min("_v").alias("variant_a"), F.max("_v").alias("variant_b")
    )
    one = (
        per.crossJoin(F.broadcast(lbl))
        .groupBy("variant_a", "variant_b")
        .agg(
            F.max(F.when(F.col("_v") == F.col("variant_a"), F.col("_n"))).alias("n_a"),
            F.max(F.when(F.col("_v") == F.col("variant_a"), F.col("_sx"))).alias("sx_a"),
            F.max(F.when(F.col("_v") == F.col("variant_a"), F.col("_sy"))).alias("sy_a"),
            F.max(F.when(F.col("_v") == F.col("variant_b"), F.col("_n"))).alias("n_b"),
            F.max(F.when(F.col("_v") == F.col("variant_b"), F.col("_sx"))).alias("sx_b"),
            F.max(F.when(F.col("_v") == F.col("variant_b"), F.col("_sy"))).alias("sy_b"),
        )
        .crossJoin(F.broadcast(pooled))
    )
    dn = F.col("n").cast("double")
    cov_n2 = dn * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    varx_n2 = dn * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vary_n2 = dn * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    theta = F.try_divide(cov_n2, varx_n2)
    mean_x = F.col("sx").cast("double") / dn
    adj = lambda sfx: (  # noqa: E731
        F.col("sy_" + sfx).cast("double") / F.col("n_" + sfx).cast("double")
        - theta
        * (
            F.col("sx_" + sfx).cast("double")
            / F.col("n_" + sfx).cast("double")
            - mean_x
        )
    )
    return one.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(adj("a"), 6).alias("mean_adj_a"),
        F.round(adj("b"), 6).alias("mean_adj_b"),
        F.round(adj("a") - adj("b"), 6).alias("adj_diff"),
        F.round(
            F.try_divide(cov_n2 * cov_n2, varx_n2 * vary_n2), 6
        ).alias("rho2"),
    )


def roc_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC AUC of a score against a binary label via the
    tie-corrected rank-sum (Mann–Whitney) identity:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    where R⁺ is the sum of AVERAGE ranks of the positives under the score
    ordering. This is the standard eval for classifier-based corpus
    filtering (FineWeb-style quality classifiers): "how well does this
    score separate the keep class" — computed exactly, without sampling
    thresholds or trapezoid approximation (rank-sum AUC IS the full-curve
    integral).

    Tie handling keeps everything an exact BIGINT: the average rank of a
    tie run spanning dense ranks [a, b] is (a+b)/2, so 2·avgrank =
    2·rank() + cnt(run) − 1 is an integer, Σ over positives of that is an
    integer, and AUC = (Σ − n⁺(n⁺+1)) / (2·n⁺·n⁻) is ONE final division —
    identical IEEE double on any engine, and independent of any tiebreak
    order (average-rank AUC is permutation-invariant within ties, so no
    tiebreak column is needed, unlike spearman()).

    Plan shape: two windows over the same per-group hash partition (rank
    by score; tie-run size partitioned by (group, score)) then one
    hash aggregate — one exchange on the group key, sorts stay inside
    partitions, nothing global. Degenerate groups (all-positive or
    all-negative: n⁺·n⁻ = 0) yield NULL via try_divide.

    Output: one row per group — (n_pos, n_neg, u2 = 2·Mann-Whitney-U,
    auc), u2 exact BIGINT.
    """
    wr = Window.partitionBy(*group_cols).orderBy(F.col(score_col))
    wt = Window.partitionBy(*group_cols, score_col)
    lab = F.col(label_col).cast("boolean")
    avg2 = (
        F.lit(2) * F.rank().over(wr).cast("long")
        + F.count(F.lit(1)).over(wt).cast("long")
        - F.lit(1)
    )
    ranked = df.select(
        *group_cols, lab.alias("_pos"), avg2.alias("_avg2")
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("_pos"), F.col("_avg2")).otherwise(0))
        .cast("long")
        .alias("_r2pos"),
    )
    u2 = F.col("_r2pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        u2.cast("long").alias("u2"),
        F.round(
            F.try_divide(
                u2.cast("double"),
                (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double"),
            ),
            6,
        ).alias("auc"),
    )


def ece_calibration(
    df: DataFrame,
    group_cols: list[str],
    score_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group Expected Calibration Error over equal-width score bins —
    "when the quality model says 0.8, is the empirical keep rate 0.8?" —
    the companion diagnostic to roc_auc() (AUC measures ranking,
    ECE measures whether the score is usable as a probability, which is
    what mixture-sampling weights assume).

    Scores arrive as exact ppm integers in [0, 1e6] (the repo-wide
    convention — textops.quality_ppm etc.). With B bins of width 1e6/B
    (B must divide 1e6), bin b's contribution to ECE is
    |mean(score) − frac_pos| · n_b / N, and multiplying through by 1e6·N
    keeps it integer: |Σ score_ppm − 1e6 · n_pos| summed over bins, then
    ONE division by N yields ECE in ppm. Every engine gets the same
    int64s and the same final double.

    Plan shape: one hash aggregate to B·|groups| rows (map-side partial
    combine does the heavy lifting), then a window total per group over
    those tiny aggregates. Output: one row per (group, bin) —
    (bin, n, n_pos, sum_score_ppm, gap_ppm_num exact BIGINT, and the
    per-group scalar ece_ppm repeated on each row).
    """
    if 1_000_000 % n_bins:
        raise ValueError(f"n_bins {n_bins} must divide 1e6")
    width = 1_000_000 // n_bins
    score = F.col(score_ppm_col).cast("long")
    # scores are bounded by 1e6 so the float quotient is exact and floor
    # equals integer division; least() clamps the score==1e6 edge into
    # the top bin
    bin_ = F.least(
        F.floor(score / F.lit(width)), F.lit(n_bins - 1).cast("long")
    ).cast("long")
    lab = F.col(label_col).cast("boolean")
    per_bin = (
        df.select(*group_cols, bin_.alias("bin"), score.alias("_s"), lab.alias("_pos"))
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
            F.sum("_s").cast("long").alias("sum_score_ppm"),
        )
    )
    gap = F.abs(
        F.col("sum_score_ppm") - F.lit(1_000_000) * F.col("n_pos")
    ).cast("long")
    wg = Window.partitionBy(*group_cols)
    out = per_bin.withColumn("gap_ppm_num", gap)
    return out.select(
        *group_cols,
        "bin",
        "n",
        "n_pos",
        "sum_score_ppm",
        "gap_ppm_num",
        F.round(
            F.sum("gap_ppm_num").over(wg).cast("double")
            / F.sum("n").over(wg).cast("double"),
            6,
        ).alias("ece_ppm"),
    )


def _merge_discordant(y):
    """Pairs (i, j), i < j, with y_i > y_j — bottom-up merge counting.

    Both halves of every merge step are already sorted, so the cross-half
    count is one vectorized searchsorted per block and the merge itself is
    a block sort; O(n log² n) total, all numpy, no Python per element.
    """
    import numpy as np

    a = np.asarray(y).copy()
    n = a.size
    inv = 0
    width = 1
    while width < n:
        lo = 0
        while lo < n:
            mid = lo + width
            hi = min(lo + 2 * width, n)
            if mid < hi:
                left = a[lo:mid]
                right = a[mid:hi]
                inv += int(
                    (
                        left.size
                        - np.searchsorted(left, right, side="right")
                    ).sum()
                )
                merged = np.concatenate([left, right])
                merged.sort()
                a[lo:hi] = merged
            lo = hi
        width *= 2
    return inv


def _tie_pairs(new_run_mask):
    """Σ g·(g−1)/2 over runs delimited by a boolean new-run mask."""
    import numpy as np

    starts = np.flatnonzero(new_run_mask)
    lengths = np.diff(np.append(starts, new_run_mask.size))
    return int((lengths * (lengths - 1) // 2).sum())


def kendall_tau(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Kendall rank correlation τ-b (tie-corrected) between two
    integer columns via Knight's O(n log n) algorithm — NOT the O(n²)
    all-pairs definition:

        τ_b = (C − D) / sqrt((tot − t_x) · (tot − t_y))

    Sort each group by (x, y); then the discordant count D is exactly the
    number of y-inversions (equal-x pairs contribute none, because y is
    ascending within an x-run and inversions require strict >), tie terms
    come from run lengths, and C = tot − t_x − t_y + t_xy − D. Every count
    is an exact int64; the sqrt is the single float step, identical IEEE
    on any engine (Knight 1966; same decomposition scipy uses).

    Scale shape: groups are the unit of work — applyInPandas ships each
    group as ONE Arrow batch and the merge-count is vectorized numpy
    (pairs with time-rank x == the Mann-Kendall trend statistic
    S = C − D, so this doubles as a monotone-trend test). The all-pairs
    relation is never materialized anywhere; the DuckDB oracle uses the
    independent quadratic self-join formulation.

    Output: one row per group — (n, n_pairs, concordant, discordant,
    xtie, ytie, tau_b).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("n", T.LongType()),
            T.StructField("n_pairs", T.LongType()),
            T.StructField("concordant", T.LongType()),
            T.StructField("discordant", T.LongType()),
            T.StructField("xtie", T.LongType()),
            T.StructField("ytie", T.LongType()),
            T.StructField("tau_b", T.DoubleType()),
        ]
    )

    def fn(key, pdf):
        x = pdf[x_col].to_numpy(dtype="int64")
        y = pdf[y_col].to_numpy(dtype="int64")
        n = x.size
        perm = np.lexsort((y, x))
        xs, ys = x[perm], y[perm]
        new_x = np.r_[True, xs[1:] != xs[:-1]]
        new_xy = np.r_[True, (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])]
        y_sorted = np.sort(y)
        new_y = np.r_[True, y_sorted[1:] != y_sorted[:-1]]
        xtie = _tie_pairs(new_x)
        ytie = _tie_pairs(new_y)
        ntie = _tie_pairs(new_xy)
        dis = _merge_discordant(ys)
        tot = n * (n - 1) // 2
        con = tot - xtie - ytie + ntie - dis
        den = math.sqrt(float(tot - xtie)) * math.sqrt(float(tot - ytie))
        tau = round((con - dis) / den, 6) if den > 0 else None
        return pd.DataFrame(
            [
                list(key)
                + [n, tot, con, dis, xtie, ytie, tau]
            ],
            columns=[f.name for f in out_schema.fields],
        )

    return df.select(*group_cols, x_col, y_col).groupBy(
        *group_cols
    ).applyInPandas(fn, out_schema)


def quantile_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    b: int = 1000,
) -> DataFrame:
    """Cross-group quantile normalization: replace each value with the
    POOLED distribution's value at the same within-group percentile — the
    standard fix when per-source score distributions drift (a "0.7" from
    one crawl is not a "0.7" from another) before a single global
    threshold or mixture weight is applied.

    Discrete, integer-exact recipe at grid resolution ``b``:

      grid[k]   = pooled value at rank ceil(k·N / b),  k = 1..b
      row(r, n) → grid[ceil(r·b / n)]                  (r = in-group rank)

    Scale shape (the gini() trick, twice):
      1. The pooled CDF is aggregated over DISTINCT VALUES, not rows —
         one hash agg with map-side combine, then one window over the
         value domain (bounded: ppm scores have ≤ 1e6 distinct values,
         so the single-partition window is over a tiny relation, never
         over data volume).
      2. Each distinct value emits exactly the grid cells it covers via
         integer interval algebra (k ∈ [⌊b·prev/N⌋+1, ⌊b·cum/N⌋]) — the
         exploded grid is exactly ``b`` rows, broadcast back.
      3. Rows need only their in-group rank (one window per group
         partition) and a broadcast hash join on the grid cell.
    Every step is int64 arithmetic (b·N must stay < 2^63 — at b=1000
    that allows 9·10^15 rows); no floats anywhere, so any engine
    reproduces every output bit.

    Output: group cols, tiebreak, value, grid_k, norm_<value_col> (the
    pooled-distribution value at the row's percentile).
    """
    vals = df.select(*group_cols, tiebreak_col, F.col(value_col).cast("long").alias(value_col))
    hist = vals.groupBy(value_col).agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    wcum = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = hist.agg(F.sum("_cnt").cast("long").alias("_n_total"))
    cum = (
        hist.withColumn("_cum", F.sum("_cnt").over(wcum).cast("long"))
        .withColumn("_prev", (F.col("_cum") - F.col("_cnt")).cast("long"))
        .crossJoin(F.broadcast(total))
    )
    # integer div (not float-cast) keeps the interval algebra exact past
    # 2^53; values covering no grid cell emit an empty sequence guard
    k_lo = F.expr(f"({b} * _prev) div _n_total") + F.lit(1)
    k_hi = F.expr(f"({b} * _cum) div _n_total")
    grid = (
        cum.where(k_hi >= k_lo)
        .select(
            F.explode(F.sequence(k_lo, k_hi)).alias("grid_k"),
            F.col(value_col).alias("_norm"),
        )
    )
    wr = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    wn = Window.partitionBy(*group_cols)
    ranked = vals.withColumn(
        "_r", F.row_number().over(wr).cast("long")
    ).withColumn("_gn", F.count(F.lit(1)).over(wn).cast("long"))
    k = F.expr(f"(_r * {b} + _gn - 1) div _gn")
    out = ranked.withColumn("grid_k", k).join(
        F.broadcast(grid), "grid_k"
    )
    return out.select(
        *group_cols,
        tiebreak_col,
        value_col,
        "grid_k",
        F.col("_norm").alias(f"norm_{value_col}"),
    )


def chi2_cells(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Chi-squared test of independence between two categorical columns,
    emitted as the per-cell contribution table (the drift/association
    readout: WHICH (source, lang) cells deviate, not just a scalar) —
    completes the categorical side of the stats family (two_proportion_z
    is binary×binary, cohens_kappa is agreement, this is independence).

    Per cell: observed O, row total R, column total C, grand total N;
    expected = R·C/N and

        contrib = (O·N − R·C)² / (N·R·C)

    The numerator (O·N − R·C)² and every total stay exact BIGINT (needs
    O·N < 2^31.5-ish per cell to square safely — fine for the ≤ 10^9-row
    slices this diagnostic runs on; the squared term is guarded by the
    caller's slice, not hidden float loss), and each cell does ONE double
    division — engine-identical per row. The scalar χ² is the sum of a
    deterministic per-cell column, left to the consumer so no
    engine-varying float summation order enters the contract.

    Plan shape: one contingency aggregation over the pair (map-side
    combine), |A| and |B| marginal aggs over THAT (tiny), two broadcast
    joins back, one 1-row cross join for N. Cells with zero observed
    count are absent from the output (their contribution is R·C/N²·N =
    expected-only; emit-missing keeps the relation sparse — the oracle
    mirrors this).
    """
    conf = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    rows = conf.groupBy("a").agg(F.sum("observed").cast("long").alias("row_total"))
    cols = conf.groupBy("b").agg(F.sum("observed").cast("long").alias("col_total"))
    tot = conf.agg(F.sum("observed").cast("long").alias("grand_total"))
    out = (
        conf.join(F.broadcast(rows), "a")
        .join(F.broadcast(cols), "b")
        .crossJoin(F.broadcast(tot))
    )
    dev = (
        F.col("observed") * F.col("grand_total")
        - F.col("row_total") * F.col("col_total")
    )
    return out.select(
        F.col("a").alias(a_col),
        F.col("b").alias(b_col),
        "observed",
        "row_total",
        "col_total",
        "grand_total",
        (dev * dev).cast("long").alias("dev2_num"),
        F.round(
            F.try_divide(
                (dev * dev).cast("double"),
                (
                    F.col("grand_total")
                    * F.col("row_total")
                    * F.col("col_total")
                ).cast("double"),
            ),
            6,
        ).alias("contrib"),
    )


def weighted_quantile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    q_ppm: int = 500_000,
) -> DataFrame:
    """Exact weighted percentile per group — the token-weighted median
    quality threshold ("half the TOKENS sit below this score", not half
    the documents) that row-weighted percentiles silently get wrong when
    doc lengths are skewed:

        wq = smallest v with cumw(v) · 1e6 ≥ q_ppm · W

    The histogram discipline (winsorize/gini): aggregate weights over
    DISTINCT VALUES first (map-side combine does the data-volume work),
    then one window over each group's value domain and one conditional
    min — no per-row ranking, no global sort. All comparisons are int64
    products (weights and 1e6 · q both integers), so the picked value is
    engine-exact. Zero-total-weight groups yield NULL.

    Output: one row per group — (total_w, wq_<value_col>).
    """
    if not (0 < q_ppm <= 1_000_000):
        raise ValueError("need 0 < q_ppm <= 1e6")
    g = list(group_cols)
    hist = (
        df.select(
            *g,
            F.col(value_col).cast("long").alias("_v"),
            F.col(weight_col).cast("long").alias("_w"),
        )
        .groupBy(*g, "_v")
        .agg(F.sum("_w").cast("long").alias("_wsum"))
    )
    wcum = (
        Window.partitionBy(*g)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*g)
    cum = hist.withColumn(
        "_cumw", F.sum("_wsum").over(wcum).cast("long")
    ).withColumn("_tw", F.sum("_wsum").over(wall).cast("long"))
    picked = cum.groupBy(*g).agg(
        F.max("_tw").cast("long").alias("total_w"),
        F.min(
            F.when(
                F.col("_cumw") * F.lit(1_000_000)
                >= F.lit(q_ppm) * F.col("_tw"),
                F.col("_v"),
            )
        ).alias("_wq"),
    )
    return picked.select(
        *g,
        "total_w",
        F.when(F.col("total_w") > 0, F.col("_wq"))
        .cast("long")
        .alias(f"wq_{value_col}"),
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) — the
    classic behavioral cohorting every events table eventually gets asked
    for, engine-exact:

      * one hash aggregate to per-user (last_ts, n_events, total cents) —
        map-side combined, the only data-volume pass;
      * "now" is the dataset's max timestamp (a 1-row broadcast), so the
        result is deterministic, not wall-clock-dependent;
      * tiles come from ntile(n) over a TOTAL order (metric desc, user
        asc) — ntile's fill rule (first n mod k buckets get the extra
        row) is the same in Spark and DuckDB given the same order, and
        the tiebreak makes the order identical. Tile 1 = best.

    The three ntile windows run over the per-USER relation (domain-sized,
    not event-sized). Output: (user, recency_us, frequency,
    monetary_cents, r, f, m, rfm_code = r·100 + f·10 + m).
    """
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        # cast: parquet NTZ timestamps need the session-TZ TIMESTAMP type
        # before unix_micros (UTC sessions make this the identity wall
        # clock DuckDB's epoch_us reads)
        F.max(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
        ).alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    now = per_user.agg(F.max("last_us").alias("_now"))
    scored = per_user.crossJoin(F.broadcast(now)).withColumn(
        "recency_us", (F.col("_now") - F.col("last_us")).cast("long")
    )
    tile = lambda col, asc: F.ntile(n_tiles).over(  # noqa: E731
        Window.orderBy(
            F.asc(col) if asc else F.desc(col), F.asc("u")
        )
    )
    return scored.select(
        F.col("u").alias(user_col),
        "recency_us",
        "frequency",
        "monetary_cents",
        tile("recency_us", True).cast("long").alias("r"),
        tile("frequency", False).cast("long").alias("f"),
        tile("monetary_cents", False).cast("long").alias("m"),
    ).withColumn(
        "rfm_code",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("long"),
    )


#: Poisson(1) CDF at micro precision, pinned as integer literals so Spark
#: and the DuckDB oracle share the exact inverse-CDF ladder. Index k holds
#: P(X <= k) * 1e6 rounded; a uniform micro-draw u maps to the first k with
#: u < cdf[k] (else len(cdf) = 9).
POISSON1_CDF_MICRO = (
    367879,  # P(0)
    735759,
    919699,
    981012,
    996340,
    999406,
    999917,
    999990,
    999999,
)


def _poisson_weight_sql(u_sql: str) -> str:
    """CASE ladder mapping a uniform micro-draw to a Poisson(1) variate."""
    cases = " ".join(
        f"WHEN {u_sql} < {c} THEN {k}"
        for k, c in enumerate(POISSON1_CDF_MICRO)
    )
    return f"CASE {cases} ELSE {len(POISSON1_CDF_MICRO)} END"


def poisson_bootstrap_ci(
    df: DataFrame,
    value_cents_col: str,
    id_col: str,
    b: int = 200,
    lo_rank: int = 5,
    hi_rank_from_top: int = 5,
) -> DataFrame:
    """Bootstrap confidence interval for the mean via the POISSON
    bootstrap (Chamandy et al. 2012, "Estimating uncertainty for massive
    data streams") — the only bootstrap that works at 100 TB: classic
    resampling needs N draws per replicate from a global index, which is
    a shuffle per replicate; the Poisson trick instead gives every row
    an independent Poisson(1) weight per replicate, so all B replicates
    are computed in ONE pass with map-side partial aggregation and the
    shuffle carries only B × n_partitions partial rows.

    Determinism/engine-exactness: the per-(row, replicate) uniform is a
    micro-quantized md5 draw (hash32(id || ':' || b) mod 1e6) pushed
    through the pinned integer CDF ladder ``POISSON1_CDF_MICRO``; each
    replicate mean is exact BIGINT milli-cents ((Σ w·v)·1000 div Σ w);
    the CI bounds are order statistics of the B replicate means selected
    by integer rank (default: 5th / 5th-from-top of 200 ≈ 95% CI).

    Output (single row): (n BIGINT, b_reps BIGINT, mean_milli BIGINT,
    ci_lo_milli BIGINT, ci_hi_milli BIGINT).
    """
    u_sql = (
        "cast(conv(substring(md5(concat(cast(_id as string), ':',"
        " cast(b as string))), 1, 8), 16, 10) as long) % 1000000"
    )
    # materialize the draw ONCE per (row, replicate): inlining u_sql into
    # the ladder would re-evaluate md5+conv in every CASE branch (up to 9
    # hashes per row — measured 49.7 s vs 6 s at sf0.1, B=200)
    rep = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(value_cents_col).alias("_v"),
            F.explode(F.expr(f"sequence(0, {b - 1})")).alias("b"),
        )
        .select("b", "_v", F.expr(u_sql).alias("_u"))
        .select(
            "b",
            "_v",
            F.expr(_poisson_weight_sql("_u")).cast("long").alias("w"),
        )
    )
    means = (
        rep.groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("_v")).cast("long").alias("swv"),
        )
        .where(F.col("sw") > 0)
        .select("b", F.expr("swv * 1000 div sw").alias("m"))
    )
    rn = F.row_number().over(Window.orderBy(F.asc("m"), F.asc("b")))
    ranked = means.select("m", rn.alias("rn"), F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"))
    ci = ranked.agg(
        F.max("nb").cast("long").alias("b_reps"),
        F.max(F.when(F.col("rn") == lo_rank, F.col("m")))
        .cast("long")
        .alias("ci_lo_milli"),
        F.max(
            F.when(F.col("rn") == F.col("nb") - hi_rank_from_top + 1, F.col("m"))
        )
        .cast("long")
        .alias("ci_hi_milli"),
    )
    point = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"sum({value_cents_col}) * 1000 div count(1)")
        .cast("long")
        .alias("mean_milli"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n", "b_reps", "mean_milli", "ci_lo_milli", "ci_hi_milli"
    )


def classifier_prf(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 from a (true, pred) relation —
    the confusion-matrix rollup that turns a classifier op (e.g.
    textops.nb_classify) into a publishable eval. Complements roc_auc
    (threshold-free, binary) and ece_calibration (probability quality)
    with the hard-decision multi-class view.

    Shape: ONE |classes|²-cardinality hash agg over the scored relation
    (map-side combined — the only data-sized pass), then label-keyed
    rollups and broadcast joins over |classes|-row relations. All three
    metrics are exact integer ppm (division-by-zero guarded to 0), so
    rows hash-match across engines.

    Output: (label, n_true, n_pred, tp, precision_ppm, recall_ppm,
    f1_ppm) — one row per label seen in either column.
    """
    pairs = df.groupBy(
        F.col(true_col).alias("_t"), F.col(pred_col).alias("_p")
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    tp = (
        pairs.where(F.col("_t") == F.col("_p"))
        .groupBy(F.col("_t").alias("label"))
        .agg(F.sum("_n").cast("long").alias("tp"))
    )
    n_true = pairs.groupBy(F.col("_t").alias("label")).agg(
        F.sum("_n").cast("long").alias("n_true")
    )
    n_pred = pairs.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_n").cast("long").alias("n_pred")
    )
    cls = (
        n_true.select("label").union(n_pred.select("label")).distinct()
    )
    j = (
        cls.join(F.broadcast(n_true), "label", "left")
        .join(F.broadcast(n_pred), "label", "left")
        .join(F.broadcast(tp), "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    return j.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.expr(
            "CASE WHEN n_pred > 0 THEN tp * 1000000 div n_pred ELSE 0 END"
        )
        .cast("long")
        .alias("precision_ppm"),
        F.expr(
            "CASE WHEN n_true > 0 THEN tp * 1000000 div n_true ELSE 0 END"
        )
        .cast("long")
        .alias("recall_ppm"),
        F.expr(
            "CASE WHEN n_pred + n_true > 0 THEN"
            " 2 * tp * 1000000 div (n_pred + n_true) ELSE 0 END"
        )
        .cast("long")
        .alias("f1_ppm"),
    )
