"""Z-order (Morton) clustering for multi-dimensional file skipping.

A single-column SORT compaction gives disjoint per-file [min, max] ranges on
that one column — point/range scans on anything else still open every file.
Z-ordering interleaves the bits of several columns into one Morton code and
range-partitions on it, so each output file covers a small hyper-rectangle
of the combined key space: manifest-stats pruning (``plan_scan``) then skips
files for predicates on ANY of the z-ordered columns. This is the same
trade Delta/Iceberg ``rewrite_data_files(strategy => 'sort', sort_order =>
zorder(...))`` makes.

Everything is built-in JVM expressions (shifts/ands/ors unrolled per bit —
whole-stage codegen folds them); the only driver work is one tiny min/max
agg to scale each column into its 16-bit lattice.

Columns must be totally ordered and linearly scalable: numeric, timestamp,
or date (timestamps/dates scale via their epoch representation). Strings
have no bounded monotone embedding — refused rather than silently hashed
(hashing destroys the locality Z-ordering exists to create).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BITS = 16  # per-dimension resolution; 4 dims still fit a 64-bit Morton code


def _as_long(col: Column, dtype: T.DataType) -> Column:
    """Monotone LONG embedding of an orderable column."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("double") * 1_000_000  # epoch micros, monotone
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("double")
    if isinstance(
        dtype,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        return col.cast("double")
    raise TypeError(
        f"z-order needs a numeric/timestamp/date column, got {dtype.simpleString()}"
    )


def zvalue(df: DataFrame, cols: list[str]) -> Column:
    """Morton code of ``cols`` as one LONG column.

    Each column is min/max-scaled onto [0, 2^16) (one small agg over the
    input — at compaction time that input is a single partition's files),
    then the lattice coordinates are bit-interleaved:
    bit i of dim k lands at position i*K + k.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order takes 2-4 columns")
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in dtypes:
            raise KeyError(c)
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(_as_long(F.col(c), schema[c])).alias(f"_lo_{c}"),
                F.max(_as_long(F.col(c), schema[c])).alias(f"_hi_{c}"),
            )
        ]
    ).collect()[0]
    k = len(cols)
    lattice: list[Column] = []
    for c in cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        v = _as_long(F.col(c), schema[c])
        if lo is None or hi is None or hi <= lo:
            lattice.append(F.lit(0).cast("long"))
            continue
        span = float(hi) - float(lo)
        scaled = F.floor(
            (v - F.lit(float(lo))) / F.lit(span) * F.lit(float((1 << BITS) - 1))
        ).cast("long")
        # clamp (nulls -> 0 keeps them clustered at the origin corner)
        scaled = F.coalesce(
            F.greatest(F.least(scaled, F.lit((1 << BITS) - 1)), F.lit(0)),
            F.lit(0),
        ).cast("long")
        lattice.append(scaled)
    z = F.lit(0).cast("long")
    for bit in range(BITS):
        for dim, lat in enumerate(lattice):
            # ((lat >> bit) & 1) << (bit*k + dim)
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(lat, bit).bitwiseAND(F.lit(1).cast("long")),
                    bit * k + dim,
                )
            )
    return z


def layout_stats(df: DataFrame, col_a: str, col_b: str, n_files: int = 64) -> DataFrame:
    """Head-to-head layout audit: Z-order vs single-column-sort file
    assignment over two integer key columns.

    Assigns every row to one of ``n_files`` output files twice — once by
    the top bits of its Morton code (``zvalue``; the hyper-rectangle
    layout ``compact(zorder_by=...)`` produces) and once by a range-sort
    on ``col_a`` alone (what a plain sorted compaction produces) — then
    reports, per layout, the average per-file [min, max] span of EACH key
    as ppm of that key's full domain. The number manifest-stats pruning
    cares about: a predicate on column c skips a file iff the file's c-span
    misses it, so avg span ppm ≈ the expected fraction of files a point
    lookup on c must open. Sort layouts bound col_a (~1/n_files) and leave
    col_b at ~domain width; Z-order bounds BOTH at ~1/sqrt(n_files).

    One pass per layout (two data-sized aggregates, both map-side
    combinable), bounds via a broadcast 1-row cross join — no sort, no
    collect of data rows. Parity: file ids and span ppm are exact BIGINT
    math; the Morton lattice uses the same IEEE-double scaling formula in
    both engines."""
    if n_files & (n_files - 1):
        raise ValueError("n_files must be a power of two")
    file_bits = n_files.bit_length() - 1
    base = df.select(
        F.col(col_a).cast("long").alias("a"),
        F.col(col_b).cast("long").alias("b"),
    )
    bounds = F.broadcast(
        base.agg(
            F.min("a").alias("lo_a"),
            F.max("a").alias("hi_a"),
            F.min("b").alias("lo_b"),
            F.max("b").alias("hi_b"),
        )
    )
    withb = base.crossJoin(bounds)
    # zvalue() re-derives the same bounds internally via its own tiny agg;
    # the Morton top bits pick the file.
    z = zvalue(withb.select("a", "b"), ["a", "b"])
    assigned = withb.select(
        "a", "b", "lo_a", "hi_a", "lo_b", "hi_b",
        F.shiftrightunsigned(z, 2 * BITS - file_bits).alias("zfile"),
        F.expr(f"(a - lo_a) * {n_files} div (hi_a - lo_a + 1)").alias("sfile"),
    )

    def per_layout(d: DataFrame, file_col: str, name: str) -> DataFrame:
        per_file = d.groupBy(file_col).agg(
            F.min("a").alias("fa_lo"), F.max("a").alias("fa_hi"),
            F.min("b").alias("fb_lo"), F.max("b").alias("fb_hi"),
            F.first("lo_a").alias("lo_a"), F.first("hi_a").alias("hi_a"),
            F.first("lo_b").alias("lo_b"), F.first("hi_b").alias("hi_b"),
        )
        return per_file.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.expr(
                "sum(fa_hi - fa_lo) * 1000000 div"
                " (count(1) * (first(hi_a) - first(lo_a)))"
            ).alias("span_a_ppm"),
            F.expr(
                "sum(fb_hi - fb_lo) * 1000000 div"
                " (count(1) * (first(hi_b) - first(lo_b)))"
            ).alias("span_b_ppm"),
        )

    return per_layout(assigned, "zfile", "zorder").unionByName(
        per_layout(assigned, "sfile", "sort")
    )
