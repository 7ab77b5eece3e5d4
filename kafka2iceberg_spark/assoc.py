"""Market-basket association mining: frequent item pairs + rule metrics.

Co-occurrence mining ("parts bought together") is the classic batch
analytics ask over exactly the order/lineitem tables the reference lands
into Iceberg. This is the Apriori level-2 pass expressed Spark-first: no
candidate generation loop, just one self-join on the basket key — correct
because a pair's support IS the count of baskets containing both items.

Scale shape: the self-join is keyed on basket id, and per-basket work is
C(items_per_basket, 2) — bounded by the basket size (a handful for retail
schemas), NOT by catalog size, so the join output is a small multiple of
the fact table. Item supports are item-keyed aggregates (vocabulary-sized,
map-side combined). All metrics divide exact BIGINTs once — deterministic
doubles, engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_support(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Support count per unordered item pair: number of distinct baskets
    containing both items. One distinct over (basket, item), one
    basket-keyed self-join with item_a < item_b, one pair aggregation."""
    it = baskets.select(basket_col, item_col).distinct()
    a, b = it.alias("a"), it.alias("b")
    return (
        a.join(b, F.col(f"a.{basket_col}") == F.col(f"b.{basket_col}"))
        .where(F.col(f"a.{item_col}") < F.col(f"b.{item_col}"))
        .groupBy(
            F.col(f"a.{item_col}").alias("item_a"),
            F.col(f"b.{item_col}").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pairwise association rules a->b with the standard metrics:

        confidence(a->b) = sup(a,b) / sup(a)
        lift(a,b)        = n_baskets * sup(a,b) / (sup(a) * sup(b))

    Every operand is an exact BIGINT count; each metric is one double
    division (confidence) or one division of exact integer products
    (lift) — deterministic to the bit, rounded to 6 for the oracle gate.
    Emits only a < b (the symmetric rule b->a has the same lift; callers
    wanting both directions union the flip). Item supports are broadcast
    (vocabulary-sized) onto the pair table.
    """
    it = baskets.select(basket_col, item_col).distinct()
    n_baskets = it.select(basket_col).distinct().count()
    item_sup = it.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("sup_i")
    )
    pairs = pair_support(baskets, basket_col, item_col).where(
        F.col("support") >= int(min_support)
    )
    sa = item_sup.select(
        F.col(item_col).alias("item_a"), F.col("sup_i").alias("sup_a")
    )
    sb = item_sup.select(
        F.col(item_col).alias("item_b"), F.col("sup_i").alias("sup_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "support",
            "sup_a",
            "sup_b",
            F.round(F.col("support") / F.col("sup_a"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.lit(int(n_baskets)) * F.col("support"))
                / (F.col("sup_a") * F.col("sup_b")),
                6,
            ).alias("lift"),
        )
    )


def tool_pmi(t: DataFrame) -> DataFrame:
    """Pointwise mutual information of tool co-occurrence within a
    conversation: pmi(x,y) = ln( P(x,y) / (P(x)P(y)) ) over the universe of
    conversations that invoke at least one tool.

    Reuses the pair_support join shape (per-conv distinct tool sets, pair
    join keyed on conv_id, output bounded by C(|tools|,2) per conv).
    Engine-exactness: c_xy·N and c_x·c_y are exact BIGINT products; ONE
    double division feeds ln, quantized to integer nano-nats
    (the bigram_lm idiom) — pmi_nano is portable BIGINT."""
    ct = (
        t.filter(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
    )
    n_convs = ct.select("conv_id").distinct().agg(
        F.count(F.lit(1)).alias("n_convs")
    )
    cx = ct.groupBy("tool").agg(F.count(F.lit(1)).alias("c"))
    pairs = pair_support(ct, "conv_id", "tool").withColumnRenamed(
        "support", "c_xy"
    )
    out = (
        pairs.join(
            F.broadcast(cx.select(F.col("tool").alias("item_a"),
                                  F.col("c").alias("c_x"))),
            "item_a",
        )
        .join(
            F.broadcast(cx.select(F.col("tool").alias("item_b"),
                                  F.col("c").alias("c_y"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_convs))
    )
    return out.select(
        F.col("item_a").alias("tool_a"),
        F.col("item_b").alias("tool_b"),
        F.col("c_xy"),
        F.round(
            F.log(
                (F.col("c_xy") * F.col("n_convs")).cast("double")
                / (F.col("c_x") * F.col("c_y")).cast("double")
            )
            * F.lit(1_000_000_000.0)
        ).cast("long").alias("pmi_nano"),
    )
