"""Sequence packing: fill fixed token budgets with documents (training-batch
construction). Greedy first-fit-decreasing inside hash shards:

  * token counts computed JVM-side (textops.n_tokens);
  * docs shard by a deterministic hash bucket — shards are independent, so
    packing parallelizes to any cluster size with one shuffle;
  * within a shard, applyInPandas runs FFD (sort by tokens desc, place each
    doc in the first bin with room) — vectorized pandas, deterministic
    (ties break on doc_id), bounded memory per shard;
  * bin ids are globally unique (shard * 2^32 + local index).

Packing quality: FFD wastes ≤ ~22% in the worst case and ~a few % on real
length distributions; exact bin packing is NP-hard and pointless at corpus
scale. Docs longer than the budget get a singleton bin (flagged oversize).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textops import hash_bucket, n_tokens

PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_tok", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bin_id", T.LongType(), False),
        T.StructField("oversize", T.BooleanType(), False),
    ]
)


def _ffd(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    pdf = pdf.sort_values(
        ["n_tok", "doc_id"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    shard = int(pdf["shard"].iloc[0])
    bins: list[int] = []  # remaining capacity per bin
    assign: list[int] = []
    oversize: list[bool] = []
    for tok in pdf["n_tok"]:
        tok = int(tok)
        if tok >= budget:
            # close the bin (capacity -1): nothing else may join, not even a
            # zero-token doc (hypothesis-found edge case)
            bins.append(-1)
            assign.append(len(bins) - 1)
            oversize.append(tok > budget)
            continue
        placed = False
        for i, rem in enumerate(bins):
            if rem >= tok:
                bins[i] = rem - tok
                assign.append(i)
                placed = True
                break
        if not placed:
            bins.append(budget - tok)
            assign.append(len(bins) - 1)
        oversize.append(False)
    out = pdf[["doc_id", "n_tok", "shard"]].copy()
    out["bin_id"] = [shard * (2**32) + a for a in assign]
    out["oversize"] = oversize
    return out


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tok, shard, bin_id, oversize) — every doc packed once."""
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens(F.col(text_col)).alias("n_tok"),
        hash_bucket(F.col(id_col).cast("string"), n_shards)
        .cast("int")
        .alias("shard"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=[f.name for f in PACK_SCHEMA.fields])
        return _ffd(pdf, budget)

    return sized.groupBy("shard").applyInPandas(fn, schema=PACK_SCHEMA)


def bin_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Fill-rate accounting per bin: (bin_id, n_docs, fill_tok, fill_ppm)."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("fill_tok"),
        ((F.sum("n_tok") * 1_000_000) / budget).cast("long").alias("fill_ppm"),
    )


def truncate_tail(
    df: DataFrame,
    budget: int,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    tokens_col: str = "n_tok",
) -> DataFrame:
    """Context-window tail truncation report: for each conversation, keep
    the longest SUFFIX of whole turns whose token total fits ``budget`` —
    the standard "most recent context wins, never split a turn" rule a
    chat-training pipeline applies before packing. The newest turn is
    kept even when it alone exceeds the budget (a model must see at
    least the last message).

    One reverse cumulative-sum window per conversation (suffix sums) +
    one aggregate on the same partitioning — the standard single conv_id
    exchange; no joins, no global sort, exact integers end to end.

    Output per key: n_turns, n_kept, n_dropped, kept_tokens,
    first_kept_turn, and waste_tokens = budget − kept_tokens (floored at
    0 for the oversized-single-turn case) — the fill-efficiency number
    that sizes the downstream packing bins.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(key)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    suff = df.select(key, order_col, tokens_col).withColumn(
        "_suffix_tok", F.sum(tokens_col).over(w)
    )
    keep = (F.col("_suffix_tok") <= budget) | (
        F.col("_rk") == 1
    )
    suff = suff.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy(key).orderBy(F.desc(order_col))),
    ).withColumn("_keep", keep.cast("int"))
    return (
        suff.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("_keep").cast("long").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("_keep")).cast("long").alias(
                "n_dropped"
            ),
            F.sum(F.col(tokens_col) * F.col("_keep"))
            .cast("long")
            .alias("kept_tokens"),
            F.min(F.when(F.col("_keep") == 1, F.col(order_col)))
            .cast("long")
            .alias("first_kept_turn"),
        )
        .withColumn(
            "waste_tokens",
            F.greatest(F.lit(budget) - F.col("kept_tokens"), F.lit(0)).cast(
                "long"
            ),
        )
    )
