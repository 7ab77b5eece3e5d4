"""Sequence packing invariants (FFD per hash shard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka2iceberg_spark.packing import bin_stats, pack_sequences
from kafka2iceberg_spark.textops import n_tokens

BUDGET = 64


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_every_doc_packed_once(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = pack_sequences(d, budget=BUDGET, n_shards=8)
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


def test_no_bin_over_budget(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = pack_sequences(d, budget=BUDGET, n_shards=8)
    over = (
        bin_stats(packed, BUDGET)
        .where(F.col("fill_tok") > BUDGET)
        .join(packed, "bin_id")
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("docs_in_bin"))
        .where(F.col("docs_in_bin") > 1)
    )
    # only singleton (oversize) bins may exceed the budget
    assert over.count() == 0


def test_token_counts_consistent(spark, sf_dir):
    d = _docs(spark, sf_dir)
    packed = pack_sequences(d, budget=BUDGET, n_shards=8)
    ref = d.select(
        "doc_id", n_tokens(F.col("text")).alias("expected")
    )
    joined = packed.join(ref, "doc_id").where(
        F.col("n_tok") != F.col("expected")
    )
    assert joined.count() == 0


def test_deterministic_across_runs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = sorted(map(tuple, pack_sequences(d, budget=BUDGET, n_shards=8).collect()))
    b = sorted(map(tuple, pack_sequences(d, budget=BUDGET, n_shards=8).collect()))
    assert a == b


def test_fill_rate_reasonable(spark, sf_dir):
    """FFD should fill bins well; average fill of non-oversize multi-doc
    bins must clear 50% (loose sanity bound, actual is typically ~90%+)."""
    d = _docs(spark, sf_dir)
    packed = pack_sequences(d, budget=BUDGET, n_shards=8)
    stats = bin_stats(packed, BUDGET).where(F.col("fill_tok") <= BUDGET)
    avg_fill = stats.agg(F.avg("fill_ppm")).first()[0]
    assert avg_fill > 500_000, f"mean fill only {avg_fill} ppm"


class TestTruncateTail:
    def test_hand_computed(self, spark):
        from kafka2iceberg_spark.packing import truncate_tail

        # conv A turns (idx, tok): 0:10 1:10 2:10 3:10 -> budget 25 keeps
        # suffix [3,2] (20 tok), drops [0,1]
        rows = [("A", 0, 10), ("A", 1, 10), ("A", 2, 10), ("A", 3, 10),
                # conv B: newest turn alone exceeds budget -> still kept
                ("B", 0, 5), ("B", 1, 40)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tok int")
        out = {r["conv_id"]: r for r in truncate_tail(df, budget=25).collect()}
        a = out["A"]
        assert (a["n_turns"], a["n_kept"], a["n_dropped"]) == (4, 2, 2)
        assert (a["kept_tokens"], a["first_kept_turn"], a["waste_tokens"]) == (20, 2, 5)
        b = out["B"]
        assert (b["n_kept"], b["kept_tokens"], b["first_kept_turn"]) == (1, 40, 1)
        assert b["waste_tokens"] == 0

    def test_exact_fit(self, spark):
        from kafka2iceberg_spark.packing import truncate_tail

        rows = [("C", 0, 10), ("C", 1, 15)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tok int")
        [c] = truncate_tail(df, budget=25).collect()
        assert (c["n_kept"], c["kept_tokens"], c["waste_tokens"]) == (2, 25, 0)
