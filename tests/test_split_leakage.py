"""dedup.split_leakage: cross-split exact-duplicate audit."""

from kafka2iceberg_spark import textops as tx
from kafka2iceberg_spark.dedup import split_leakage

from pyspark.sql import functions as F


def _splits_for(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", tx.dataset_split(F.col("doc_id").cast("string")).alias("s")
        ).collect()
    }


class TestSplitLeakage:
    def test_detects_cross_split_dup(self, spark):
        # find one id per split deterministically, then plant dups
        splits = _splits_for(spark, range(200))
        by_split = {}
        for i, s in sorted(splits.items()):
            by_split.setdefault(s, i)
        tr, va, te = by_split["train"], by_split["val"], by_split["test"]
        rows = [
            (tr, "shared one"), (va, "shared one"),      # train|val leak
            (te, "unique text"),
            (tr + 1000 if splits.get(tr + 1000) else tr, "solo"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["leak_pair"]: r["n_fingerprints"]
               for r in split_leakage(df).collect()}
        assert out["train|val"] == 1
        assert out["train|test"] == 0
        assert out["val|test"] == 0
        assert out["any"] == 1

    def test_same_split_dup_is_not_leakage(self, spark):
        splits = _splits_for(spark, range(400))
        train_ids = [i for i, s in sorted(splits.items()) if s == "train"][:2]
        rows = [(train_ids[0], "dup body"), (train_ids[1], "dup body")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["leak_pair"]: r["n_fingerprints"]
               for r in split_leakage(df).collect()}
        assert out == {"train|val": 0, "train|test": 0,
                       "val|test": 0, "any": 0}


class TestStructureGroups:
    def test_prefix_grouping(self, spark):
        from kafka2iceberg_spark.dedup import structure_groups

        rows = [
            # A and B share the 2-prefix x>y; C differs
            ("A", 0, "x"), ("A", 1, "y"), ("A", 2, "z"),
            ("B", 0, "x"), ("B", 1, "y"),
            ("C", 0, "x"), ("C", 1, "z"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, signal string"
        )
        out = structure_groups(df, prefix_len=2, min_group=2).collect()
        assert len(out) == 1
        [g] = out
        assert (g["struct_sig"], g["n_convs"], g["canonical_conv"]) == (
            "x>y", 2, "A",
        )

    def test_order_not_arrival(self, spark):
        from kafka2iceberg_spark.dedup import structure_groups

        # same multiset, different ORDER -> different signatures
        rows = [("A", 0, "x"), ("A", 1, "y"), ("B", 1, "x"), ("B", 0, "y")]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, signal string"
        )
        assert structure_groups(df, prefix_len=2).count() == 0
