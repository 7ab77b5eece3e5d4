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
