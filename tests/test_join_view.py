"""Incremental JOIN-view maintenance (matview.IncrementalJoinView): the
delta rule dV = dL><R u L><dR u dL><dR over append-only sources, committed
atomically with both source appends through one MultiTableTransaction.
Parity bar: after any interleaving of per-side insert batches, the
maintained view equals the from-scratch join, and a replayed batch is a
committed no-op."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka2iceberg_spark.matview import IncrementalJoinView
from kafka2iceberg_spark.sink import IcebergLite
from kafka2iceberg_spark.transactions import CatalogLite


def _orders(spark, keys):
    return spark.createDataFrame(
        [(k, f"p{k % 3}") for k in keys], "order_id long, priority string"
    )


def _lines(spark, pairs):
    return spark.createDataFrame(
        [(k, i, float(10 * k + i)) for k, i in pairs],
        "order_id long, line_no long, amount double",
    )


def _mk(tmp_path, name="v", filter_left=None):
    cat = CatalogLite(str(tmp_path / "wh"))
    cat.register(
        "orders", IcebergLite(str(tmp_path / "wh/orders"), pk=["order_id"])
    )
    cat.register(
        "lines",
        IcebergLite(str(tmp_path / "wh/lines"), pk=["order_id", "line_no"]),
    )
    cat.register(
        name, IcebergLite(str(tmp_path / f"wh/{name}"), pk=["order_id", "line_no"])
    )
    return cat, IncrementalJoinView(
        cat,
        "orders",
        "lines",
        name,
        on=["order_id"],
        left_cols=["priority"],
        right_cols=["line_no", "amount"],
        filter_left=filter_left,
    )


def _key(rows):
    return sorted((r["order_id"], r["line_no"], r["priority"], r["amount"]) for r in rows)


def test_interleaved_batches_match_batch_join(spark, tmp_path):
    """Orders and lines arrive out of phase so every delta term fires:
    same-batch pairs (dL><dR), early order + late line (L_pre><dR), and
    late order + early line (dL><R_pre)."""
    cat, jv = _mk(tmp_path)
    # batch 0: orders 1,2 + lines only for 1 (same-batch) and 3 (orphan-for-now)
    jv.apply_batch(
        _orders(spark, [1, 2]), _lines(spark, [(1, 0), (3, 0)]), "b0"
    )
    # batch 1: order 3 (matches committed line) + line for 2 (matches committed order)
    jv.apply_batch(_orders(spark, [3]), _lines(spark, [(2, 0), (2, 1)]), "b1")
    # batch 2: empty left delta, one more line for 1
    jv.apply_batch(_orders(spark, []), _lines(spark, [(1, 1)]), "b2")

    got = _key(jv.read(spark).collect())
    want = _key(jv.recompute(spark).collect())
    assert got == want
    # every pair present exactly once: (1,0),(1,1),(2,0),(2,1),(3,0)
    assert [(o, l) for o, l, _, _ in got] == [(1, 0), (1, 1), (2, 0), (2, 1), (3, 0)]


def test_replayed_batch_is_noop(spark, tmp_path):
    cat, jv = _mk(tmp_path)
    assert jv.apply_batch(_orders(spark, [1]), _lines(spark, [(1, 0)]), "b0")
    before = _key(jv.read(spark).collect())
    # a restarted micro-batch re-delivers the same batch id
    assert not jv.apply_batch(_orders(spark, [1]), _lines(spark, [(1, 0)]), "b0")
    assert _key(jv.read(spark).collect()) == before
    assert jv.read(spark).count() == 1


def test_duplicate_keys_multiply_like_a_join(spark, tmp_path):
    """Join semantics, not upsert semantics: two order rows with the same
    key arriving in different batches each match every line row."""
    cat, jv = _mk(tmp_path)
    jv.apply_batch(_orders(spark, [7]), _lines(spark, [(7, 0)]), "b0")
    jv.apply_batch(_orders(spark, [7]), _lines(spark, [(7, 1)]), "b1")
    got = jv.read(spark)
    assert got.count() == 4  # 2 order rows x 2 line rows
    assert _key(got.collect()) == _key(jv.recompute(spark).collect())


def test_filter_pushed_into_deltas(spark, tmp_path):
    """filter_left is part of the view definition: non-matching left rows
    never enter the view even when their lines arrive later."""
    cat, jv = _mk(tmp_path, name="vf", filter_left="priority = 'p1'")
    jv.apply_batch(_orders(spark, [1, 2, 3]), _lines(spark, []), "b0")
    jv.apply_batch(_orders(spark, []), _lines(spark, [(1, 0), (2, 0), (3, 0)]), "b1")
    rows = jv.read(spark).collect()
    assert {r["order_id"] for r in rows} == {1}  # only 1 % 3 == 1 -> p1
    assert _key(rows) == _key(jv.recompute(spark).collect())


def test_tagged_stream_maintains_view(spark, tmp_path):
    """One tagged file stream carries both sides (the multi-table broker
    shape); split() routes rows per micro-batch and the three-table commit
    stays atomic. End state == from-scratch join."""
    src = tmp_path / "src"
    os.makedirs(src)
    batches = [
        [("o", 1, "p1", None, None), ("l", 1, None, 0, 10.0)],
        [("o", 2, "p2", None, None), ("l", 1, None, 1, 11.0)],
        [("l", 2, None, 0, 20.0), ("o", 3, "p0", None, None)],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"{i}.jsonl", "w") as fh:
            for side, oid, prio, line_no, amount in rows:
                fh.write(
                    json.dumps(
                        {
                            "side": side,
                            "order_id": oid,
                            "priority": prio,
                            "line_no": line_no,
                            "amount": amount,
                        }
                    )
                    + "\n"
                )
    cat, jv = _mk(tmp_path)
    stream = (
        spark.readStream.schema(
            "side string, order_id long, priority string, line_no long, amount double"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )

    def split(df):
        return (
            df.where(F.col("side") == "o").select("order_id", "priority"),
            df.where(F.col("side") == "l").select("order_id", "line_no", "amount"),
        )

    q = jv.start(stream, split, str(tmp_path / "ck"))
    q.awaitTermination()
    got = _key(jv.read(spark).collect())
    assert got == _key(jv.recompute(spark).collect())
    assert [(o, l) for o, l, _, _ in got] == [(1, 0), (1, 1), (2, 0)]
