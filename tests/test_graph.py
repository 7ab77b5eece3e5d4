"""graph operators: PageRank fixed-point invariants, degree stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka2iceberg_spark import graph as gr
from kafka2iceberg_spark.graph import RANK_SCALE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_symmetric_pair_is_uniform(spark):
    # two nodes pointing at each other: every iteration maps rank r to
    # .15*S + .85*r; starting from S the closed form stays equal on both
    e = _edges(spark, [(1, 2), (2, 1)])
    r = {x["node"]: x["rank_fp"] for x in gr.pagerank(e, iters=3).collect()}
    assert r[1] == r[2]
    # hand-rolled integer recurrence
    v = RANK_SCALE
    for _ in range(3):
        v = (15 * RANK_SCALE) // 100 + (85 * v) // 100
    assert r[1] == v


def test_pagerank_star_center_dominates(spark):
    # undirected star: center 0 <-> leaves 1..4; the center accumulates
    # every leaf's full rank while each leaf gets 1/4 of the center's
    pairs = []
    for leaf in (1, 2, 3, 4):
        pairs += [(0, leaf), (leaf, 0)]
    r = {
        x["node"]: x["rank_fp"]
        for x in gr.pagerank(_edges(spark, pairs), iters=3).collect()
    }
    assert len(r) == 5
    assert all(r[0] > r[leaf] for leaf in (1, 2, 3, 4))
    leaf_ranks = {r[leaf] for leaf in (1, 2, 3, 4)}
    assert len(leaf_ranks) == 1  # symmetry preserved exactly


def test_pagerank_deterministic_across_partitionings(spark):
    # integer fixed-point: results identical regardless of partition count
    pairs = [(i, (i * 7) % 13) for i in range(13)] + [
        ((i * 7) % 13, i) for i in range(13)
    ]
    e1 = _edges(spark, pairs).repartition(1)
    e8 = _edges(spark, pairs).repartition(8)
    r1 = sorted(map(tuple, gr.pagerank(e1, iters=3).collect()))
    r8 = sorted(map(tuple, gr.pagerank(e8, iters=3).collect()))
    assert r1 == r8


def test_copurchase_edges_bidirectional_no_sinks(spark):
    orders = spark.createDataFrame(
        [(100, 7), (101, 8)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(100, 3), (100, 4), (101, 3), (101, 3)],
        "l_orderkey long, l_suppkey long",
    )
    e = gr.copurchase_edges(orders, li)
    rows = {(x["src"], x["dst"]) for x in e.collect()}
    # distinct relations: (7,3) (7,4) (8,3) -> 6 directed edges
    assert len(rows) == 6
    srcs = {s for s, _ in rows}
    dsts = {d for _, d in rows}
    assert srcs == dsts  # every node has both in- and out-edges
    # encoding: customers even, suppliers odd
    assert {14, 16, 7, 9} <= srcs


def test_degree_stats(spark):
    e = _edges(spark, [(1, 2), (1, 3), (3, 1)])
    d = {x["node"]: (x["out_deg"], x["in_deg"]) for x in gr.degree_stats(e).collect()}
    assert d == {1: (2, 1), 2: (0, 1), 3: (1, 1)}
