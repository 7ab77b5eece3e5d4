"""Hand-computed invariants for the layout/pruning/mixing operators:
zorder.layout_stats, bloom.prune_stats, textops.mix_allocation,
assoc.tool_pmi."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka2iceberg_spark import assoc, bloom, textops, zorder


def test_layout_stats_grid(spark):
    # 16x16 uniform grid; 16 files. Sort layout on `a` bounds a at exactly
    # 1/16 of the domain (span 0 per file after integer bucketing of 16
    # distinct values into 16 files) and leaves b at full width; z-order
    # bounds both at 1/4 (16 files = 4 bits -> 2 bits per dim).
    rows = [Row(a=i, b=j) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows)
    out = {
        r["layout"]: r
        for r in zorder.layout_stats(df, "a", "b", n_files=16).collect()
    }
    assert out["sort"]["n_files"] == 16
    assert out["sort"]["span_a_ppm"] == 0  # each file = one a value
    assert out["sort"]["span_b_ppm"] == 1_000_000  # full b width
    assert out["zorder"]["n_files"] == 16
    # each z-file is a 4x4 tile: span 3 of domain 15 -> 200000 ppm
    assert out["zorder"]["span_a_ppm"] == 200_000
    assert out["zorder"]["span_b_ppm"] == 200_000


def test_layout_stats_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    try:
        zorder.layout_stats(df, "a", "b", n_files=48)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def _py_positions(k: int, m: int) -> set[int]:
    """Reference positions replicated with hashlib — independent of Spark."""
    import hashlib

    hx = hashlib.md5(str(k).encode()).hexdigest()
    h1 = int(hx[:15], 16)
    h2 = int(hx[:8], 16) * 2 + 1
    return {(h1 + i * h2) % 256 for i in range(3)}


def test_bloom_prune_stats_exact(spark):
    build_keys = list(range(10))
    probe_keys = list(range(40))
    build = spark.createDataFrame([Row(k=k) for k in build_keys])
    probe = spark.createDataFrame([Row(k=k) for k in probe_keys])
    row = bloom.prune_stats(build, probe, m_bits=256, k_hashes=3).collect()[0]
    bits = set().union(*[_py_positions(k, 256) for k in build_keys])
    passed = [k for k in probe_keys if _py_positions(k, 256) <= bits]
    assert row["n_build"] == 10
    assert row["bits_set"] == len(bits)
    assert row["n_probe"] == 40
    assert row["n_true"] == 10
    assert row["n_pass"] == len(passed)
    assert row["false_pos"] == len(passed) - 10
    assert row["fp_ppm"] == (len(passed) - 10) * 1_000_000 // 30
    # every true member must pass (no false negatives, ever)
    assert set(build_keys) <= set(passed)


def test_mix_allocation_waterfill(spark):
    # avail: a=2, b=5, c=10, d=100 (one 'x' word per token). budget =
    # 117*2 div 5 = 46. Ascending: a(2) full, b(5) full, c(10) full?
    # After a,b: rem=39 over 2 bins -> level 19 < 100 ... c: cand =
    # (46-7) div 2 = 19 > 10? no, 19 >= 10 -> c uncapped? cand<avail is
    # False (19<10 false) -> c takes avail 10. d: cand = (46-17) div 1 =
    # 29 < 100 -> capped, alloc 29. Sum = 2+5+10+29 = 46.
    rows = (
        [Row(bin="a", text="x " * 2)]
        + [Row(bin="b", text="x " * 5)]
        + [Row(bin="c", text="x " * 10)]
        + [Row(bin="d", text="x " * 100)]
    )
    df = spark.createDataFrame(rows)
    out = {
        r["bin"]: r["alloc_tokens"]
        for r in textops.mix_allocation(
            df, "bin", budget_num=2, budget_den=5
        ).collect()
    }
    assert out == {"a": 2, "b": 5, "c": 10, "d": 29}


def test_mix_allocation_budget_exceeds_avail(spark):
    df = spark.createDataFrame(
        [Row(bin="a", text="x x x"), Row(bin="b", text="x")]
    )
    out = {
        r["bin"]: (r["avail_tokens"], r["alloc_tokens"])
        for r in textops.mix_allocation(
            df, "bin", budget_num=3, budget_den=1
        ).collect()
    }
    assert out == {"a": (3, 3), "b": (1, 1)}  # everything kept


def test_mix_allocation_remainder_goes_to_smallest_capped(spark):
    # avail: p=10, q=10, budget = 20*2 div 5 = 8 -> both capped at level
    # 4, rem 0. With budget_num=1, den=2 -> budget 10: level (10-0) div 2
    # = 5 < 10 capped; rem = 0; both get 5.
    df = spark.createDataFrame(
        [Row(bin="p", text="x " * 10), Row(bin="q", text="x " * 10)]
    )
    out = {
        r["bin"]: r["alloc_tokens"]
        for r in textops.mix_allocation(
            df, "bin", budget_num=1, budget_den=2
        ).collect()
    }
    assert out == {"p": 5, "q": 5}
    assert sum(out.values()) == 10


def test_tool_pmi_hand_computed(spark):
    # 4 convs with tools: c1 {A,B}, c2 {A,B}, c3 {A}, c4 {B,C}.
    # N=4, c_A=3, c_B=3, c_AB=2 -> pmi = ln(2*4/9) = ln(8/9)
    # c_BC=1 -> ln(1*4/(3*1)) = ln(4/3)
    rows = [
        Row(conv_id="c1", tool="A"), Row(conv_id="c1", tool="B"),
        Row(conv_id="c2", tool="A"), Row(conv_id="c2", tool="B"),
        Row(conv_id="c3", tool="A"),
        Row(conv_id="c4", tool="B"), Row(conv_id="c4", tool="C"),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.current_timestamp())
    out = {
        (r["tool_a"], r["tool_b"]): (r["c_xy"], r["pmi_nano"])
        for r in assoc.tool_pmi(df).collect()
    }
    assert out[("A", "B")][0] == 2
    assert out[("A", "B")][1] == round(math.log(8 / 9) * 1e9)
    assert out[("B", "C")] == (1, round(math.log(4 / 3) * 1e9))
    assert ("A", "C") not in out  # never co-occur
