"""MATCH_RECOGNIZE-style CEP: declarative regexp path vs positional
mapInPandas path, greedy/non-overlap semantics pinned on handcrafted
conversations, and the full-table twins on the driver transcripts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka2iceberg_spark import cep
from kafka2iceberg_spark.transcripts import transcripts


def _mini(spark, seqs: dict[str, str]):
    """Build a transcripts-shaped df from {conv_id: role_char_string}."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    names = {"u": "user", "a": "assistant", "t": "tool"}
    for conv, s in seqs.items():
        for i, c in enumerate(s):
            rows.append(
                (
                    conv,
                    i,
                    names[c],
                    f"{conv}:{i}",
                    None,
                    base + dt.timedelta(minutes=i),
                )
            )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_compile_pattern():
    assert cep.compile_pattern("user tool+ user") == "ut+u"
    assert cep.compile_pattern("user (?:au)+") == "u(?:au)+"
    assert cep.compile_pattern("user any* assistant") == "u[uat]*a"
    assert cep.compile_pattern("tool{2,3}") == "t{2,3}"


def test_role_sequence_orders_turns(spark):
    df = _mini(spark, {"c1": "uta", "c2": "ua"})
    # shuffle input row order: role_sequence must sort by turn_idx
    got = {
        r["conv_id"]: (r["role_str"], r["n_turns"], list(r["turns"]))
        for r in cep.role_sequence(df.orderBy(F.rand(7))).collect()
    }
    assert got == {"c1": ("uta", 3, [0, 1, 2]), "c2": ("ua", 2, [0, 1])}


def test_non_overlapping_greedy_semantics(spark):
    # "ututu": ONE utu (shared boundary turn collapses); greedy (?:au)+
    df = _mini(spark, {"c1": "ututu", "c2": "uauauautuua"})
    trips = {
        r["conv_id"]: (r["tool_trips"], r["assist_runs"],
                       r["longest_assist_runs"])
        for r in cep.match_counts(
            df, {"tool_trips": "utu", "assist_runs": "u(?:au)+"}
        ).collect()
    }
    assert trips["c1"] == (1, 0, 0)
    # c2: 'uauauau' greedy run of 7, then utu at offset 6? no — scan
    # resumes after the consumed run; remaining 'tuua' holds no match.
    assert trips["c2"] == (1, 1, 7)


def test_match_extract_matches_spans(spark):
    df = _mini(
        spark,
        {"c1": "uauauautuua", "c2": "utuau", "c3": "ttt", "c4": "uau"},
    )
    pat = "u(?:au)+"
    ext = sorted(
        (r["conv_id"], r["match_seq"], r["match_str"], r["match_len"])
        for r in cep.match_extract(df, pat).collect()
    )
    spans = sorted(
        (r["conv_id"], r["match_seq"], r["start_turn"], r["end_turn"],
         r["match_len"], r["span_us"])
        for r in cep.match_spans(df, pat).collect()
    )
    # same matches, same lengths, via two independent code paths
    assert [(c, s, ln) for c, s, _m, ln in ext] == [
        (c, s, ln) for c, s, _st, _en, ln, _sp in spans
    ]
    # positions map back to real turn ids and event-time spans
    by_key = {(c, s): (st, en, sp) for c, s, st, en, _l, sp in spans}
    st, en, sp = by_key[("c2", 0)]
    assert (st, en) == (2, 4)  # 'uau' inside 'utuau'
    assert sp == 2 * 60_000_000  # two 1-minute turn gaps
    st, en, sp = by_key[("c1", 0)]
    assert (st, en, sp) == (0, 6, 6 * 60_000_000)


def test_match_spans_empty_pattern_hits(spark):
    df = _mini(spark, {"c1": "aaa"})
    assert cep.match_spans(df, "utu").count() == 0


def test_counts_keep_matchless_conversations(spark):
    df = _mini(spark, {"c1": "aaa", "c2": "utu"})
    got = {
        r["conv_id"]: (r["tool_trips"], r["longest_tool_trips"])
        for r in cep.match_counts(df, {"tool_trips": "utu"}).collect()
    }
    assert got == {"c1": (0, 0), "c2": (1, 3)}


def test_full_table_twins_agree(spark, sf_dir):
    """Declarative extract vs positional spans on the driver transcripts:
    identical (conv, seq, len) multisets — the regexp_count JVM path and
    re.finditer Arrow path implement the same NFA semantics."""
    t = transcripts(spark, sf_dir)
    pat = "u(?:au)+"
    ext = sorted(
        (r["conv_id"], r["match_seq"], r["match_len"])
        for r in cep.match_extract(t, pat).collect()
    )
    spans = sorted(
        (r["conv_id"], r["match_seq"], r["match_len"])
        for r in cep.match_spans(t, pat).collect()
    )
    assert ext and ext == spans


def test_precedence_support_hand_computed(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # conv A: tool_1@1, tool_2@3 -> supports (t1 before t2) only
    # conv B: tool_2@1, tool_1@3, tool_2@5 -> supports both directions
    # conv C: tool_1 only -> no pairs, but counts in the ppm denominator
    for conv, idx, tool in [
        ("A", 1, "tool_1"),
        ("A", 3, "tool_2"),
        ("B", 1, "tool_2"),
        ("B", 3, "tool_1"),
        ("B", 5, "tool_2"),
        ("C", 2, "tool_1"),
    ]:
        rows.append((conv, idx, "assistant", "t", tool, base))
        rows.append((conv, idx + 100, "user", "u", None, base))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["tool_a"], r["tool_b"]): (r["support"], r["support_ppm"])
        for r in cep.precedence_support(df).collect()
    }
    # 3 tool-using conversations; BIGINT ppm truncates toward zero
    assert got == {
        ("tool_1", "tool_2"): (2, 2_000_000 // 3),
        ("tool_2", "tool_1"): (1, 1_000_000 // 3),
    }


class TestLongestStreaks:
    def test_hand_computed(self, spark):
        from kafka2iceberg_spark.cep import longest_streaks

        rows = [
            # conv A roles: u a a a u -> longest = a x3 starting turn 1
            ("A", 0, "u"), ("A", 1, "a"), ("A", 2, "a"), ("A", 3, "a"),
            ("A", 4, "u"),
            # conv B: tie between two 2-runs -> earliest start wins
            ("B", 0, "t"), ("B", 1, "t"), ("B", 2, "u"), ("B", 3, "u"),
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
        out = {r["conv_id"]: (r["role"], r["streak_len"], r["start_turn"])
               for r in longest_streaks(df).collect()}
        assert out["A"] == ("a", 3, 1)
        assert out["B"] == ("t", 2, 0)


class TestEchoStats:
    def test_hand_computed(self, spark):
        from kafka2iceberg_spark.cep import echo_stats

        # conv A, one role: signals x x x y x -> runs [3,1,1] ->
        # 2 echoes, longest 3
        rows = [
            ("A", "a", "x", 1), ("A", "a", "x", 2), ("A", "a", "x", 3),
            ("A", "a", "y", 4), ("A", "a", "x", 5),
            # conv B: alternating -> zero echoes
            ("B", "a", "x", 1), ("B", "a", "y", 2), ("B", "a", "x", 3),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, role string, signal string, turn_idx int"
        )
        out = {r["conv_id"]: r for r in echo_stats(df).collect()}
        a = out["A"]
        assert (a["n_turns"], a["n_echoes"], a["longest_echo"]) == (5, 2, 3)
        assert a["echo_ppm"] == 400_000
        b = out["B"]
        assert (b["n_echoes"], b["longest_echo"], b["echo_ppm"]) == (0, 1, 0)

    def test_roles_do_not_cross_echo(self, spark):
        from kafka2iceberg_spark.cep import echo_stats

        # same signal, different roles, interleaved: no echo across roles
        rows = [
            ("C", "u", "x", 1), ("C", "a", "x", 2),
            ("C", "u", "x", 3), ("C", "a", "x", 4),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, role string, signal string, turn_idx int"
        )
        # turn_idx is dense per conv but NOT per (conv, role); re-rank the
        # way q_turn_echoes does
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        seq = F.row_number().over(
            Window.partitionBy("conv_id", "role").orderBy("turn_idx")
        )
        [c] = echo_stats(
            df.withColumn("seq", seq), order_col="seq"
        ).collect()
        # within each role the signal repeats consecutively -> 2 echoes
        assert (c["n_turns"], c["n_echoes"], c["longest_echo"]) == (4, 2, 2)
