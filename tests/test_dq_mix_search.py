"""Data-quality verification, mixture sampling, and keyword search.

Covers the round-3 additions: dq.verify (Deequ-style single-pass
constraint report), textops.mixture_sample (exact-composition weighted
mixing), and search.inverted_postings / bm25_topk (lexical retrieval).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka2iceberg_spark import dq, search
from kafka2iceberg_spark.textops import mixture_sample


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, age=30, status="A"),
            Row(pid=2, age=45, status="B"),
            Row(pid=3, age=None, status="A"),
            Row(pid=4, age=200, status="Z"),
            Row(pid=4, age=10, status="B"),
        ]
    )


class TestDQ:
    def test_report_metrics_and_verdicts(self, people):
        rep = {
            r["constraint"]: r
            for r in dq.verify(
                people,
                [
                    dq.completeness("age"),
                    dq.unique("pid"),
                    dq.bounds("age", 0, 120),
                    dq.membership("status", ("A", "B")),
                    dq.non_negative("age"),
                ],
            ).collect()
        }
        assert rep["completeness(age)"]["metric"] == pytest.approx(0.8)
        assert not rep["completeness(age)"]["passed"]
        # 4 distinct pids over 5 rows
        assert rep["unique(pid)"]["metric"] == pytest.approx(0.8)
        assert not rep["unique(pid)"]["passed"]
        # ages 30,45,10 in bounds; 200 out; NULL row does not count
        assert rep["bounds(age)"]["metric"] == pytest.approx(0.6)
        assert rep["membership(status)"]["metric"] == pytest.approx(0.8)
        assert rep["non_negative(age)"]["metric"] == pytest.approx(0.8)

    def test_all_pass_on_clean_table(self, spark):
        clean = spark.createDataFrame(
            [Row(pid=i, v=float(i)) for i in range(10)]
        )
        rep = dq.verify(
            clean,
            [dq.completeness("v"), dq.unique("pid"), dq.bounds("v", 0, 9)],
        )
        assert all(r["passed"] for r in rep.collect())

    def test_single_pass_plan(self, people):
        """The report is one aggregate over one scan — no join, no
        second scan of the input."""
        plan = dq.verify(
            people, [dq.completeness("age"), dq.bounds("age", 0, 120)]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan

    def test_empty_constraints_rejected(self, people):
        with pytest.raises(ValueError):
            dq.verify(people, [])


class TestMixture:
    def test_exact_composition_and_determinism(self, spark):
        rows = [
            Row(doc_id=i, source=f"s{i % 3}") for i in range(300)
        ]  # 100 per source
        df = spark.createDataFrame(rows)
        out = mixture_sample(df, "source", {"s0": 4, "s1": 2, "s2": 1})
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        # M = min(100//4, 100//2, 100//1) = 25 -> 100 : 50 : 25
        assert got == {"s0": 100, "s1": 50, "s2": 25}
        # deterministic: same ids on a rerun
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in mixture_sample(
                df, "source", {"s0": 4, "s1": 2, "s2": 1}
            ).collect()
        )
        assert a == b

    def test_sources_outside_parts_dropped(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, source="keep" if i % 2 else "drop") for i in range(20)]
        )
        out = mixture_sample(df, "source", {"keep": 1})
        assert {r["source"] for r in out.collect()} == {"keep"}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="spark join window spark spark"),
            Row(doc_id=1, text="spark join"),
            Row(doc_id=2, text="window window window join filter"),
            Row(doc_id=3, text="filter scan scan"),
            Row(doc_id=4, text="spark"),
        ]
    )


class TestSearch:
    def test_postings_capped_and_ordered_by_tf(self, spark, corpus):
        idx = {
            r["token"]: r
            for r in search.inverted_postings(
                corpus, max_postings=2, min_df=2
            ).collect()
        }
        # 'spark' appears in docs 0(x3), 1, 4 -> df 3, cap 2 keeps 0 then 1
        assert idx["spark"]["df"] == 3
        assert idx["spark"]["total_tf"] == 5
        assert idx["spark"]["postings"] == "0|1"
        # min_df=2 drops 'scan' (one doc)
        assert "scan" not in idx

    def test_bm25_tf_and_idf_ordering(self, spark, corpus):
        top = search.bm25_topk(corpus, ["spark", "join"], k=5).collect()
        ranks = [r["doc_id"] for r in top]
        # both-term docs rank above single-term docs (0 long, 1 short —
        # length normalization puts the short one first, tf saturation
        # keeps 0's triple 'spark' from dominating)
        assert set(ranks[:2]) == {0, 1}
        # doc 3 matches no term -> absent
        assert 3 not in ranks
        by_id = {r["doc_id"]: r for r in top}
        assert by_id[0]["n_terms_hit"] == 2
        assert by_id[4]["n_terms_hit"] == 1
        assert all(
            r["score"] > 0 and math.isfinite(r["score"]) for r in top
        )

    def test_bm25_rare_term_outweighs_common(self, spark, corpus):
        """A term matched by fewer documents carries higher idf: doc 3 is
        the only 'scan' doc and must beat docs that match only the
        ubiquitous 'spark'."""
        top = search.bm25_topk(corpus, ["spark", "scan"], k=5).collect()
        by_id = {r["doc_id"]: r["score"] for r in top}
        assert by_id[3] > by_id[1]  # scan-only doc > one-spark doc

    def test_empty_query_rejected(self, corpus):
        with pytest.raises(ValueError):
            search.bm25_topk(corpus, [])


class TestSparseCosine:
    def test_hand_computed_pair(self, spark):
        import math

        from kafka2iceberg_spark import search

        docs = spark.createDataFrame(
            [(1, "red fish blue fish"), (2, "red fish"), (3, "green tea")],
            ["doc_id", "text"],
        )
        out = {
            (r.doc_a, r.doc_b): (r.dot, r.cos)
            for r in search.sparse_cosine_pairs(
                docs, max_df=10, min_cos=0.0
            ).collect()
        }
        # d1 = {red:1, fish:2, blue:1}, d2 = {red:1, fish:1}
        # dot = 1 + 2 = 3; |d1|^2 = 6, |d2|^2 = 2
        assert out[(1, 2)] == (3, round(3 / math.sqrt(12.0), 6))
        assert (1, 3) not in out and (2, 3) not in out  # no shared token

    def test_df_cap_excludes_stopword_grade_tokens(self, spark):
        from kafka2iceberg_spark import search

        # "the" appears in all 4 docs; with max_df=3 it can neither create
        # candidate pairs nor contribute to dot/norms
        docs = spark.createDataFrame(
            [(i, f"the unique{i}") for i in range(4)], ["doc_id", "text"]
        )
        out = search.sparse_cosine_pairs(docs, max_df=3, min_cos=0.0).collect()
        assert out == []  # only shared token was df-capped away


class TestRRF:
    def _lists(self, spark, *rankings):
        return [
            spark.createDataFrame(r, "doc_id long, rank long")
            for r in rankings
        ]

    def test_hand_computed_fusion(self, spark):
        S = search.RRF_SCALE
        lex, dense = self._lists(
            spark, [(1, 1), (2, 2)], [(2, 1), (3, 2)]
        )
        got = {
            r["doc_id"]: (r["rrf_score"], r["n_lists"])
            for r in search.rrf_fuse([lex, dense], topn=10).collect()
        }
        # doc 2: rank 2 + rank 1 across lists; docs 1/3 single-list
        assert got[2] == (S // 62 + S // 61, 2)
        assert got[1] == (S // 61, 1)
        assert got[3] == (S // 62, 1)

    def test_doc_in_both_lists_outranks_single_list_winner(self, spark):
        # doc 9 is rank 1 in one list only; doc 5 is rank 3 in BOTH —
        # 2/(60+3) > 1/(60+1), so consensus wins under k=60
        a, b = self._lists(
            spark, [(9, 1), (5, 3)], [(7, 1), (5, 3)]
        )
        top = search.rrf_fuse([a, b], topn=1).collect()[0]
        assert top["doc_id"] == 5 and top["n_lists"] == 2

    def test_topn_and_id_tiebreak(self, spark):
        # identical single-list ranks -> equal scores -> smallest id first
        a, b = self._lists(spark, [(8, 1)], [(4, 1)])
        rows = search.rrf_fuse([a, b], topn=1).collect()
        assert [r["doc_id"] for r in rows] == [4]

    def test_empty_input_rejected(self, spark):
        with pytest.raises(ValueError):
            search.rrf_fuse([])


class TestProfile:
    def test_profile_hand_computed(self, spark):
        from kafka2iceberg_spark import dq

        df = spark.createDataFrame(
            [(1, "x"), (1, None), (None, None), (3, "y")],
            "a long, s string",
        )
        rep = {
            r["column"]: r for r in dq.profile(df, ["a", "s"]).collect()
        }
        a, s = rep["a"], rep["s"]
        assert (a["n_rows"], a["n_nulls"], a["n_distinct"]) == (4, 1, 2)
        assert (a["min_val"], a["max_val"]) == ("1", "3")
        assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 2, 2)
        assert (s["min_val"], s["max_val"]) == ("x", "y")

    def test_profile_single_pass_plan(self, spark):
        from kafka2iceberg_spark import dq

        df = spark.createDataFrame([(1, "x")], "a long, s string")
        plan = dq.profile(df, ["a", "s"])._jdf.queryExecution().toString()
        # one Expand-backed aggregate, no joins or extra scans
        assert plan.lower().count("join") == 0

    def test_profile_empty_columns_rejected(self, spark):
        from kafka2iceberg_spark import dq

        df = spark.createDataFrame([(1,)], "a long")
        with pytest.raises(ValueError):
            dq.profile(df, [])


class TestKAnonymity:
    def test_small_classes_flagged(self, spark):
        from kafka2iceberg_spark import dq as dqm

        rows = [("a", "en")] * 6 + [("a", "de")] * 2 + [("b", "en")]
        df = spark.createDataFrame(rows, "src string, lang string")
        out = {
            (r["src"], r["lang"]): r
            for r in dqm.k_anonymity(df, ["src", "lang"], k=3).collect()
        }
        assert not out[("a", "en")]["at_risk"]
        assert out[("a", "de")]["at_risk"] and out[("b", "en")]["at_risk"]
        assert out[("a", "en")]["class_size"] == 6
        # shares: 6/9, 2/9, 1/9 in exact ppm (integer div)
        assert out[("a", "en")]["share_ppm"] == 666_666
        assert out[("b", "en")]["share_ppm"] == 111_111

    def test_all_unique_all_at_risk(self, spark):
        from kafka2iceberg_spark import dq as dqm

        rows = [(f"s{i}", "en") for i in range(4)]
        df = spark.createDataFrame(rows, "src string, lang string")
        out = dqm.k_anonymity(df, ["src", "lang"], k=2).collect()
        assert all(r["at_risk"] for r in out)


class TestLDiversity:
    def test_homogeneous_class_flagged(self, spark):
        from kafka2iceberg_spark import dq as dqm

        rows = [
            # class A: 3 rows, all sensitive 'x' -> at risk for l=2
            ("A", "x"), ("A", "x"), ("A", "x"),
            # class B: 2 rows, 2 distinct -> ok
            ("B", "x"), ("B", "y"),
        ]
        df = spark.createDataFrame(rows, "qi string, s string")
        out = {r["qi"]: (r["class_size"], r["n_sensitive"], r["at_risk"])
               for r in dqm.l_diversity(df, ["qi"], "s", l=2).collect()}
        assert out["A"] == (3, 1, True)
        assert out["B"] == (2, 2, False)


class TestKeySkew:
    def test_top_keys_and_ratios(self, spark):
        from kafka2iceberg_spark import dq as dqm

        rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, "k string")
        out = dqm.key_skew(df, "k", top_k=2).collect()
        assert [(r["rnk"], r["k"], r["n_rows"]) for r in out] == [
            (1, "a", 6), (2, "b", 3),
        ]
        by = {r["k"]: r for r in out}
        # 10 rows over 3 keys: mean load 10/3
        assert by["a"]["share_ppm"] == 600_000
        assert by["a"]["x_mean_ppm"] == 1_800_000  # 6*3*1e6 // 10
        assert by["b"]["x_mean_ppm"] == 900_000

    def test_tie_break_deterministic(self, spark):
        from kafka2iceberg_spark import dq as dqm

        rows = [("z",)] * 2 + [("y",)] * 2 + [("x",)] * 2
        df = spark.createDataFrame(rows, "k string")
        out = dqm.key_skew(df, "k", top_k=2).collect()
        # equal counts -> lexicographic key order decides, both engines
        assert [r["k"] for r in out] == ["x", "y"]


def test_t_closeness_flags_skewed_classes(spark):
    from kafka2iceberg_spark import dq as dqm

    # global: 50/50 en-de. class q1 mirrors it (tvd 0); class q2 is all-en
    # (tvd = 500000 ppm); class q3 lacks 'de' entirely — the absent domain
    # value must still count.
    rows = (
        [("q1", "en")] * 2 + [("q1", "de")] * 2
        + [("q2", "en")] * 4
        + [("q3", "de")] * 4
    )
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r.qi: r for r in dqm.t_closeness(
        df, ["qi"], "s", t_ppm=200_000
    ).collect()}
    assert out["q1"].tvd_ppm == 0 and not out["q1"].at_risk
    assert out["q2"].tvd_ppm == 500_000 and out["q2"].at_risk
    assert out["q3"].tvd_ppm == 500_000 and out["q3"].at_risk
    assert all(r.class_size == 4 for r in out.values())


def test_t_closeness_null_sensitive_is_domain_value(spark):
    """NULL sensitive values are first-class domain values: they count in
    class_size, the global distribution, AND match their own domain row
    through the null-safe cell join (a null-unsafe join would leave every
    NULL-containing class with a phantom deficit and inflated TVD)."""
    from kafka2iceberg_spark import dq as dqm

    # global: en 2/8 (250000 ppm), NULL 6/8 (750000 ppm).
    # q1 = 50/50 en/NULL: tvd = (|500000-250000| + |500000-750000|)/2
    #    = 250000 — requires q1's NULL cell to MATCH its domain row; a
    #    null-unsafe join would read |0-750000| there and report 500000.
    # q2 = all-NULL: tvd = (|0-250000| + |1000000-750000|)/2 = 250000
    #    for the same reason (500000 if the NULL cell went unmatched).
    rows = (
        [("q1", "en")] * 2 + [("q1", None)] * 2
        + [("q2", None)] * 4
    )
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r.qi: r for r in dqm.t_closeness(
        df, ["qi"], "s", t_ppm=200_000
    ).collect()}
    assert out["q1"].class_size == 4 and out["q2"].class_size == 4
    assert out["q1"].tvd_ppm == 250_000 and out["q1"].at_risk
    assert out["q2"].tvd_ppm == 250_000 and out["q2"].at_risk
