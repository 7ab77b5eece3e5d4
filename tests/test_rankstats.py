"""rankstats operators: Pareto front dominance, Spearman rank correlation,
plus the new timeseries sequence ops (EWMA fold, transitions) and the
sequential Poisson sampler."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka2iceberg_spark import rankstats as rk
from kafka2iceberg_spark import textops as tx
from kafka2iceberg_spark import timeseries as ts


def _parts(spark, rows):
    return spark.createDataFrame(
        rows, "grp string, pk long, price long, size int"
    )


def test_pareto_front_basic_dominance(spark):
    df = _parts(
        spark,
        [
            ("b", 1, 100, 10),   # front (cheapest)
            ("b", 2, 200, 20),   # front (bigger)
            ("b", 3, 300, 15),   # dominated by pk=2 (pricier, smaller)
            ("b", 4, 200, 20),   # exact duplicate of pk=2 -> dropped
            ("b", 5, 100, 12),   # dominates pk=1? same price bigger size
        ],
    )
    got = {
        x["pk"]
        for x in rk.pareto_front(df, "grp", "price", "size", "pk").collect()
    }
    # pk=5 kills pk=1 (same price, strictly bigger); duplicate keeps pk=2
    assert got == {5, 2}


def test_pareto_front_groups_independent(spark):
    df = _parts(spark, [("a", 1, 100, 5), ("b", 2, 50, 1)])
    got = rk.pareto_front(df, "grp", "price", "size", "pk").count()
    assert got == 2


def test_spearman_perfect_and_inverse(spark):
    rows = [("g", i, i * 10, i * 3) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "grp string, pk long, x long, y long")
    out = rk.spearman(df, "grp", "x", "y", "pk").collect()[0]
    assert out["n"] == 5 and out["rho"] == 1.0

    inv = [("g", i, i * 10, -i * 3) for i in range(1, 6)]
    df2 = spark.createDataFrame(inv, "grp string, pk long, x long, y long")
    out2 = rk.spearman(df2, "grp", "x", "y", "pk").collect()[0]
    assert out2["rho"] == -1.0


def test_spearman_singleton_group_null(spark):
    df = spark.createDataFrame(
        [("g", 1, 5, 5)], "grp string, pk long, x long, y long"
    )
    out = rk.spearman(df, "grp", "x", "y", "pk").collect()[0]
    assert out["n"] == 1 and out["rho"] is None


def _resampled(spark, rows):
    return spark.createDataFrame(rows, "key string, bucket_us long, v long")


def test_ewma_halving_recurrence(spark):
    r = _resampled(
        spark, [("a", 0, 100), ("a", 1, 200), ("a", 2, 0), ("a", 3, 7)]
    )
    got = {
        x["bucket_us"]: x["ewma_cents"]
        for x in ts.ewma(r, ["key"], "v").collect()
    }
    # e1=100; e2=(100+200)//2=150; e3=75; e4=(75+7)//2=41
    assert got == {0: 100, 1: 150, 2: 75, 3: 41}


def test_ewma_per_key_isolation(spark):
    r = _resampled(spark, [("a", 0, 10), ("b", 0, 99), ("a", 1, 20)])
    got = {
        (x["key"], x["bucket_us"]): x["ewma_cents"]
        for x in ts.ewma(r, ["key"], "v").collect()
    }
    assert got == {("a", 0): 10, ("a", 1): 15, ("b", 0): 99}


def test_transition_counts_probabilities(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 7, "view"),
        (2, dt.datetime(2024, 1, 1, 0, 1), 7, "click"),
        (3, dt.datetime(2024, 1, 1, 0, 2), 7, "view"),
        (4, dt.datetime(2024, 1, 1, 0, 3), 7, "click"),
        (5, dt.datetime(2024, 1, 1, 0, 0), 8, "view"),
        (6, dt.datetime(2024, 1, 1, 0, 5), 8, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (x["prev_type"], x["event_type"]): (x["n"], x["prob"])
        for x in ts.transition_counts(df).collect()
    }
    # user 7: view->click, click->view, view->click; user 8: view->buy
    assert got[("view", "click")] == (2, round(2 / 3, 6))
    assert got[("view", "buy")] == (1, round(1 / 3, 6))
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 3


def test_transition_counts_ties_broken_by_event_id(spark):
    # same-ts events must order by event_id for a deterministic chain
    rows = [
        (2, dt.datetime(2024, 1, 1), 7, "b"),
        (1, dt.datetime(2024, 1, 1), 7, "a"),
        (3, dt.datetime(2024, 1, 1), 7, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (x["prev_type"], x["event_type"])
        for x in ts.transition_counts(df).collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_seq_poisson_sample_is_deterministic_and_weighted(spark):
    rows = [(i, "t", 10 if i % 2 else 1000) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    s1 = [x["doc_id"] for x in tx.seq_poisson_sample(df, "n_chars", 20).collect()]
    s2 = [x["doc_id"] for x in tx.seq_poisson_sample(df, "n_chars", 20).collect()]
    assert s1 == s2 and len(s1) == 20
    # heavy docs (w=1000, even ids) should dominate the PPS sample
    heavy = sum(1 for d in s1 if d % 2 == 0)
    assert heavy >= 15


def test_jaccard_prefix_join_equals_all_pairs(spark):
    from kafka2iceberg_spark import dedup as dd

    docs = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonite"),   # near-dup of 1
        (3, "completely different text about spark partitions"),
        (4, "completely different text about spark partition"),      # near-dup of 3
        (5, "unrelated singleton content with its own words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = sorted(
        map(tuple, dd.ngram_jaccard_pairs(df, threshold=0.8).collect())
    )
    pref = sorted(
        map(
            tuple,
            dd.jaccard_prefix_pairs(
                df, threshold_num=4, threshold_den=5
            ).collect(),
        )
    )
    assert pref == exact
    assert {(a, b) for a, b, _ in pref} == {(1, 2), (3, 4)}


def test_jaccard_prefix_length_integer_ceil(spark):
    # 0.8 * 5 must ceil to 4 (prefix 2), not float-ceil to 5 (prefix 1):
    # two 5-shingle docs differing only in their 2nd-rarest shingle must
    # still produce the candidate pair if they qualify
    from kafka2iceberg_spark import dedup as dd

    # identical docs -> J=1.0 >= 0.8 must survive whatever the prefix math
    df = spark.createDataFrame(
        [(1, "abcdefg"), (2, "abcdefg")], "doc_id long, text string"
    )
    got = dd.jaccard_prefix_pairs(df, 4, 5).collect()
    assert len(got) == 1 and got[0]["jaccard"] == 1.0


def test_jaccard_prefix_word_unit_equals_all_pairs(spark):
    from kafka2iceberg_spark import dedup as dd
    from pyspark.sql import functions as F

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
        (3, "one two three four five six seven eight nine ten"),
        (4, "tiny"),  # fewer than 3 words -> no grams, no crash
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pref = sorted(
        map(
            tuple,
            dd.jaccard_prefix_pairs(df, 3, 4, n=3, unit="word").collect(),
        )
    )
    # brute-force word-3-gram Jaccard via the same shingle helper
    sh = dd.word_shingles(dd._with_norm(df, "text"))
    sz = {r["doc_id"]: r["c"] for r in sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    rows = sh.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["g"])
    exact = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (sz[a] + sz[b] - inter)
                if round(j, 4) >= 0.75:
                    exact.append((a, b, round(j, 4)))
    assert pref == sorted(exact)
    assert {(a, b) for a, b, _ in pref} == {(1, 2)}


class TestWinsorize:
    def _w(self, spark, vals, lo=100_000, hi=900_000):
        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)],
            "key string, oid long, v long",
        )
        from kafka2iceberg_spark.rankstats import winsorize

        return {
            r["oid"]: (r["v_winsor"], r["lo_bound"], r["hi_bound"])
            for r in winsorize(df, ["key"], "v", "oid", lo, hi).collect()
        }

    def test_bounds_are_exact_discrete_percentiles(self, spark):
        # n=10, p10 -> rank ceil(0.1*10)=1 -> value 1; p90 -> rank 9 -> 9
        got = self._w(spark, list(range(1, 11)))
        assert got[0] == (1, 1, 9)      # v=1 stays (== lo bound)
        assert got[9] == (9, 1, 9)      # v=10 clipped to 9
        assert got[4] == (5, 1, 9)      # interior untouched

    def test_single_row_group_clips_to_itself(self, spark):
        got = self._w(spark, [42])
        assert got[0] == (42, 42, 42)

    def test_negative_values_and_ceil_edge(self, spark):
        # n=3, lo=340000: ceil(0.34*3)=ceil(1.02)=2 -> second value
        got = self._w(spark, [-50, -10, 30], lo=340_000, hi=900_000)
        assert got[0] == (-10, -10, 30)  # -50 raised to lo bound -10
        assert got[2] == (30, -10, 30)   # hi rank ceil(2.7)=3 -> 30

    def test_invalid_ppm_rejected(self, spark):
        from kafka2iceberg_spark.rankstats import winsorize

        df = spark.createDataFrame([("g", 1, 1)], "key string, oid long, v long")
        import pytest as _pt

        with _pt.raises(ValueError):
            winsorize(df, ["key"], "v", "oid", 0, 500_000)


class TestGini:
    def _g(self, spark, weights, groups=None):
        from kafka2iceberg_spark.rankstats import gini

        if groups is None:
            df = spark.createDataFrame(
                [(i, w) for i, w in enumerate(weights)], "k long, w long"
            )
            return gini(df, "w").collect()[0]
        df = spark.createDataFrame(
            [(g, i, w) for i, (g, w) in enumerate(weights)],
            "grp string, k long, w long",
        )
        return {
            r["grp"]: r["gini"] for r in gini(df, "w", ["grp"]).collect()
        }

    def test_uniform_weights_gini_zero(self, spark):
        r = self._g(spark, [7, 7, 7, 7])
        assert r["gini"] == 0.0 and r["n"] == 4 and r["s"] == 28

    def test_hand_computed_skewed(self, spark):
        # sorted [1,1,1,97]: 2*sum(i*x)=788, (n+1)*s=500, n*s=400 -> 0.72
        r = self._g(spark, [97, 1, 1, 1])
        assert r["gini"] == 0.72

    def test_tie_collapse_equals_direct_ranks(self, spark):
        # values with heavy ties: histogram algebra == naive sorted-rank sum
        ws = [1, 1, 2, 2, 2, 5, 5, 9]
        xs = sorted(ws)
        n, s = len(xs), sum(xs)
        want = round((2 * sum((i + 1) * x for i, x in enumerate(xs))
                      - (n + 1) * s) / (n * s), 6)
        assert self._g(spark, ws)["gini"] == want

    def test_groups_independent(self, spark):
        got = self._g(
            spark,
            [("a", 5), ("a", 5), ("b", 1), ("b", 99)],
            groups=True,
        )
        assert got["a"] == 0.0 and got["b"] == 0.49


class TestReadability:
    def _fre(self, spark, text):
        from kafka2iceberg_spark.textops import readability

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = readability(df).collect()
        return rows[0] if rows else None

    def test_hand_computed_flesch(self, spark):
        r = self._fre(spark, "Hello world. Nice!")
        # words=3, sentences=2, syllables=2+1+2=5
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 2, 5)
        assert r["fre"] == round(206.835 - 1.015 * (3 / 2) - 84.6 * (5 / 3), 4)

    def test_vowelless_word_floors_at_one_syllable(self, spark):
        r = self._fre(spark, "zzz grr")
        assert r["n_syllables"] == 2 and r["n_sentences"] == 1

    def test_empty_doc_dropped(self, spark):
        assert self._fre(spark, "!!!") is None


class TestKappa:
    def _k(self, spark, pairs):
        from kafka2iceberg_spark.rankstats import cohens_kappa

        df = spark.createDataFrame(pairs, "a string, b string")
        return cohens_kappa(df, "a", "b").collect()[0]

    def test_perfect_agreement_is_one(self, spark):
        r = self._k(spark, [("x", "x"), ("y", "y"), ("x", "x")])
        assert r["kappa"] == 1.0

    def test_hand_computed_textbook_case(self, spark):
        # classic 2x2: conf = [[20, 5], [10, 15]], n=50
        # po_num=35, pe_num = 25*30 + 25*20 = 1250
        # kappa = (50*35 - 1250)/(2500 - 1250) = 500/1250 = 0.4
        pairs = (
            [("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
        )
        r = self._k(spark, pairs)
        assert (r["n"], r["po_num"], r["pe_num"]) == (50, 35, 1250)
        assert r["kappa"] == 0.4

    def test_chance_level_agreement_is_zero(self, spark):
        # independent marginals: conf [[1,1],[1,1]] -> po=0.5, pe=0.5
        r = self._k(spark, [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")])
        assert r["kappa"] == 0.0

    def test_degenerate_constant_labels_null(self, spark):
        r = self._k(spark, [("x", "x"), ("x", "x")])
        assert r["kappa"] is None


class TestOLS2:
    def _fit(self, spark, rows):
        from kafka2iceberg_spark.rankstats import ols2

        df = spark.createDataFrame(
            rows, "grp string, x1 long, x2 long, y long"
        )
        return {
            r["grp"]: (r["b0"], r["b1"], r["b2"])
            for r in ols2(df, "y", "x1", "x2", ["grp"]).collect()
        }

    def test_exact_plane_recovered(self, spark):
        # y = 2 + 3*x1 + 5*x2, zero residual -> coefficients exact
        pts = [(1, 1), (2, 1), (1, 2), (3, 2), (2, 4), (5, 1)]
        rows = [("g", a, b, 2 + 3 * a + 5 * b) for a, b in pts]
        got = self._fit(spark, rows)
        assert got["g"] == (2.0, 3.0, 5.0)

    def test_collinear_regressors_yield_null(self, spark):
        # x2 = 2*x1 exactly -> singular normal equations -> NULLs
        rows = [("g", a, 2 * a, 7 * a) for a in range(1, 6)]
        got = self._fit(spark, rows)
        assert got["g"] == (None, None, None)

    def test_groups_fit_independently(self, spark):
        rows = [("a", x, y, 10 + x + y) for x, y in [(1, 2), (2, 1), (3, 3), (1, 1)]]
        rows += [("b", x, y, 100 - x + 2 * y) for x, y in [(1, 2), (2, 1), (3, 3), (1, 1)]]
        got = self._fit(spark, rows)
        assert got["a"] == (10.0, 1.0, 1.0)
        assert got["b"] == (100.0, -1.0, 2.0)


class TestMAD:
    def _m(self, spark, vals, k_ppm=3_000_000):
        from kafka2iceberg_spark.rankstats import mad_outliers

        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)],
            "key string, oid long, v long",
        )
        rows = mad_outliers(df, ["key"], "v", "oid", k_ppm).collect()
        return {r["oid"]: (r["median"], r["mad"], r["is_outlier"]) for r in rows}

    def test_mega_outlier_does_not_mask_itself(self, spark):
        # [10,11,12,13,1000]: median=12, adevs sorted [0,1,1,2,988] ->
        # MAD (lower median, rank 3) = 1; 1000 flags (988 > 3*1)
        got = self._m(spark, [10, 11, 12, 13, 1000])
        assert got[4] == (12, 1, True)
        assert got[0] == (12, 1, False)  # |10-12|=2 <= 3

    def test_zero_mad_flags_everything_off_median(self, spark):
        # majority at one value: MAD=0 -> any deviation flags
        got = self._m(spark, [5, 5, 5, 9])
        assert got[3][2] is True and got[0][2] is False

    def test_even_group_uses_lower_median(self, spark):
        # n=4 -> rank (4+1)//2 = 2 -> lower middle value
        got = self._m(spark, [1, 2, 8, 9])
        assert got[0][0] == 2


class TestTwoProportionZ:
    def _z(self, spark, rows):
        from kafka2iceberg_spark.rankstats import two_proportion_z

        df = spark.createDataFrame(rows, "variant string, ok long")
        return two_proportion_z(df, "variant", "ok").collect()[0]

    def test_hand_computed_statistic(self, spark):
        import math

        # A: 8/10, B: 5/10 -> pool 0.65
        rows = [("A", 1)] * 8 + [("A", 0)] * 2 + [("B", 1)] * 5 + [("B", 0)] * 5
        r = self._z(spark, rows)
        want = (0.8 - 0.5) / math.sqrt(0.65 * 0.35 * (0.1 + 0.1))
        assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (10, 8, 10, 5)
        assert r["z"] == round(want, 6)
        assert r["n_variants"] == 2

    def test_identical_rates_z_zero(self, spark):
        rows = [("A", 1), ("A", 0), ("B", 1), ("B", 0)]
        assert self._z(spark, rows)["z"] == 0.0

    def test_degenerate_all_converted_null(self, spark):
        rows = [("A", 1), ("B", 1)]
        assert self._z(spark, rows)["z"] is None


class TestKS:
    def _d(self, spark, a_vals, b_vals):
        from kafka2iceberg_spark.rankstats import ks_test

        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, v long")
        return ks_test(df, "g", "v").collect()[0]

    def test_identical_samples_d_zero(self, spark):
        r = self._d(spark, [1, 2, 3, 4], [1, 2, 3, 4])
        assert r["d"] == 0.0 and r["n_groups"] == 2

    def test_disjoint_supports_d_one(self, spark):
        r = self._d(spark, [1, 2, 3], [10, 11, 12])
        assert r["d"] == 1.0

    def test_hand_computed_sup(self, spark):
        # a=[1,2], b=[2,3]: F_a(1)=.5,F_b(1)=0 -> .5; F_a(2)=1,F_b(2)=.5 -> .5
        # sup = 0.5; common denominator: max|ca*nb - cb*na| = 2, nb*na = 4
        r = self._d(spark, [1, 2], [2, 3])
        assert (r["d_num"], r["d"]) == (2, 0.5)

    def test_unbalanced_sizes_exact(self, spark):
        # a=[1], b=[1,2,2]: F_a(1)=1, F_b(1)=1/3 -> sup=2/3
        r = self._d(spark, [1], [1, 2, 2])
        assert r["d"] == round(2 / 3, 6)


class TestPSI:
    def _p(self, spark, a_vals, b_vals, width=1):
        from kafka2iceberg_spark.rankstats import psi

        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, v long")
        return psi(df, "g", "v", bucket_width=width).collect()[0]

    def test_identical_distributions_zero(self, spark):
        r = self._p(spark, [1, 2, 3, 3], [1, 2, 3, 3])
        assert r["psi"] == 0.0 and r["n_bins"] == 3

    def test_hand_computed_two_bins(self, spark):
        import math

        # a: 3x bin0, 1x bin1; b: 1x bin0, 3x bin1; +1 smoothing, B=2:
        # pa = [4/6, 2/6], pb = [2/6, 4/6]
        r = self._p(spark, [0, 0, 0, 1], [0, 1, 1, 1])
        t = (4 / 6 - 2 / 6) * math.log((4 / 6) / (2 / 6))
        want = round((round(t * 1e9) + round(-t * -1e9 * 0) + round((2 / 6 - 4 / 6) * math.log((2 / 6) / (4 / 6)) * 1e9)) / 1e9, 6)
        assert r["psi"] == want
        assert r["psi"] > 0.25  # "shifted" by the monitoring rule of thumb

    def test_one_sided_bin_is_finite(self, spark):
        # value 9 appears only in b: smoothing keeps the term finite
        r = self._p(spark, [1, 1], [1, 9])
        assert r["psi"] is not None and r["psi"] > 0

    def test_invalid_width_rejected(self, spark):
        from kafka2iceberg_spark.rankstats import psi
        import pytest as _pt

        df = spark.createDataFrame([("a", 1)], "g string, v long")
        with _pt.raises(ValueError):
            psi(df, "g", "v", bucket_width=0)


class TestCUPED:
    def _c(self, spark, rows):
        from kafka2iceberg_spark.rankstats import cuped

        df = spark.createDataFrame(rows, "variant string, x long, y long")
        return cuped(df, "variant", "x", "y").collect()[0]

    def test_perfectly_correlated_covariate_removes_all_variance(self, spark):
        # y = 2x exactly -> theta = 2, rho2 = 1, both adjusted means equal
        rows = [("A", 1, 2), ("A", 3, 6), ("B", 2, 4), ("B", 4, 8)]
        r = self._c(spark, rows)
        assert r["theta"] == 2.0 and r["rho2"] == 1.0
        assert r["mean_adj_a"] == r["mean_adj_b"] == 5.0  # pooled mean of y

    def test_uncorrelated_covariate_changes_nothing(self, spark):
        # x constant per unit pattern has zero covariance with y
        rows = [("A", 1, 10), ("A", 2, 20), ("B", 1, 20), ("B", 2, 10)]
        r = self._c(spark, rows)
        assert r["theta"] == 0.0 and r["rho2"] == 0.0
        assert r["mean_adj_a"] == 15.0 and r["mean_adj_b"] == 15.0

    def test_degenerate_constant_covariate_nulls(self, spark):
        rows = [("A", 5, 1), ("B", 5, 2)]
        r = self._c(spark, rows)
        assert r["theta"] is None and r["rho2"] is None


class TestRocAuc:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, score long, pos boolean"
        )

    def test_perfect_separation_auc_one(self, spark):
        rows = [("g", s, s >= 3) for s in [1, 2, 3, 4]]
        out = rk.roc_auc(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()[0]
        assert out["auc"] == 1.0 and out["n_pos"] == 2 and out["n_neg"] == 2

    def test_hand_computed_with_ties(self, spark):
        # scores: neg 1, pos 1, neg 2, pos 3. Pairs (pos, neg): (1,1)
        # ties -> 0.5; (1,2) loses -> 0; (3,1) wins -> 1; (3,2) wins -> 1.
        # AUC = 2.5 / 4 = 0.625
        rows = [("g", 1, False), ("g", 1, True), ("g", 2, False), ("g", 3, True)]
        out = rk.roc_auc(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()[0]
        assert out["auc"] == 0.625
        assert out["u2"] == 5  # 2*U = 2*2.5

    def test_random_score_auc_half(self, spark):
        # symmetric: every positive score mirrored by an equal negative
        rows = [("g", s, True) for s in [1, 2, 3]] + [
            ("g", s, False) for s in [1, 2, 3]
        ]
        out = rk.roc_auc(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()[0]
        assert out["auc"] == 0.5

    def test_degenerate_single_class_null(self, spark):
        rows = [("g", 1, True), ("g", 2, True)]
        out = rk.roc_auc(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()[0]
        assert out["auc"] is None and out["n_neg"] == 0

    def test_groups_independent(self, spark):
        rows = [("a", 1, False), ("a", 2, True),
                ("b", 1, True), ("b", 2, False)]
        out = {
            r["grp"]: r["auc"]
            for r in rk.roc_auc(
                self._df(spark, rows), ["grp"], "score", "pos"
            ).collect()
        }
        assert out == {"a": 1.0, "b": 0.0}


class TestEceCalibration:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, score long, pos boolean"
        )

    def test_perfectly_calibrated_bin(self, spark):
        # bin 5 (500000..599999): two rows at 500000, one positive ->
        # sum_score = 1_000_000, n_pos = 1 -> gap 0
        rows = [("g", 500_000, True), ("g", 500_000, False)]
        out = rk.ece_calibration(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()
        assert len(out) == 1
        assert out[0]["bin"] == 5
        assert out[0]["gap_ppm_num"] == 0 and out[0]["ece_ppm"] == 0.0

    def test_hand_computed_two_bins(self, spark):
        # bin 0: score 100000, neg -> gap |100000 - 0| = 100000
        # bin 9: score 900000 x2, one pos -> gap |1800000 - 1000000| = 800000
        # ECE_ppm = (100000 + 800000) / 3 = 300000
        rows = [("g", 100_000, False), ("g", 900_000, True), ("g", 900_000, False)]
        out = rk.ece_calibration(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()
        by_bin = {r["bin"]: r for r in out}
        assert by_bin[1]["gap_ppm_num"] == 100_000
        assert by_bin[9]["gap_ppm_num"] == 800_000
        assert out[0]["ece_ppm"] == 300_000.0

    def test_top_edge_score_clamped_to_last_bin(self, spark):
        rows = [("g", 1_000_000, True)]
        out = rk.ece_calibration(
            self._df(spark, rows), ["grp"], "score", "pos"
        ).collect()[0]
        assert out["bin"] == 9

    def test_invalid_bins_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError):
            rk.ece_calibration(
                self._df(spark, [("g", 1, True)]), ["grp"], "score", "pos",
                n_bins=7,
            )


class TestKendallTau:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, x long, y long")

    def test_perfect_agreement(self, spark):
        rows = [("g", i, i * 10) for i in range(5)]
        out = rk.kendall_tau(
            self._df(spark, rows), ["grp"], "x", "y"
        ).collect()[0]
        assert out["tau_b"] == 1.0 and out["discordant"] == 0
        assert out["concordant"] == 10 and out["n_pairs"] == 10

    def test_perfect_reversal(self, spark):
        rows = [("g", i, -i) for i in range(5)]
        out = rk.kendall_tau(
            self._df(spark, rows), ["grp"], "x", "y"
        ).collect()[0]
        assert out["tau_b"] == -1.0 and out["concordant"] == 0

    def test_hand_computed_with_ties(self, spark):
        # (1,1) (1,2) (2,1) (3,3):
        # pairs: (1,1)-(1,2) xtie; (1,1)-(2,1) ytie; (1,1)-(3,3) C;
        # (1,2)-(2,1) D; (1,2)-(3,3) C; (2,1)-(3,3) C
        # C=3 D=1 xtie=1 ytie=1 tot=6
        # tau_b = 2 / (sqrt(5)*sqrt(5)) = 0.4
        rows = [("g", 1, 1), ("g", 1, 2), ("g", 2, 1), ("g", 3, 3)]
        out = rk.kendall_tau(
            self._df(spark, rows), ["grp"], "x", "y"
        ).collect()[0]
        assert out["concordant"] == 3 and out["discordant"] == 1
        assert out["xtie"] == 1 and out["ytie"] == 1
        assert out["tau_b"] == 0.4

    def test_constant_column_null(self, spark):
        rows = [("g", 1, 7), ("g", 2, 7), ("g", 3, 7)]
        out = rk.kendall_tau(
            self._df(spark, rows), ["grp"], "x", "y"
        ).collect()[0]
        assert out["tau_b"] is None and out["ytie"] == 3

    def test_matches_quadratic_definition_random(self, spark):
        # deterministic pseudo-random series vs the O(n^2) definition
        xs = [(i * 37) % 23 for i in range(60)]
        ys = [(i * 17 + 5) % 19 for i in range(60)]
        rows = [("g", x, y) for x, y in zip(xs, ys)]
        c = d = xt = yt = 0
        n = len(rows)
        for i in range(n):
            for j in range(i + 1, n):
                dx = xs[i] - xs[j]
                dy = ys[i] - ys[j]
                if dx == 0:
                    xt += 1
                if dy == 0:
                    yt += 1
                if dx * dy > 0:
                    c += 1
                elif dx != 0 and dy != 0:
                    d += 1
        out = rk.kendall_tau(
            self._df(spark, rows), ["grp"], "x", "y"
        ).collect()[0]
        assert (out["concordant"], out["discordant"]) == (c, d)
        assert (out["xtie"], out["ytie"]) == (xt, yt)
        tot = n * (n - 1) // 2
        import math

        exp = round((c - d) / (math.sqrt(tot - xt) * math.sqrt(tot - yt)), 6)
        assert out["tau_b"] == exp


class TestQuantileNormalize:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, pk long, v long")

    def test_identical_distributions_map_to_self(self, spark):
        rows = [("a", i, i % 4) for i in range(8)] + [
            ("b", i + 100, i % 4) for i in range(8)
        ]
        out = rk.quantile_normalize(
            self._df(spark, rows), ["grp"], "v", "pk"
        ).collect()
        for r in out:
            assert r["norm_v"] == r["v"]

    def test_shifted_group_calibrated_onto_pool(self, spark):
        # group a: 0..3, group b: 1000..1003 (same shape, shifted).
        # pooled sorted: 0,1,2,3,1000,1001,1002,1003. the top row of each
        # group (percentile 1.0) maps to the pooled max 1003; the bottom
        # (r=1, n=4 -> grid k=250 -> pooled rank ceil(250*8/1000)=2) maps
        # to pooled value 1
        rows = [("a", i, i) for i in range(4)] + [
            ("b", i, 1000 + i) for i in range(4)
        ]
        out = {
            (r["grp"], r["pk"]): r["norm_v"]
            for r in rk.quantile_normalize(
                self._df(spark, rows), ["grp"], "v", "pk"
            ).collect()
        }
        assert out[("a", 3)] == out[("b", 3)] == 1003
        assert out[("a", 0)] == out[("b", 0)] == 1
        # equal percentiles always map to equal pooled values
        for i in range(4):
            assert out[("a", i)] == out[("b", i)]

    def test_grid_is_exactly_b_cells(self, spark):
        rows = [("a", i, i * 7 % 13) for i in range(50)]
        out = rk.quantile_normalize(
            self._df(spark, rows), ["grp"], "v", "pk", b=100
        )
        ks = [r["grid_k"] for r in out.select("grid_k").collect()]
        assert min(ks) >= 1 and max(ks) <= 100

    def test_monotone_within_group(self, spark):
        rows = [("a", i, (i * 37) % 23) for i in range(30)]
        out = rk.quantile_normalize(
            self._df(spark, rows), ["grp"], "v", "pk"
        ).collect()
        by_v = sorted(out, key=lambda r: (r["v"], r["pk"]))
        norms = [r["norm_v"] for r in by_v]
        assert norms == sorted(norms)


class TestChi2Cells:
    def test_hand_computed_2x2(self, spark):
        # contingency: a/x=30 a/y=10, b/x=10 b/y=30; N=80
        # cell (a,x): O=30 R=40 C=40 -> dev = 30*80-1600 = 800
        # contrib = 800^2 / (80*40*40) = 640000/128000 = 5.0
        rows = (
            [("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 30
        )
        df = spark.createDataFrame(rows, "s string, l string")
        out = {
            (r["s"], r["l"]): r for r in rk.chi2_cells(df, "s", "l").collect()
        }
        assert out[("a", "x")]["dev2_num"] == 640_000
        assert out[("a", "x")]["contrib"] == 5.0
        # chi2 total = 4 symmetric cells * 5.0 = 20.0
        assert sum(r["contrib"] for r in out.values()) == 20.0

    def test_independent_distribution_zero(self, spark):
        rows = [("a", "x")] * 6 + [("a", "y")] * 2 + [("b", "x")] * 3 + [
            ("b", "y")
        ]
        df = spark.createDataFrame(rows, "s string, l string")
        out = rk.chi2_cells(df, "s", "l").collect()
        assert all(r["contrib"] == 0.0 for r in out)

    def test_marginals_consistent(self, spark):
        rows = [("a", "x"), ("a", "y"), ("b", "x")]
        df = spark.createDataFrame(rows, "s string, l string")
        out = rk.chi2_cells(df, "s", "l").collect()
        for r in out:
            assert r["grand_total"] == 3
        got = {(r["s"], r["l"]): (r["row_total"], r["col_total"]) for r in out}
        assert got[("a", "x")] == (2, 2)
        assert got[("b", "x")] == (1, 2)


class TestInterleavedShards:
    def test_round_robin_cycles_groups(self, spark):
        rows = [(g, i) for g in ["a", "b", "c"] for i in range(4)]
        df = spark.createDataFrame(rows, "src string, id long")
        out = sorted(
            tx.interleaved_shards(df, "src", "id", n_shards=3).collect(),
            key=lambda r: r["pos"],
        )
        # positions cycle a,b,c,a,b,c...
        assert [r["src"] for r in out[:6]] == ["a", "b", "c", "a", "b", "c"]
        # equal group sizes + n_shards dividing: perfectly balanced
        from collections import Counter

        shards = Counter(r["shard"] for r in out)
        assert set(shards.values()) == {4}

    def test_positions_unique_and_seq_contract(self, spark):
        rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)]
        df = spark.createDataFrame(rows, "src string, id long")
        out = tx.interleaved_shards(df, "src", "id", n_shards=4).collect()
        poss = [r["pos"] for r in out]
        assert len(set(poss)) == len(poss)
        for r in out:
            assert r["shard"] == r["pos"] % 4
            assert r["seq_in_shard"] == r["pos"] // 4

    def test_deterministic_under_repartition(self, spark):
        rows = [(f"s{i % 3}", i) for i in range(30)]
        df = spark.createDataFrame(rows, "src string, id long")
        a = sorted(map(tuple, tx.interleaved_shards(df.repartition(1), "src", "id").collect()))
        b = sorted(map(tuple, tx.interleaved_shards(df.repartition(7), "src", "id").collect()))
        assert a == b


class TestWeightedQuantile:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, v long, w long")

    def test_heavy_row_dominates(self, spark):
        # values 1..4; weight 97 on v=4: weighted median is 4, row median 2
        rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 97)]
        out = rk.weighted_quantile(
            self._df(spark, rows), ["grp"], "v", "w"
        ).collect()[0]
        assert out["wq_v"] == 4 and out["total_w"] == 100

    def test_exact_boundary_inclusive(self, spark):
        # cum at v=1 is exactly half the weight -> q=0.5 picks v=1
        rows = [("g", 1, 5), ("g", 2, 5)]
        out = rk.weighted_quantile(
            self._df(spark, rows), ["grp"], "v", "w"
        ).collect()[0]
        assert out["wq_v"] == 1

    def test_p90_and_zero_weight_group(self, spark):
        rows = [("g", i, 1) for i in range(1, 11)] + [("z", 7, 0)]
        out = {
            r["grp"]: r
            for r in rk.weighted_quantile(
                self._df(spark, rows), ["grp"], "v", "w", q_ppm=900_000
            ).collect()
        }
        assert out["g"]["wq_v"] == 9
        assert out["z"]["wq_v"] is None and out["z"]["total_w"] == 0

    def test_invalid_q_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError):
            rk.weighted_quantile(
                self._df(spark, [("g", 1, 1)]), ["grp"], "v", "w", q_ppm=0
            )


class TestTurnIntegrity:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )

    def test_clean_conversation(self, spark):
        from kafka2iceberg_spark import cep as cm

        rows = [
            ("c", 0, "user", "a"),
            ("c", 1, "assistant", "b"),
            ("c", 2, "user", "c"),
        ]
        out = cm.turn_integrity(self._df(spark, rows)).collect()[0]
        assert out["n_missing"] == 0 and out["n_dup_idx"] == 0
        assert out["n_role_repeats"] == 0 and out["span"] == 3

    def test_hole_dup_and_role_repeat_counted(self, spark):
        from kafka2iceberg_spark import cep as cm

        rows = [
            ("c", 0, "user", "a"),
            ("c", 2, "user", "c"),        # hole at 1 AND user->user repeat
            ("c", 2, "user", "c"),        # replayed turn
            ("c", 3, "assistant", "d"),
        ]
        out = cm.turn_integrity(self._df(spark, rows)).collect()[0]
        assert out["n_turns"] == 4
        assert out["span"] == 4
        assert out["n_missing"] == 1
        assert out["n_dup_idx"] == 1
        # user(0)->user(2) repeat + the identical replay pair = 2
        assert out["n_role_repeats"] == 2

    def test_convs_isolated(self, spark):
        from kafka2iceberg_spark import cep as cm

        rows = [
            ("a", 0, "user", "x"),
            ("b", 5, "user", "y"),
            ("b", 9, "user", "z"),
        ]
        out = {
            r["conv_id"]: r
            for r in cm.turn_integrity(self._df(spark, rows)).collect()
        }
        assert out["a"]["n_missing"] == 0
        assert out["b"]["n_missing"] == 3  # span 5..9, holes 6,7,8
        assert out["b"]["n_role_repeats"] == 1


class TestRfmSegments:
    def test_hand_computed_tiles(self, spark):
        import datetime as dtm

        base = dtm.datetime(2024, 1, 1)
        rows = []
        # 5 users: user i has i+1 events of value 10*(i+1), last event at
        # base + i days -> recency best for user 4, frequency/monetary
        # best for user 4 too
        for u in range(5):
            for k in range(u + 1):
                rows.append((u, base + dtm.timedelta(days=u, hours=k),
                             10.0 * (u + 1)))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        from kafka2iceberg_spark import rankstats as rkm

        out = {r["user_id"]: r for r in rkm.rfm_segments(df).collect()}
        assert out[4]["r"] == 1 and out[4]["f"] == 1 and out[4]["m"] == 1
        assert out[4]["rfm_code"] == 111
        assert out[0]["r"] == 5 and out[0]["f"] == 5
        # frequency tiles strictly follow event counts
        assert [out[u]["f"] for u in range(5)] == [5, 4, 3, 2, 1]

    def test_deterministic_ties_break_by_user(self, spark):
        import datetime as dtm

        t = dtm.datetime(2024, 1, 1)
        rows = [(u, t, 5.0) for u in range(4)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        from kafka2iceberg_spark import rankstats as rkm

        a = sorted(map(tuple, rkm.rfm_segments(df.repartition(1)).collect()))
        b = sorted(map(tuple, rkm.rfm_segments(df.repartition(5)).collect()))
        assert a == b
        out = {r[0]: r for r in a}
        # all metrics tied: ntile assigns by user ascending
        assert [out[u][4] for u in range(4)] == [1, 2, 3, 4]


class TestPoissonBootstrap:
    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        from kafka2iceberg_spark import rankstats as rs

        rows = [(i, 1000 + (i * 37) % 500) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, cents long")
        [r] = rs.poisson_bootstrap_ci(df, "cents", "id", b=100).collect()
        assert r["n"] == 400 and r["b_reps"] == 100
        # the CI must bracket the point estimate and be ordered
        assert r["ci_lo_milli"] <= r["mean_milli"] <= r["ci_hi_milli"]
        assert r["ci_lo_milli"] < r["ci_hi_milli"]
        # deterministic under partitioning (md5 draws, not rand())
        [r2] = rs.poisson_bootstrap_ci(
            df.repartition(13), "cents", "id", b=100
        ).collect()
        assert tuple(r) == tuple(r2)

    def test_degenerate_constant_data_collapses_ci(self, spark):
        from kafka2iceberg_spark import rankstats as rs

        df = spark.createDataFrame(
            [(i, 500) for i in range(50)], "id long, cents long"
        )
        [r] = rs.poisson_bootstrap_ci(df, "cents", "id", b=50).collect()
        # every resample of a constant has the same mean
        assert r["ci_lo_milli"] == r["ci_hi_milli"] == r["mean_milli"] == 500000


class TestClassifierPRF:
    def test_hand_computed(self, spark):
        from kafka2iceberg_spark import rankstats as rs

        rows = [
            ("a", "a"), ("a", "a"), ("a", "b"),   # a: tp=2, fn=1
            ("b", "a"),                           # b: fn=1, a gets fp=1
            ("c", "c"),                           # c: perfect
        ]
        df = spark.createDataFrame(rows, "t string, p string")
        out = {r["label"]: r for r in
               rs.classifier_prf(df, "t", "p").collect()}
        a = out["a"]
        assert (a["n_true"], a["n_pred"], a["tp"]) == (3, 3, 2)
        assert a["precision_ppm"] == 666666 and a["recall_ppm"] == 666666
        assert a["f1_ppm"] == 666666
        b = out["b"]
        assert (b["n_true"], b["n_pred"], b["tp"]) == (1, 1, 0)
        assert (b["precision_ppm"], b["recall_ppm"], b["f1_ppm"]) == (0, 0, 0)
        c = out["c"]
        assert (c["precision_ppm"], c["recall_ppm"], c["f1_ppm"]) == (
            1000000, 1000000, 1000000)

    def test_label_only_predicted_still_reported(self, spark):
        from kafka2iceberg_spark import rankstats as rs

        df = spark.createDataFrame([("x", "y")], "t string, p string")
        out = {r["label"]: r for r in
               rs.classifier_prf(df, "t", "p").collect()}
        assert set(out) == {"x", "y"}
        assert out["y"]["n_true"] == 0 and out["y"]["n_pred"] == 1
