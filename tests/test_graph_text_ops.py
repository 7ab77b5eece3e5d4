"""butterfly counting, kept-anchor debounce, source entropy."""

from __future__ import annotations

import datetime as dt
import math

from kafka2iceberg_spark import graph as gr
from kafka2iceberg_spark import textops as tx
from kafka2iceberg_spark import timeseries as ts


def test_butterfly_pairs_counts_bicliques(spark):
    # c1,c2 share suppliers {10,11,12} -> shared=3, butterflies=C(3,2)=3
    # c3 shares only {10} with each -> shared=1, butterflies=0
    rel = spark.createDataFrame(
        [
            (1, 10), (1, 11), (1, 12),
            (2, 10), (2, 11), (2, 12),
            (3, 10),
        ],
        "cust long, supp long",
    )
    got = {
        (x["c1"], x["c2"]): (x["shared"], x["butterflies"])
        for x in gr.butterfly_pairs(rel).collect()
    }
    assert got[(1, 2)] == (3, 3)
    assert got[(1, 3)] == (1, 0)
    assert got[(2, 3)] == (1, 0)


def test_butterfly_max_degree_cap_excludes_hubs(spark):
    # supplier 99 is a hub with 3 customers; cap 2 removes its wedges
    rel = spark.createDataFrame(
        [(1, 99), (2, 99), (3, 99), (1, 5), (2, 5)],
        "cust long, supp long",
    )
    got = {
        (x["c1"], x["c2"]): x["shared"]
        for x in gr.butterfly_pairs(rel, max_degree=2).collect()
    }
    # only supplier 5 (degree 2) contributes
    assert got == {(1, 2): 1}


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t)
            for i, (s, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_debounce_kept_anchor_not_lag_diff(spark):
    # burst at t=0,1,2,3 with gap 2s: kept-anchor keeps {0,2}; a naive
    # lag-diff filter would keep only {0}
    df = _ev(spark, [(0, 7, "a"), (1, 7, "a"), (2, 7, "a"), (3, 7, "a")])
    got = {
        x["event_id"]: x["kept"]
        for x in ts.debounce(
            df, ["user_id", "event_type"], min_gap_us=2_000_000
        ).collect()
    }
    assert got == {0: True, 1: False, 2: True, 3: False}


def test_debounce_keys_isolated(spark):
    df = _ev(spark, [(0, 7, "a"), (0, 8, "a"), (1, 7, "b")])
    got = ts.debounce(
        df, ["user_id", "event_type"], min_gap_us=60_000_000
    ).collect()
    assert all(x["kept"] for x in got)  # all first-in-key


def test_source_entropy_uniform_and_degenerate(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd", "u"),   # 4 tokens, all distinct -> ln(4)
            (2, "zz zz zz zz", "d"),   # one token repeated -> 0
        ],
        "doc_id long, text string, source string",
    )
    got = {
        x["source"]: (x["n_tokens"], x["distinct_tokens"], x["entropy"])
        for x in tx.source_entropy(docs).collect()
    }
    assert got["u"] == (4, 4, round(math.log(4), 6))
    assert got["d"][2] == 0.0 and got["d"] == (4, 1, 0.0)


def test_association_rules_hand_example(spark):
    from kafka2iceberg_spark import assoc

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (3, "a"),  # duplicate line in same basket must not double-count
    ]
    df = spark.createDataFrame(rows, "bk long, item string")
    got = {
        (x["item_a"], x["item_b"]): x
        for x in assoc.association_rules(
            df, "bk", "item", min_support=2
        ).collect()
    }
    r = got[("a", "b")]
    assert r["support"] == 2 and r["sup_a"] == 3 and r["sup_b"] == 2
    assert r["confidence"] == round(2 / 3, 6)
    # lift = nb * sup_ab / (sup_a * sup_b) = 3*2/(3*2) = 1.0
    assert r["lift"] == 1.0
    # (a,c) and (b,c) have support 1 -> filtered by min_support
    assert set(got) == {("a", "b")}


def test_adamic_adar_path_and_existing_edge_excluded(spark):
    # square 1-2, 2-3, 3-4, 1-4 plus diagonal 1-3:
    #   candidate (2,4): common neighbours {1, 3}, both deg 3
    #   (1,3) is an EDGE -> excluded even though it has common neighbours
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)], ["node_a", "node_b"]
    )
    out = gr.adamic_adar_topk(edges, k=10).collect()
    assert [(r.node_u, r.node_v) for r in out] == [(2, 4)]
    r = out[0]
    assert r.n_common == 2
    expected = 2 * round(1_000_000 / math.log(3)) / 1e6
    assert abs(r.aa_score - round(expected, 6)) < 1e-9
    assert abs(r.ra_score - round(2 * round(1_000_000 / 3) / 1e6, 6)) < 1e-9


def test_zipf_exact_law_recovers_slope(spark):
    # frequencies n(r) = round(1000 * r^-1): docs with token t_r repeated
    rows = []
    for r in range(1, 21):
        n = max(1, round(1000 / r))
        rows.append((r, " ".join([f"tok{r:02d}"] * n),))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tx.zipf_fit(docs, top_n=20).collect()[0]
    assert out.n_fit == 20
    # quantized-integer frequencies still fit ~ -1 closely
    assert -1.02 < out.slope < -0.98
    assert abs(out.intercept - math.log(1000)) < 0.05


def test_vocab_overlap_hand_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "s1"),
            (2, "beta gamma delta", "s2"),
            (3, "epsilon", "s3"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r.source_a, r.source_b): r
        for r in tx.source_vocab_overlap(docs).collect()
    }
    r12 = out[("s1", "s2")]
    assert (r12.n_inter, r12.n_union) == (2, 4)
    assert abs(r12.jaccard - 0.5) < 1e-9
    # s3 shares nothing -> no inter rows at all for its pairs
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_js_divergence_identical_zero_disjoint_ln2(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "s1"),
            (2, "the cat sat", "s2"),
            (3, "quantum flux nodes", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["js_nats"]
        for r in tx.source_js_divergence(docs).collect()
    }
    assert got[("s1", "s2")] == 0.0
    assert abs(got[("s1", "s3")] - math.log(2)) < 1e-6
    assert abs(got[("s2", "s3")] - math.log(2)) < 1e-6


def test_js_divergence_partial_overlap_between_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat", "a"), (2, "the cat ran far", "b")],
        "doc_id long, text string, source string",
    )
    js = tx.source_js_divergence(docs).collect()[0]["js_nats"]
    assert 0.0 < js < math.log(2)


class TestBigramPmi:
    def test_collocation_beats_frequent_independents(self, spark):
        # "san francisco" always adjacent; "the" pairs with a different
        # word each time, so each (the, X) stays below min_count
        rows = [
            (1, "the cat visits san francisco"),
            (2, "the dog near san francisco"),
            (3, "the fox from san francisco"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = tx.bigram_pmi_topk(df, min_count=2, top_k=10).collect()
        pairs = [(r["w1"], r["w2"]) for r in out]
        assert pairs[0] == ("san", "francisco")
        assert all(w1 != "the" for w1, _ in pairs)

    def test_min_count_suppresses_singletons(self, spark):
        df = spark.createDataFrame(
            [(1, "unique pairing here"), (2, "common common common common")],
            ["doc_id", "text"],
        )
        out = tx.bigram_pmi_topk(df, min_count=3, top_k=10).collect()
        pairs = {(r["w1"], r["w2"]) for r in out}
        assert ("unique", "pairing") not in pairs
        assert ("common", "common") in pairs

    def test_hand_computed_pmi(self, spark):
        import math

        # corpus "a b a b": unigrams a:2 b:2, N_tok=4; pairs (a,b):2,
        # (b,a):1, N_pairs=3. pmi(a,b) = ln(2) + 2ln(4) - ln(3) - ln(2) - ln(2)
        df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
        out = {
            (r["w1"], r["w2"]): r["pmi"]
            for r in tx.bigram_pmi_topk(df, min_count=1, top_k=10).collect()
        }
        exp = round(
            (round(math.log(2) * 1e9) + 2 * round(math.log(4) * 1e9)
             - round(math.log(3) * 1e9) - 2 * round(math.log(2) * 1e9))
            / 1e9, 6)
        assert out[("a", "b")] == exp
