"""Round-4 randomized cross-checks: each new or reworked r4 path pitted
against an independent reference under hypothesis randomness —
nb_train/nb_predict vs the one-shot composition, the minhash-calibration
candidates seam, DDL fuzz (never half-applied), the poison-clamped
retention anchor vs a brute-force Python reference, and null-safe
t-closeness vs a pure-Python TVD computation.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafka2iceberg_spark import dq, ingest, textops
from kafka2iceberg_spark.pipeline import robust_event_max

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

HOUR_US = 3_600_000_000


# --------------------------------------------------------------- NB split

words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["web", "chat", "code"]),
        st.lists(words, min_size=0, max_size=8),
    ),
    min_size=4,
    max_size=24,
)


class TestNbTrainPredictSplit:
    @SETTINGS
    @given(docs=docs_strategy)
    def test_matches_python_nb(self, spark, docs):
        """nb_predict(nb_train(train)) vs a brute-force Python NB with
        the identical nano-ln integer quantization, on any random corpus
        (zero-token documents, single-class training sets, OOV test
        tokens). Independent of both the engine plan AND the DuckDB
        oracle formulation."""
        import math
        from collections import Counter

        rows = [
            (i, src, " ".join(toks)) for i, (src, toks) in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        train_rows = [r for r in rows if r[0] % 3 != 0]
        test_rows = [r for r in rows if r[0] % 3 == 0]
        if not train_rows or not test_rows:
            return
        # NOTE: the empty-training-vocabulary case is NOT skipped — the
        # engine's greatest(denominator, 1) guard pins it to prior-only
        # scoring, and the Python reference below models the same guard.
        model_cls, ctc = textops.nb_train(
            df.where(F.col("doc_id") % 3 != 0)
        )
        got = {
            r.doc_id: (r.true_source, r.pred_source, r.score_nano)
            for r in textops.nb_predict(
                df.where(F.col("doc_id") % 3 == 0), model_cls, ctc
            ).collect()
        }
        # python reference (Spark F.round is HALF_UP away from zero,
        # python round() is banker's — replicate Spark's)
        def _rnd(x):
            return (
                math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
            )

        cls_docs = Counter(src for _, src, _ in train_rows)
        total = len(train_rows)
        ctc_py: Counter = Counter()
        ncls: Counter = Counter()
        vocab = set()
        for _, src, text in train_rows:
            for t in text.split():
                ctc_py[(src, t)] += 1
                ncls[src] += 1
                vocab.add(t)
        V = len(vocab)
        for did, true_src, text in test_rows:
            best = None
            for c in sorted(cls_docs):
                prior = _rnd(math.log(cls_docs[c] / total) * 1e9)
                tok = 0
                for t, cnt in Counter(text.split()).items():
                    lp = _rnd(
                        math.log(
                            (ctc_py.get((c, t), 0) + 1)
                            / max(ncls[c] + V, 1)
                        )
                        * 1e9
                    )
                    tok += cnt * lp
                score = prior + tok
                if best is None or score > best[1]:
                    best = (c, score)
            assert got[did] == (true_src, best[0], best[1]), (
                did, got[did], (true_src, *best)
            )


# ------------------------------------------------ calibration candidates

class TestCalibrationSeam:
    @SETTINGS
    @given(
        texts=st.lists(
            st.lists(words, min_size=6, max_size=14),
            min_size=4,
            max_size=10,
        )
    )
    def test_candidates_seam_is_identity(self, spark, texts):
        """minhash_calibration(docs, candidates=precomputed) must equal
        minhash_calibration(docs) exactly: the seam only changes where
        the candidate relation comes from."""
        from kafka2iceberg_spark import dedup as dd

        rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
        # force some near-dups so the candidate set is non-trivial
        rows += [(100 + i, txt) for i, (_, txt) in enumerate(rows[:2])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        inline = dd.minhash_calibration(df)
        cand = dd.minhash_lsh_pairs(df, threshold=0.0).select(
            "doc_a",
            "doc_b",
            F.round(F.col("est_jaccard") * 1e6).cast("long").alias("est_ppm"),
        )
        seamed = dd.minhash_calibration(df, candidates=cand)
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, seamed.collect())
        )


# ------------------------------------------------------------- DDL fuzz

clause_kinds = st.sampled_from(["add", "modify", "drop", "change", "junk"])
col_names = st.sampled_from(["conv_id", "turn_idx", "text", "ts", "extra"])
type_names = st.sampled_from(
    ["int", "bigint", "varchar(10)", "double", "datetime", "blob"]
)


def _mk_clause(kind, col, typ):
    if kind == "add":
        return f"add column {col}_n {typ}"
    if kind == "modify":
        return f"modify column {col} {typ}"
    if kind == "drop":
        return f"drop column {col}"
    if kind == "change":
        return f"change {col} {col}2 {typ}"
    return f"frobnicate {col}"


class TestDdlFuzz:
    @SETTINGS
    @given(
        clauses=st.lists(
            st.tuples(clause_kinds, col_names, type_names),
            min_size=1,
            max_size=4,
        )
    )
    def test_never_half_applied(self, clauses):
        """For ANY alter statement: either every clause was a supported
        same-kind clause and the whole statement applies, or the spec is
        returned unchanged (identity object — never a partially-evolved
        copy). Applying twice is always a no-op."""
        from dataclasses import replace as _r  # noqa: F401

        from kafka2iceberg_spark.config import FieldSpec, TaskSpec

        spec = TaskSpec(
            source_database="chat",
            source_table="transcripts",
            fields=[
                FieldSpec("conv_id", 1, "string", is_primary_key=True),
                FieldSpec("turn_idx", 2, "int", is_primary_key=True),
                FieldSpec("text", 3, "string"),
                FieldSpec("ts", 4, "timestamp"),
            ],
        )
        sql = "alter table chat.transcripts " + ", ".join(
            _mk_clause(*c) for c in clauses
        )
        out = ingest.evolve_spec(spec, sql)
        if out is spec:
            return  # rejected whole — nothing half-applied by identity
        # applied: must have been homogeneous add OR homogeneous modify
        kinds = {k for k, _, _ in clauses}
        assert kinds == {"add"} or kinds == {"modify"}
        before = {f.name: f.type for f in spec.fields}
        after = {f.name: f.type for f in out.fields}
        if kinds == {"add"}:
            assert set(before) < set(after)
            assert all(after[n] == t for n, t in before.items())
        else:
            assert set(before) == set(after)
            # every change is a widening per the sink lattice
            for n in before:
                if before[n] != after[n]:
                    assert ingest._is_widening(before[n], after[n])
        # idempotence
        assert ingest.evolve_spec(out, sql) is out


# ------------------------------------------------- retention anchor

micros_lists = st.lists(
    st.integers(min_value=0, max_value=10**15), min_size=1, max_size=40
)


class TestRobustEventMax:
    @SETTINGS
    @given(us=micros_lists)
    def test_matches_python_reference(self, spark, us):
        """anchor == min(max, p99 + clamp) for any multiset of event
        times, where p99 is the BIGINT-exact floored linear interpolation
        from the function's documented contract (k,r = divmod(99*(n-1),
        100)) — bit-identical to this all-integer Python replica, with no
        double-precision seam; never above the raw max; None clamp
        restores the raw max."""
        rows = [
            (datetime(1970, 1, 1) + timedelta(microseconds=u),) for u in us
        ]
        df = spark.createDataFrame(rows, "ts timestamp")
        anchor = robust_event_max(df, "ts", HOUR_US)
        s = sorted(us)
        # integer-exact percentile: floor of the exact rational
        # interpolation at rank 0.99*(n-1) — the function's contract
        k, r = divmod(99 * (len(s) - 1), 100)
        lo = s[k]
        hi = s[min(k + 1, len(s) - 1)]
        p99 = lo + (hi - lo) * r // 100
        expect = min(max(us), p99 + HOUR_US)
        assert anchor == expect
        # hierarchical narrowing path (production takes it above 2M
        # rows) must agree bit-for-bit with the short-circuit
        assert (
            robust_event_max(df, "ts", HOUR_US, narrow_above=0) == expect
        )
        assert anchor <= max(us)
        assert robust_event_max(df, "ts", None) == max(us)


# ------------------------------------------------- null-safe t-closeness

sens_vals = st.sampled_from(["en", "de", None])


class TestTClosenessNullSafe:
    @SETTINGS
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["q1", "q2"]), sens_vals),
            min_size=2,
            max_size=30,
        )
    )
    def test_matches_python_tvd(self, spark, rows):
        """Engine TVD (integer ppm, NULL as a domain value) equals a
        brute-force Python computation using the identical integer-ppm
        arithmetic, for any mix of NULL/non-NULL sensitive values."""
        df = spark.createDataFrame(rows, "qi string, s string")
        got = {
            r.qi: (r.class_size, r.tvd_ppm)
            for r in dq.t_closeness(df, ["qi"], "s").collect()
        }
        # python reference
        from collections import Counter

        total = len(rows)
        gcount = Counter(s for _, s in rows)
        gp = {v: c * 1_000_000 // total for v, c in gcount.items()}
        by_q: dict = {}
        for q, s in rows:
            by_q.setdefault(q, []).append(s)
        for q, vals in by_q.items():
            n = len(vals)
            cc = Counter(vals)
            tvd = (
                sum(
                    abs(cc.get(v, 0) * 1_000_000 // n - gp[v])
                    for v in gp
                )
                // 2
            )
            assert got[q] == (n, tvd), (q, got[q], (n, tvd))
