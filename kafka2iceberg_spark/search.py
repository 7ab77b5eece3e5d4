"""Keyword search over the corpus: inverted postings + BM25 ranking.

The lexical complement to similarity.py's embedding ANN: build an
inverted index (token -> document-frequency + capped postings) and rank
documents for a term query with BM25. Everything is exact integer tf/df
arithmetic plus one ln() per matched term, entirely JVM-side.

Scale shape:
- Term frequencies are ONE explode + groupBy(doc_id, token) with
  map-side partial aggregation; document frequencies reduce the same
  relation again by token. The only wide exchanges are keyed on token —
  a uniform key at corpus scale (natural-language Zipf skew is bounded
  by capping postings per token and dropping stopword-grade df outliers
  upstream if needed).
- BM25 filters the tf relation to the QUERY'S terms before any join —
  at 100 TB the per-query data after that filter is O(matching docs),
  and the per-term idf/df side is a handful of rows, broadcast.
- Postings lists are capped top-k per token by a rank window partitioned
  on token (no global sort) so a hot token cannot blow up one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import norm_text

BM25_K1 = 1.2
BM25_B = 0.75


def term_freqs(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf, dl): exact term counts + document length."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(norm_text(F.col(text_col)), " "), lambda t: t != "")
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "doc_id")


def inverted_postings(
    docs: DataFrame,
    max_postings: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index rows: (token, df, total_tf, postings).

    postings = the top `max_postings` doc ids by (tf desc, doc_id asc),
    serialized as a '|'-joined string (engine-portable, no array-hash
    ambiguity in parity gates). df counts every matching document even
    though the list is capped.
    """
    tf = term_freqs(docs, id_col, text_col)
    rk = F.row_number().over(
        Window.partitionBy("token").orderBy(
            F.col("tf").desc(), F.col("doc_id")
        )
    )
    ranked = tf.withColumn("rk", rk)
    return (
        ranked.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rk") <= max_postings,
                                F.struct("rk", "doc_id"),
                            )
                        )
                    ),
                    lambda s: s["doc_id"].cast("string"),
                ),
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard
    Robertson-Sparck Jones form, never negative); the doc-side term is
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). N and avgdl are global
    scalars computed from the same tf relation and broadcast via a
    cross-join of a 1-row aggregate — no driver action.

    The tf relation is filtered to the query's terms FIRST, so every
    join below it sees O(matching docs) rows; df per term is computed on
    that filtered slice and broadcast. Deterministic ordering: score
    desc, doc_id asc; score is rounded to 6 decimals so the rank (and
    parity hashing) is stable across engines.
    """
    if not query_terms:
        raise ValueError("empty query")
    tf_all = term_freqs(docs, id_col, text_col)
    # global corpus stats: one row (N docs, average doc length)
    stats = tf_all.groupBy("doc_id").agg(
        F.first("dl").alias("dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # explicit exact-BIGINT sum / count (not avg()) so the double
        # division is the identical IEEE op on any engine
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    hits = tf_all.where(F.col("token").isin(list(query_terms)))
    df_per_term = hits.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        hits.join(F.broadcast(df_per_term), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0)
                    - F.lit(b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
    )
    totals = scored.groupBy("doc_id").agg(
        F.round(F.sum("w"), 6).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    return totals.orderBy(
        F.col("score").desc(), F.col("doc_id")
    ).limit(k)


def sparse_cosine_pairs(
    docs: DataFrame,
    max_df: int = 100,
    min_cos: float = 0.30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs sparse TF-cosine document similarity through the inverted
    index — the lexical counterpart of embedding near-dup: pairs are
    GENERATED by a postings self-join on shared tokens, so two documents
    are ever compared only if they share at least one (non-stopword-grade)
    token. This is the classic scale shape for sparse all-pairs similarity
    (Bayardo et al. 2007, "Scaling Up All Pairs Similarity Search"):

    - tokens with document frequency > ``max_df`` are dropped from the
      comparison space BEFORE the join — stopword-grade tokens are what
      make postings self-joins quadratic; the cap bounds each token's
      contribution to <= max_df^2 candidate pairs.
    - dot products are exact integer sums of tf*tf (order-free); norms
      are exact integer sums of tf^2 over the SAME capped token space, so
      cosine is consistent in the filtered space.
    - the only float ops are one sqrt (IEEE-exact, unlike ln) and one
      division per surviving pair, rounded to 6dp — engine-replayable.

    Output: (doc_a, doc_b, dot, cos) for pairs with cos >= min_cos,
    doc_a < doc_b.
    """
    tf = term_freqs(docs, id_col, text_col).select("doc_id", "token", "tf")
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    kept = tf.join(
        df_counts.where(F.col("df") <= max_df).select("token"), "token"
    )
    norms = kept.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = kept.select(
        "token", F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a")
    )
    b = kept.select(
        "token", F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b")
    )
    dots = (
        a.join(b, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cos",
            F.round(
                F.col("dot")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
                6,
            ),
        )
        .where(F.col("cos") >= min_cos)
        .select("doc_a", "doc_b", "dot", "cos")
    )


RRF_SCALE = 1_000_000_000_000  # integer RRF: score = sum(SCALE div (k + rank))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topn: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (lexical BM25 + dense ANN):

        rrf(d) = sum over lists containing d of SCALE div (k + rank_d)

    computed in exact integer arithmetic (SCALE = 10^12, integer
    division) instead of the usual 1/(k + rank) doubles: ranks are small
    integers, so the fused score is an order-free BIGINT sum —
    partition- and engine-identical, no float-tie ambiguity between
    engines. k = 60 is the published default.

    Scale shape: each input is an already-top-n list (O(queries × n)
    rows, NOT corpus-sized), so the fusion union + id-keyed aggregation
    is a rounding error next to the retrieval stages; the final top-n is
    a rank window over the fused relation. Ties break on smallest id.

    Output: (id, rrf_score, n_lists) — the fused top ``topn``.
    """
    if not rankings:
        raise ValueError("no rankings to fuse")
    stacked = None
    for r in rankings:
        # true integer division (Spark `div`), NOT double `/` + cast:
        # 10^12/(k+rank) as a double can round up across the integer
        # boundary and disagree with the oracle's `//` by one
        part = r.select(
            F.col(id_col).alias("_id"),
            F.expr(
                f"cast({RRF_SCALE} as bigint)"
                f" div (cast({k} as bigint) + cast({rank_col} as bigint))"
            ).alias("_pts"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    fused = stacked.groupBy("_id").agg(
        F.sum("_pts").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("_id"))
        .limit(topn)
        .select(F.col("_id").alias(id_col), "rrf_score", "n_lists")
    )
