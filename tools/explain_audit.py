"""Physical-plan audit: captures, per driver query, the plan properties the
100 TB design cares about — exchange count, join strategies, pushed filters,
pruned read schemas, Python-UDF usage — and writes PLANS.md.

Run: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {"streaming_ingest_e2e"}  # runs a streaming job, no static plan


def _dedup_clusters_round(spark, sf_dir):
    """dedup_clusters materializes each round behind an eager
    localCheckpoint, so explaining its result shows only a checkpoint
    scan. Audit ONE un-executed propagation round instead — the join/agg
    dataflow every round repeats is the plan that matters at scale."""
    import __spark_entry__ as entry
    from kafka2iceberg_spark import dedup as dd

    return dd.neardup_propagation_round(
        entry._docs_aug_near(spark, sf_dir, subset=False), threshold=0.875
    )


def _mor_read_plan(spark, sf_dir):
    """dedup_upsert_mor materializes through an eager localCheckpoint (its
    temp table is deleted before return), so explaining its result shows
    only a checkpoint scan. Audit the lazy MERGE-ON-READ reconciling scan
    instead — the broadcast max-delete-sequence join every MOR read pays
    is the plan that matters at scale."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka2iceberg_spark.sink import IcebergLite

    work = tempfile.mkdtemp(prefix="mor-audit-")
    t = IcebergLite(f"{work}/t", pk=["conv_id", "turn_idx"],
                    partition_field=None)
    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .limit(200)
        .select(
            F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
            (F.col("event_id") % 50).cast("int").alias("turn_idx"),
            F.col("event_type").alias("text"),
            F.col("event_id").alias("offset"),
        )
    )
    t.commit_upsert(base, "0", strategy="mor")
    t.commit_upsert(base.limit(40), "1", strategy="mor")
    return t.read(spark)


def _pagerank_round(spark, sf_dir):
    """pagerank materializes each iteration behind an eager
    localCheckpoint; audit one un-executed propagation round (the
    join+agg every iteration repeats) via graph.pagerank_round_plan."""
    import __spark_entry__ as entry
    from kafka2iceberg_spark import graph as gr

    edges = gr.copurchase_edges(
        entry._read(spark, sf_dir, "orders"),
        entry._read(spark, sf_dir, "lineitem"),
    )
    return gr.pagerank_round_plan(edges)


def _bpe_round(spark, sf_dir):
    """bpe_train materializes each merge round behind an eager
    localCheckpoint and returns a driver-built merge table; audit one
    un-executed round (word-freq vocab -> weighted pair agg) via
    textops.bpe_round_plan."""
    import __spark_entry__ as entry
    from kafka2iceberg_spark import textops as tx

    return tx.bpe_round_plan(entry._read(spark, sf_dir, "documents"))


def _neardup_index_batch(spark, sf_dir):
    """neardup_index materializes through committed index/pairs tables
    (eager per-batch upserts), so the registry result plan is a bare
    table scan. Audit the lazy per-batch dataflow
    (dedup.neardup_batch_pairs): batch signatures banded against the
    committed index plus the batch-internal band join, exact-rescored —
    the plan every ingestion micro-batch repeats."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kafka2iceberg_spark import dedup as dd

    docs = entry._docs_aug_near(spark, sf_dir, subset=False)
    sig_b = dd.minhash_signatures(docs.where(F.col("doc_id") % 2 == 1))
    idx = dd.minhash_signatures(docs.where(F.col("doc_id") % 2 == 0))
    return dd.neardup_batch_pairs(sig_b, idx, threshold=0.875)


def _join_view_delta(spark, sf_dir):
    """join_view materializes through committed tables; audit one
    un-executed delta fold (matview.IncrementalJoinView._delta_view):
    the dL><R ∪ L><dR ∪ dL><dR plan every micro-batch repeats, with the
    committed sides probed via delta-broadcast joins."""
    import tempfile

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kafka2iceberg_spark.matview import IncrementalJoinView
    from kafka2iceberg_spark.sink import IcebergLite
    from kafka2iceberg_spark.transactions import CatalogLite

    orders = entry._read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    lines = entry._read(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_linenumber",
        F.col("l_extendedprice").alias("revenue"),
    )
    work = tempfile.mkdtemp(prefix="jv_audit_")
    cat = CatalogLite(work)
    cat.register("o", IcebergLite(f"{work}/o", pk=["orderkey"],
                                  partition_field=None))
    cat.register("l", IcebergLite(
        f"{work}/l", pk=["orderkey", "l_linenumber"], partition_field=None))
    cat.register("v", IcebergLite(
        f"{work}/v", pk=["orderkey", "l_linenumber"], partition_field=None))
    jv = IncrementalJoinView(
        cat, "o", "l", "v", on=["orderkey"],
        left_cols=["o_orderpriority"],
        right_cols=["l_linenumber", "revenue"],
        filter_left="o_orderpriority = '1-URGENT'",
    )
    jv.apply_batch(
        orders.where(F.col("orderkey") % 3 == 0),
        lines.where(F.col("orderkey") % 3 == 0), "0",
    )
    return jv._delta_view(
        spark,
        orders.where(F.col("orderkey") % 3 == 1),
        lines.where(F.col("orderkey") % 3 == 1),
    )


def _stream_sample_batch(spark, sf_dir):
    """stream_sample materializes through a committed k-row table; audit
    one un-executed min-merge (sketches.StreamingSample): local bottom-k
    of the batch unioned with the committed sample, re-bottom-k'd."""
    import tempfile

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kafka2iceberg_spark.sink import IcebergLite
    from kafka2iceberg_spark.sketches import StreamingSample

    d = entry._read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    work = tempfile.mkdtemp(prefix="ss_audit_")
    ss = StreamingSample(
        IcebergLite(f"{work}/sample", pk=["doc_id"], partition_field=None),
        k=100, id_col="doc_id",
    )
    ss.apply_batch(d.where(F.col("doc_id") % 3 == 0), "0")
    batch = ss._bottom_k(
        d.where(F.col("doc_id") % 3 == 1)
        .withColumn("_prio", F.md5(F.col("doc_id").cast("string")))
    )
    return ss._bottom_k(
        batch.unionByName(ss.table.read(spark)).dropDuplicates(["doc_id"])
    )


def _temporal_enrich_batch(spark, sf_dir):
    """temporal_enrich materializes through committed catalog tables;
    audit one un-executed release (scd.TemporalEnrich._enrich): the
    watermark band AS-OF joined against the SCD2 history — the plan
    every micro-batch repeats."""
    import tempfile

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kafka2iceberg_spark.scd import TemporalEnrich
    from kafka2iceberg_spark.sink import IcebergLite
    from kafka2iceberg_spark.transactions import CatalogLite

    ev = entry._read(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dim = ev.select(
        "user_id", "ts", "event_id", "event_type",
        (F.col("event_type") == "error").alias("is_del"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("fact_id"), "user_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    work = tempfile.mkdtemp(prefix="te_audit_")
    cat = CatalogLite(f"{work}/cat")
    cat.register("facts", IcebergLite(f"{work}/facts", pk=[],
                                      partition_field=None))
    cat.register("out", IcebergLite(f"{work}/out", pk=[],
                                    partition_field=None))
    cat.register("meta", IcebergLite(f"{work}/meta", pk=["k"],
                                     partition_field=None))
    hist = IcebergLite(f"{work}/hist", pk=["user_id", "valid_from_us"],
                       partition_field=None)
    te = TemporalEnrich(
        cat, hist, key=["user_id"], tracked=["event_type"],
        dim_order=["ts", "event_id"], dim_delete="is_del",
    )
    from kafka2iceberg_spark.scd import scd2_apply_batch

    scd2_apply_batch(
        spark, hist, dim, "audit0", key=["user_id"],
        order=["ts", "event_id"], tracked=["event_type"],
        ts_col="ts", delete_col="is_del",
    )
    return te._enrich(facts, te._hist_df(spark))


def _rollup_fold(spark, sf_dir):
    """rollup_ladder materializes through committed tier tables; audit
    one un-executed batch fold (timeseries.RollupLadder): the finest-tier
    merge (batch agg + committed-tier add) unioned conceptually with the
    day fold — the merge plan dominates, so that is the audited plan."""
    import tempfile

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kafka2iceberg_spark.sink import IcebergLite
    from kafka2iceberg_spark.timeseries import RollupLadder
    from kafka2iceberg_spark.transactions import CatalogLite

    HOUR = 3_600_000_000
    DAY = 86_400_000_000
    ev = entry._read(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("v"),
        "event_id",
    )
    work = tempfile.mkdtemp(prefix="rl_audit_")
    cat = CatalogLite(f"{work}/cat")
    for name in ("hour", "day"):
        cat.register(name, IcebergLite(f"{work}/{name}", pk=["bucket_us"],
                                       partition_field=None))
    cat.register("rollup_meta", IcebergLite(f"{work}/meta", pk=["tier"],
                                            partition_field=None))
    rl = RollupLadder(cat, [("hour", HOUR), ("day", DAY)])
    rl.apply_batch(
        ev.where(F.col("event_id") % 2 == 0).drop("event_id"), "0",
        wm_us=1_705_795_200_000_000,
    )
    batch = ev.where(F.col("event_id") % 2 == 1).groupBy(
        (F.col("ts_us") - F.col("ts_us") % F.lit(HOUR)).alias("bucket_us")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    cur = rl.read(spark, "hour").select(
        "bucket_us", F.col("n").alias("_n0"), F.col("s").alias("_s0")
    )
    return batch.join(cur, "bucket_us", "left").select(
        "bucket_us",
        (F.col("n") + F.coalesce(F.col("_n0"), F.lit(0))).alias("n"),
        (F.col("s") + F.coalesce(F.col("_s0"), F.lit(0))).alias("s"),
    )


# queries whose registry callable hides the auditable plan behind eager
# materialization: audit a representative lazy plan instead
PLAN_PROXY = {
    "dedup_clusters": _dedup_clusters_round,
    "dedup_upsert_mor": _mor_read_plan,
    "pagerank_topk": _pagerank_round,
    "bpe_train": _bpe_round,
    "neardup_index": _neardup_index_batch,
    "join_view": _join_view_delta,
    "stream_sample": _stream_sample_batch,
    "temporal_enrich": _temporal_enrich_batch,
    "rollup_ladder": _rollup_fold,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # subset audit: print to stdout, don't rewrite PLANS.md

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode  # noqa: SLF001

    rows = []
    for name, fn in entry.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        df = PLAN_PROXY.get(name, fn)(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
            jvm_mode.fromString("formatted")
        )
        rows.append(
            {
                "query": name,
                "exchanges": len(re.findall(r"\bExchange\b|\bExchange ", plan)),
                "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
                "smj": len(re.findall(r"SortMergeJoin", plan)),
                "python_eval": len(
                    re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
                ),
                "pushed": "; ".join(
                    sorted(
                        {
                            m
                            for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                            if m
                        }
                    )
                )[:80],
                "read_schema": "; ".join(
                    sorted(
                        {
                            m.split("<", 1)[1].rstrip(">")[:60]
                            for m in re.findall(r"ReadSchema: struct<[^\n]*", plan)
                        }
                    )
                )[:120],
            }
        )

    out = [
        "# PLANS — physical-plan audit of every driver query",
        "",
        f"Generated by tools/explain_audit.py over {sf_dir}. Properties that",
        "matter at 100 TB: minimal exchanges, broadcast (never sort-merge)",
        "joins against dimensions, filters pushed to the scan, pruned read",
        "schemas, and Python only as Arrow-vectorized evals.",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins | arrow/python evals | pushed filters | read schema (pruned) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['query']} | {r['exchanges']} | {r['broadcast_joins']} | "
            f"{r['smj']} | {r['python_eval']} | {r['pushed'] or '—'} | "
            f"{r['read_schema'] or '—'} |"
        )
    total_smj = sum(r["smj"] for r in rows)
    out += [
        "",
        f"Total sort-merge joins across the suite: **{total_smj}** "
        "(dimension joins broadcast; the only large-large joins are "
        "key-partitioned hash shuffles).",
        "",
        "`dedup_clusters` is audited as ONE un-executed label-propagation "
        "round (dedup.neardup_propagation_round): the registry callable "
        "materializes each round behind an eager localCheckpoint, so its "
        "result plan is a bare checkpoint scan — the repeated per-round "
        "join+partial-min is the plan that matters.",
        "",
        "`dedup_upsert_mor` is audited as the lazy merge-on-read "
        "reconciling scan over a 2-commit MOR table (IcebergLite.read): "
        "data scan + broadcast max-delete-sequence-per-PK join, with row "
        "sequences recovered from the file path — the read-side cost every "
        "MOR consumer pays until maintenance materializes the deletes.",
        "",
        "`pagerank_topk` is audited as ONE un-executed propagation round "
        "(graph.pagerank_round_plan) for the same reason as "
        "dedup_clusters: the executed loop checkpoints each iteration, "
        "and the per-round join+partial-sum is the plan that repeats.",
        "",
        "`join_view`, `stream_sample`, `temporal_enrich`, and "
        "`rollup_ladder` materialize through committed exactly-once "
        "tables, so their registry result plans are bare table scans; "
        "each is audited as ONE un-executed micro-batch fold instead — "
        "the delta-rule join (IncrementalJoinView._delta_view), the "
        "bottom-k min-merge (StreamingSample), the watermark-band AS-OF "
        "release (TemporalEnrich._enrich), and the finest-tier merge "
        "(RollupLadder) respectively — the plan every batch repeats.",
    ]
    if only:
        for r in rows:
            print(r)
        print(f"(subset audit: {len(rows)} queries, {total_smj} sort-merge joins)")
    else:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
        )
        with open(path, "w") as fh:
            fh.write("\n".join(out) + "\n")
        print(f"wrote {path} ({len(rows)} queries, {total_smj} sort-merge joins)")
    spark.stop()


if __name__ == "__main__":
    main()
