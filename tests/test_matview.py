"""Incremental materialized-view maintenance: MV == full recompute after
inserts, updates, deletes; count-only fast path; replay idempotence;
incremental continuation across triggers."""

import pytest
from pyspark.sql import functions as F

from kafka2iceberg_spark import gen, pipeline
from kafka2iceberg_spark.matview import IncrementalAggView
from kafka2iceberg_spark.schema import transcript_task
from kafka2iceberg_spark.sink import IcebergLite


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _rows(spark, items):
    # items: (conv_id, turn_idx, text)
    return spark.createDataFrame(
        [(c, i, t, "2024-09-01 00:00:00") for c, i, t in items],
        "conv_id string, turn_idx int, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _mv(tmp_path, src):
    view = IcebergLite(
        str(tmp_path / "mv"), pk=["conv_id"], partition_field=None
    )
    return IncrementalAggView(
        src,
        view,
        group_by=["conv_id"],
        measures={
            "n_turns": ("count", None),
            "total_chars": ("sum", "length(text)"),
        },
    )


def _assert_parity(spark, mv):
    got = sorted(
        map(tuple, mv.view.read(spark)
            .select("conv_id", "n_turns", "total_chars").collect())
    )
    want = sorted(map(tuple, mv.recompute(spark).collect()))
    assert got == want, (got, want)


def test_mv_tracks_inserts_updates_deletes(spark, tmp_path):
    src = IcebergLite(str(tmp_path / "src"), pk=["conv_id", "turn_idx"])
    mv = _mv(tmp_path, src)
    # batch 1: plain inserts across two groups
    src.commit_upsert(
        _rows(spark, [("a", 0, "hello"), ("a", 1, "xx"), ("b", 0, "yyy")]),
        "b1", strategy="mor",
    )
    q = mv.start(spark, str(tmp_path / "ck"))
    q.awaitTermination()
    _assert_parity(spark, mv)
    # batch 2: update a PK (text shrinks) + delete another + new group
    upd = _rows(spark, [("a", 0, "h"), ("c", 5, "zzzz")]).withColumn(
        "is_cdc_delete", F.lit(False)
    )
    dele = _rows(spark, [("b", 0, "ignored")]).withColumn(
        "is_cdc_delete", F.lit(True)
    )
    src.commit_upsert(upd.unionByName(dele), "b2", strategy="mor")
    q = mv.start(spark, str(tmp_path / "ck"))  # same checkpoint: resumes
    q.awaitTermination()
    _assert_parity(spark, mv)
    rows = {
        r.conv_id: (r.n_turns, r.total_chars)
        for r in mv.view.read(spark).collect()
    }
    # group b fully deleted -> gone from the view; a reflects the update
    assert "b" not in rows
    assert rows["a"] == (2, 1 + 2)
    assert rows["c"] == (1, 4)


def test_mv_replay_is_idempotent(spark, tmp_path):
    src = IcebergLite(str(tmp_path / "src"), pk=["conv_id", "turn_idx"])
    mv = _mv(tmp_path, src)
    src.commit_upsert(
        _rows(spark, [("a", 0, "abc"), ("b", 1, "de")]), "b1", strategy="mor"
    )
    q = mv.start(spark, str(tmp_path / "ck"))
    q.awaitTermination()
    # replay with a FRESH checkpoint: same stream batch ids re-arrive and
    # must not double-apply the deltas
    q = mv.start(spark, str(tmp_path / "ck_fresh"))
    q.awaitTermination()
    _assert_parity(spark, mv)


def test_mv_count_only_needs_no_preimage(spark, tmp_path):
    src = IcebergLite(str(tmp_path / "src"), pk=["conv_id", "turn_idx"])
    view = IcebergLite(
        str(tmp_path / "mvc"), pk=["conv_id"], partition_field=None
    )
    mv = IncrementalAggView(
        src, view, group_by=["conv_id"], measures={"n": ("count", None)}
    )
    assert mv._needs_preimage is False
    src.commit_upsert(
        _rows(spark, [("a", 0, "x"), ("a", 1, "y"), ("b", 0, "z")]),
        "b1", strategy="mor",
    )
    dele = _rows(spark, [("a", 1, "_")]).withColumn(
        "is_cdc_delete", F.lit(True)
    )
    src.commit_upsert(dele, "b2", strategy="mor")
    q = mv.start(spark, str(tmp_path / "ck"))
    q.awaitTermination()
    rows = {r.conv_id: r.n for r in view.read(spark).collect()}
    assert rows == {"a": 1, "b": 1}


def test_mv_with_generated_cdc_workload(spark, tmp_path):
    """End-to-end: generator -> MOR ingest -> changelog -> MV == recompute,
    under out-of-order events, duplicates, and CDC deletes."""
    work = str(tmp_path)
    gen.write_stream_files(
        gen.GenConfig(n_convs=15, turns_per_conv=6, seed=7,
                      delete_fraction=0.2),
        f"{work}/broker", files=3,
    )
    spec = transcript_task()
    src = IcebergLite(f"{work}/src", pk=spec.primary_keys)
    pipeline.run_ingest_once(
        spark, f"{work}/broker", spec, src, f"{work}/ck_ingest",
        strategy="mor",
    )
    mv = _mv(tmp_path, src)
    q = mv.start(spark, f"{work}/ck_mv")
    q.awaitTermination()
    _assert_parity(spark, mv)


def test_mv_validates_config(tmp_path):
    src = IcebergLite(str(tmp_path / "s"), pk=["conv_id", "turn_idx"])
    view_bad = IcebergLite(str(tmp_path / "v1"), pk=["role"])
    with pytest.raises(ValueError):  # group key not in source pk
        IncrementalAggView(src, view_bad, ["role"], {"n": ("count", None)})
    view = IcebergLite(str(tmp_path / "v2"), pk=["conv_id"])
    with pytest.raises(ValueError):  # no count measure
        IncrementalAggView(
            src, view, ["conv_id"], {"s": ("sum", "length(text)")}
        )
    with pytest.raises(ValueError):  # view pk != group keys
        IncrementalAggView(
            src, IcebergLite(str(tmp_path / "v3"), pk=["turn_idx"]),
            ["conv_id"], {"n": ("count", None)},
        )


def test_mv_preimage_uses_parent_not_v_minus_1(spark, tmp_path):
    # a staged BRANCH commit interleaves between the insert and the delete:
    # the delete commit's version v has parent v-2, and version v-1 holds
    # branch content main never saw. Pre-image recovery must follow
    # parent_version, not v-1, or sum measures go wrong.
    src = IcebergLite(str(tmp_path / "src"), pk=["conv_id", "turn_idx"])
    mv = _mv(tmp_path, src)
    src.commit_upsert(
        _rows(spark, [("a", 0, "hello"), ("b", 0, "yy")]), "b1",
        strategy="mor",
    )
    q = mv.start(spark, str(tmp_path / "ck"))
    q.awaitTermination()
    # staged branch commit: same PK ('a', 0) with DIFFERENT text length —
    # if the pre-image wrongly reads this snapshot, total_chars is off
    src.create_branch("stage")
    src.commit_append(
        _rows(spark, [("a", 0, "REPLACED-LONG-TEXT")]), "staged",
        branch="stage",
    )
    # delete ('a', 0) on main; commit version = branch version + 1
    dele = _rows(spark, [("a", 0, "ignored")]).withColumn(
        "is_cdc_delete", F.lit(True)
    )
    src.commit_upsert(dele, "b2", strategy="mor")
    q = mv.start(spark, str(tmp_path / "ck"))
    q.awaitTermination()
    _assert_parity(spark, mv)
    got = {
        r.conv_id: (r.n_turns, r.total_chars)
        for r in mv.view.read(spark).collect()
    }
    assert got["b"] == (1, 2)
    assert got.get("a", (0, 0))[0] == 0 or "a" not in got
