"""Branches, tags, write-audit-publish, and rollback on IcebergLite.

Mirrors Iceberg's ref semantics (branch/tag registry in table metadata,
fast-forward publish, snapshot retention pinned by refs) — the audit
workflow a production ingestion pipeline stages risky data through.
"""

from __future__ import annotations

import pytest

from kafka2iceberg_spark.sink import CommitConflict, IcebergLite


def _df(spark, ids, text="x"):
    return spark.createDataFrame(
        [(f"conv_{i}", i, f"{text}:{i}", i) for i in ids],
        "conv_id string, turn_idx int, text string, offset long",
    )


@pytest.fixture()
def table(tmp_path):
    return IcebergLite(
        str(tmp_path / "t"), pk=["conv_id", "turn_idx"], partition_field=None
    )


def test_branch_write_isolated_from_main(spark, table):
    table.commit_append(_df(spark, range(5)), "b0")
    main_v = table.head_version("main")
    table.commit_append(_df(spark, range(10, 13)), "b1", branch="audit")
    # main: untouched head, untouched content
    assert table.head_version("main") == main_v
    assert table.read(spark).count() == 5
    # branch: fork content + staged rows
    assert table.head_version("audit") > main_v
    assert table.read(spark, branch="audit").count() == 8
    # metadata head advanced past main (table-global version numbers)
    assert table.current_version() == table.head_version("audit")


def test_fast_forward_publishes_without_rewrite(spark, table):
    table.commit_append(_df(spark, range(5)), "b0")
    v_before = table.head_version("main")
    files_before = set()
    for files in table.resolve_manifests(table.current_snapshot()).values():
        files_before |= {f["path"] for f in files}
    table.commit_append(_df(spark, range(10, 13)), "b1", branch="audit")
    table.commit_append(_df(spark, range(20, 22)), "b2", branch="audit")
    # audit gate passed -> publish
    published = table.fast_forward("audit")
    assert table.head_version("main") == published
    assert table.read(spark).count() == 10
    # publish was metadata-only: previously-committed files unmoved
    files_after = {
        f["path"]
        for files in table.resolve_manifests(
            table.current_snapshot()
        ).values()
        for f in files
    }
    assert files_before <= files_after
    # incremental consumers resume across the publish seamlessly
    inc = table.read_appends_between(spark, v_before, table.head_version("main"))
    assert inc.count() == 5  # exactly the branch rows


def test_fast_forward_requires_ancestry(spark, table):
    table.commit_append(_df(spark, range(3)), "b0")
    table.commit_append(_df(spark, range(10, 12)), "b1", branch="audit")
    # main advances after the fork -> divergence -> publish must refuse
    table.commit_append(_df(spark, range(5, 8)), "b2")
    with pytest.raises(CommitConflict, match="advanced since"):
        table.fast_forward("audit")
    # main content never saw branch rows
    assert table.read(spark).count() == 6


def test_streaming_offsets_follow_main_not_branch(spark, table):
    table.commit_append(_df(spark, range(4)), "b0")
    v = table.head_version("main")
    table.commit_append(_df(spark, range(10, 14)), "b1", branch="audit")
    # the table-stream source polls head_version("main"): no new offset
    assert table.head_version("main") == v
    table.fast_forward("audit")
    assert table.head_version("main") > v
    added = table.added_files_between(v, table.head_version("main"))
    assert len(added) >= 1


def test_replay_guard_is_global_across_refs(spark, table):
    table.commit_append(_df(spark, range(3)), "batch-1", branch="audit")
    # same batch id replayed on main is a no-op (Iceberg wap.id dedup)
    assert table.commit_append(_df(spark, range(3)), "batch-1") is False


def test_tag_pins_snapshot_through_expiration(spark, table):
    table.commit_append(_df(spark, range(3)), "b0")
    tagged = table.tag("audit-2024")
    for i in range(1, 8):
        table.commit_append(_df(spark, range(10 * i, 10 * i + 2)), f"b{i}")
    stats = table.expire_snapshots(keep_last=2)
    assert stats["expired_snapshots"] > 0
    # the tagged snapshot survived the window and still reads
    assert table.read(spark, branch="audit-2024").count() == 3
    assert table.snapshot_at(tagged)["version"] == tagged
    # dropping the tag releases it for future expiration
    table.drop_ref("audit-2024")
    assert "audit-2024" not in table.refs()


def test_tag_is_not_writable(spark, table):
    table.commit_append(_df(spark, range(2)), "b0")
    table.tag("pin")
    with pytest.raises(ValueError, match="tag"):
        table.commit_append(_df(spark, range(5, 7)), "b1", branch="pin")


def test_rollback_and_recommit(spark, table):
    table.commit_append(_df(spark, range(3)), "b0")
    good = table.head_version("main")
    table.commit_append(_df(spark, range(10, 15)), "bad-batch")
    assert table.read(spark).count() == 8
    table.rollback(good)
    assert table.read(spark).count() == 3
    # new commits build on the rolled-back base, not the bad head
    table.commit_append(_df(spark, range(20, 22)), "b2")
    assert table.read(spark).count() == 5
    got = {r["conv_id"] for r in table.read(spark).select("conv_id").collect()}
    assert not any(c in got for c in ("conv_10", "conv_14"))
    # an incremental consumer parked on the abandoned lineage fails loudly
    with pytest.raises(ValueError, match="not an ancestor"):
        table.lineage_versions(good + 1, table.head_version("main"))


def test_branch_refs_survive_main_commits(spark, table):
    table.commit_append(_df(spark, range(2)), "b0")
    table.commit_append(_df(spark, range(10, 12)), "b1", branch="audit")
    audit_head = table.head_version("audit")
    table.commit_append(_df(spark, range(5, 7)), "b2")
    assert table.head_version("audit") == audit_head
    assert table.read(spark, branch="audit").count() == 4
    assert table.read(spark).count() == 4  # 2 + 2 on main


def test_upsert_and_compact_still_linear(spark, table):
    """Mixed commit kinds keep working with the refs layer in place."""
    df = _df(spark, range(4)).withColumn("is_cdc_delete", F_lit_false())
    table.commit_upsert(df, "u0")
    table.commit_append(_df(spark, range(10, 12)), "a1")
    table.commit_upsert(
        _df(spark, range(2), text="upd").withColumn(
            "is_cdc_delete", F_lit_false()
        ),
        "u1",
    )
    rows = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read(spark).collect()
    }
    assert rows[("conv_0", 0)] == "upd:0"
    assert ("conv_10", 10) in rows
    inc = table.read_appends_between(spark, 0, table.head_version("main"))
    assert inc is not None


def F_lit_false():
    from pyspark.sql import functions as F

    return F.lit(False)
