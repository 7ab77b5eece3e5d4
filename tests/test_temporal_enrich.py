"""Event-time temporal join view (scd.TemporalEnrich): facts enriched
with the dim version valid at their EVENT time, held until the dim
watermark passes them; released-set parity with the from-scratch batch
twin; replay no-ops; tombstone-gap NULLs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka2iceberg_spark.scd import TemporalEnrich
from kafka2iceberg_spark.sink import IcebergLite
from kafka2iceberg_spark.transactions import CatalogLite


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


DIM_SCHEMA = "user_id string, plan string, is_del boolean, ts string"
FACT_SCHEMA = "fact_id long, user_id string, ts string"

# dim timeline for u1: A @00:00, B @05:00, tombstone @08:00, C @09:00
DIM = [
    ("u1", "A", False, "2024-01-01 00:00:00"),
    ("u1", "B", False, "2024-01-01 05:00:00"),
    ("u1", None, True, "2024-01-01 08:00:00"),
    ("u1", "C", False, "2024-01-01 09:00:00"),
]
# facts: f1 →A, f2 →B, f3 → tombstone gap (NULL), f4 →C
FACTS = [
    (1, "u1", "2024-01-01 00:30:00"),
    (2, "u1", "2024-01-01 05:30:00"),
    (3, "u1", "2024-01-01 08:30:00"),
    (4, "u1", "2024-01-01 09:30:00"),
]


def _mk(spark, tmp_path):
    cat = CatalogLite(str(tmp_path / "cat"))
    cat.register("facts", IcebergLite(str(tmp_path / "facts"), pk=[], partition_field=None))
    cat.register("out", IcebergLite(str(tmp_path / "out"), pk=[], partition_field=None))
    cat.register("meta", IcebergLite(str(tmp_path / "meta"), pk=["k"], partition_field=None))
    hist = IcebergLite(
        str(tmp_path / "hist"), pk=["user_id", "valid_from_us"],
        partition_field=None,
    )
    te = TemporalEnrich(
        cat,
        hist,
        key=["user_id"],
        tracked=["plan"],
        dim_delete="is_del",
    )
    return te


def _out_map(spark, te):
    return {
        r["fact_id"]: r["dim_plan"] for r in te.read(spark).collect()
    }


def test_event_time_versions_and_holdback(spark, tmp_path):
    te = _mk(spark, tmp_path)
    # batch 0: dim A,B; facts f1 (in-watermark) and f2 (ahead: 05:30 > 05:00)
    te.apply_batch(
        _df(spark, DIM[:2], DIM_SCHEMA),
        _df(spark, FACTS[:2], FACT_SCHEMA),
        "b0",
    )
    assert _out_map(spark, te) == {1: "A"}
    assert [r["fact_id"] for r in te.pending(spark).collect()] == [2]

    # batch 1: tombstone arrives → wm 08:00 releases f2, which must get B —
    # the version valid at ITS event time — even though the dim has since
    # been deleted (event-time, not processing-time, semantics)
    te.apply_batch(
        _df(spark, DIM[2:3], DIM_SCHEMA),
        _df(spark, FACTS[2:3], FACT_SCHEMA),
        "b1",
    )
    assert _out_map(spark, te) == {1: "A", 2: "B"}
    # f3 (08:30) still held: wm is exactly 08:00
    assert [r["fact_id"] for r in te.pending(spark).collect()] == [3]

    # batch 2: dim C @09:00 + explicit wm 10:00 → f3 releases inside the
    # tombstone gap (NULL), f4 releases onto C
    te.apply_batch(
        _df(spark, DIM[3:], DIM_SCHEMA),
        _df(spark, FACTS[3:], FACT_SCHEMA),
        "b2",
        wm_us=1_704_103_200_000_000,  # 2024-01-01 10:00:00 UTC
    )
    assert _out_map(spark, te) == {1: "A", 2: "B", 3: None, 4: "C"}
    assert te.pending(spark).count() == 0


def test_released_set_matches_batch_recompute(spark, tmp_path):
    te = _mk(spark, tmp_path)
    te.apply_batch(
        _df(spark, DIM[:2], DIM_SCHEMA), _df(spark, FACTS[:2], FACT_SCHEMA),
        "b0",
    )
    te.apply_batch(
        _df(spark, DIM[2:], DIM_SCHEMA), _df(spark, FACTS[2:], FACT_SCHEMA),
        "b1",
    )
    got = sorted(
        (r["fact_id"], r["user_id"], r["ts_us"], r["dim_plan"])
        for r in te.read(spark).collect()
    )
    want = sorted(
        (r["fact_id"], r["user_id"], r["ts_us"], r["dim_plan"])
        for r in te.recompute(spark).collect()
    )
    assert got == want and len(got) == 3  # f4 (09:30) beyond wm 09:00


def test_replay_is_noop(spark, tmp_path):
    te = _mk(spark, tmp_path)
    assert te.apply_batch(
        _df(spark, DIM[:2], DIM_SCHEMA), _df(spark, FACTS[:1], FACT_SCHEMA),
        "b0",
    )
    v = te.catalog.current_version()
    n = te.read(spark).count()
    assert not te.apply_batch(
        _df(spark, DIM[:2], DIM_SCHEMA), _df(spark, FACTS[:1], FACT_SCHEMA),
        "b0",
    )
    assert te.catalog.current_version() == v
    assert te.read(spark).count() == n


def test_hist_ahead_heals_on_replay(spark, tmp_path):
    """Crash between the hist commit and the catalog txn: hist is one
    batch ahead; redelivering the batch folds hist as a guard no-op and
    lands the catalog txn — exactly-once overall."""
    from kafka2iceberg_spark.scd import scd2_apply_batch

    te = _mk(spark, tmp_path)
    te.apply_batch(
        _df(spark, DIM[:2], DIM_SCHEMA), _df(spark, FACTS[:2], FACT_SCHEMA),
        "b0",
    )
    # simulate the crash: hist fold for b1 landed, catalog txn did not
    scd2_apply_batch(
        spark, te.hist, _df(spark, DIM[2:3], DIM_SCHEMA),
        "te-dim:out:b1", key=["user_id"], order=["ts"], tracked=["plan"],
        ts_col="ts", delete_col="is_del",
    )
    # redelivery of b1
    assert te.apply_batch(
        _df(spark, DIM[2:3], DIM_SCHEMA), _df(spark, FACTS[2:3], FACT_SCHEMA),
        "b1",
    )
    assert _out_map(spark, te) == {1: "A", 2: "B"}
    # hist holds exactly the intervals of one fold (no double versions)
    hist = te.hist.read(spark).where(F.col("valid_from_us").isNotNull())
    assert hist.count() == 2  # A and B intervals; tombstone closes B


def test_no_release_before_first_dim(spark, tmp_path):
    te = _mk(spark, tmp_path)
    te.apply_batch(None, _df(spark, FACTS[:2], FACT_SCHEMA), "b0")
    with pytest.raises(FileNotFoundError):
        te.read(spark)
    assert te.pending(spark).count() == 2
    # dim arrives later; everything in-watermark releases correctly
    te.apply_batch(
        _df(spark, DIM, DIM_SCHEMA), _df(spark, FACTS[2:], FACT_SCHEMA),
        "b1", wm_us=1_704_103_200_000_000,
    )
    assert _out_map(spark, te) == {1: "A", 2: "B", 3: None, 4: "C"}


def test_single_stream_wiring(spark, tmp_path):
    """Tagged single-stream foreachBatch wiring: dim and fact rows ride
    one stream; split() routes them; the maintained out table equals the
    batch recompute."""
    import json
    import os

    rows = []
    for u, p, d, ts in DIM:
        rows.append({"kind": "dim", "user_id": u, "plan": p,
                     "is_del": d, "ts": ts, "fact_id": None})
    for fid, u, ts in FACTS:
        rows.append({"kind": "fact", "user_id": u, "plan": None,
                     "is_del": None, "ts": ts, "fact_id": fid})
    rows.sort(key=lambda r: r["ts"])
    src = str(tmp_path / "src")
    os.makedirs(src)
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        p = os.path.join(src, f"{i:03d}.json")
        with open(p, "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (1000 + i, 1000 + i))

    te = _mk(spark, tmp_path)
    stream = (
        spark.readStream.schema(
            "kind string, user_id string, plan string, is_del boolean, "
            "ts string, fact_id long"
        )
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )

    def split(df):
        return (
            df.where(F.col("kind") == "dim").select(
                "user_id", "plan", "is_del", F.col("ts").cast("timestamp")
                .alias("ts")
            ),
            df.where(F.col("kind") == "fact").select(
                "fact_id", "user_id", F.col("ts").cast("timestamp")
                .alias("ts")
            ),
        )

    q = te.start(stream, split, str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = sorted(
        (r["fact_id"], r["dim_plan"]) for r in te.read(spark).collect()
    )
    want = sorted(
        (r["fact_id"], r["dim_plan"]) for r in te.recompute(spark).collect()
    )
    assert got == want and len(got) >= 1


def test_late_fact_releases_immediately(spark, tmp_path):
    """A fact arriving AFTER the watermark already passed its event time
    (late fact) enriches immediately on arrival — its history is final —
    instead of being silently dropped from the released set."""
    te = _mk(spark, tmp_path)
    te.apply_batch(
        _df(spark, DIM, DIM_SCHEMA), _df(spark, FACTS[1:2], FACT_SCHEMA),
        "b0", wm_us=1_704_103_200_000_000,  # wm 10:00 — all dim folded
    )
    assert _out_map(spark, te) == {2: "B"}
    # f1 (00:30) arrives late, far below the released watermark
    te.apply_batch(None, _df(spark, FACTS[:1], FACT_SCHEMA), "b1")
    assert _out_map(spark, te) == {1: "A", 2: "B"}
    assert te.pending(spark).count() == 0


def test_random_arrival_orders_converge(spark, tmp_path):
    """Dim in time-ordered batches (the watermark contract), facts split
    ARBITRARILY across seeds/batches: every arrival interleaving lands
    the identical released table — arrival order is not an input."""
    import random

    outs = []
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        base = tmp_path / f"s{seed}"
        base.mkdir()
        te = _mk(spark, base)
        assign = {fid: rng.randrange(3) for fid, *_ in FACTS}
        cuts = [
            ("2024-01-01 06:00:00", 1_704_088_800_000_000),
            ("2024-01-01 09:00:00", 1_704_099_600_000_000),
            ("2024-01-01 12:00:00", 1_704_110_400_000_000),
        ]
        lo = None
        for b, (hi_str, hi_us) in enumerate(cuts):
            dim_b = [
                d for d in DIM
                if (lo is None or d[3] > lo) and d[3] <= hi_str
            ]
            fact_b = [f for f in FACTS if assign[f[0]] == b]
            te.apply_batch(
                _df(spark, dim_b, DIM_SCHEMA) if dim_b else None,
                _df(spark, fact_b, FACT_SCHEMA),
                str(b),
                wm_us=hi_us,
            )
            lo = hi_str
        got = sorted(
            (r["fact_id"], r["dim_plan"]) for r in te.read(spark).collect()
        )
        want = sorted(
            (r["fact_id"], r["dim_plan"])
            for r in te.recompute(spark).collect()
        )
        assert got == want and len(got) == len(FACTS)
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
