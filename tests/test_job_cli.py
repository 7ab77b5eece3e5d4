"""spark-submit job entry point (kafka2iceberg_spark.__main__).

Exercises the k=v CLI path in-process (getOrCreate reuses the test session);
the real spark-submit --py-files invocation is covered by BENCH/BASELINE.md's
recipe and was validated manually — semantics here are identical.
"""

from __future__ import annotations

from kafka2iceberg_spark.__main__ import main
from kafka2iceberg_spark.gen import GenConfig, write_stream_files
from kafka2iceberg_spark.sink import IcebergLite


def test_cli_end_to_end(spark, tmp_path):
    write_stream_files(
        GenConfig(n_convs=6, turns_per_conv=6), str(tmp_path / "broker"), files=2
    )
    main(
        [
            "source-database=chat",
            "source-table=transcripts",
            f"broker.dir={tmp_path}/broker",
            f"table.location={tmp_path}/tbl",
            f"checkpoint.location={tmp_path}/ckpt",
            "mode=availableNow",
        ]
    )
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    assert t.read(spark).count() > 0
    assert t.current_version() >= 1
    assert t.lineage()


def test_cli_custom_field_spec(spark, tmp_path):
    """fields.* params override the default transcript task spec."""
    write_stream_files(
        GenConfig(n_convs=4, turns_per_conv=4), str(tmp_path / "broker"), files=1
    )
    main(
        [
            "source-database=chat",
            "source-table=transcripts",
            "fields.conv_id.seq=1",
            "fields.conv_id.type=string",
            "fields.conv_id.is_primary_key=true",
            "fields.turn_idx.seq=2",
            "fields.turn_idx.type=int",
            "fields.turn_idx.is_primary_key=true",
            "fields.text.seq=3",
            "fields.text.type=string",
            f"broker.dir={tmp_path}/broker",
            f"table.location={tmp_path}/tbl",
            f"checkpoint.location={tmp_path}/ckpt",
        ]
    )
    t = IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
    df = t.read(spark)
    assert set(df.columns) >= {"conv_id", "turn_idx", "text"}
    assert "role" not in df.columns  # custom spec projected only 3 fields
    assert df.count() > 0


def test_cli_dlq_drained_before_exit(spark, tmp_path):
    """ADVICE: main() must await the DLQ side query too — in availableNow
    mode the main sink finishing first must not abandon the DLQ stream
    before it lands every malformed envelope."""
    import os

    broker = str(tmp_path / "broker")
    write_stream_files(
        GenConfig(n_convs=4, turns_per_conv=4), broker, files=2
    )
    with open(os.path.join(broker, "zz_bad.jsonl"), "w") as fh:
        fh.write("{definitely not json\n")
    os.utime(os.path.join(broker, "zz_bad.jsonl"), (2_000_000, 2_000_000))
    main(
        [
            "source-database=chat",
            "source-table=transcripts",
            f"broker.dir={broker}",
            f"table.location={tmp_path}/tbl",
            f"checkpoint.location={tmp_path}/ckpt",
            f"dlq.location={tmp_path}/dlq",
            "mode=availableNow",
        ]
    )
    # immediately after main() returns, BOTH tables are fully landed
    dlq = IcebergLite(str(tmp_path / "dlq"), pk=[])
    assert dlq.read(spark).count() == 1
    assert (
        IcebergLite(str(tmp_path / "tbl"), pk=["conv_id", "turn_idx"])
        .read(spark)
        .count()
        > 0
    )
