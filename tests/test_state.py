"""Stateful join tests (J1/J2): batch form correctness, streaming form
parity with the batch form on the same input (the north_star invariant),
and out-of-order robustness from the contiguity rule.
"""

from __future__ import annotations

import datetime

import pytest

from kafka2iceberg_spark import gen
from kafka2iceberg_spark.state import (
    paired_turns_batch,
    paired_turns_stream,
    paired_turns_stream_tws,
)

BASE = datetime.datetime(2024, 9, 1, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (c, i, r, t, None, BASE + datetime.timedelta(minutes=i))
            for (c, i, r, t) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_batch_pairs_user_with_next_reply(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "user", "q0"),
            ("c1", 1, "assistant", "a1"),
            ("c1", 2, "user", "q2"),
            ("c1", 3, "tool", "t3"),
            ("c1", 4, "user", "q4"),  # trailing, unpaired
        ],
    )
    out = {r.user_turn_idx: r for r in paired_turns_batch(df).collect()}
    assert out[0].reply_text == "a1" and out[0].reply_role == "assistant"
    assert out[2].reply_text == "t3" and out[2].reply_role == "tool"
    assert out[4].reply_text is None
    assert out[0].latency_us == 60_000_000


def test_batch_consecutive_users_unpaired(spark):
    df = _df(
        spark,
        [("c1", 0, "user", "q0"), ("c1", 1, "user", "q1"), ("c1", 2, "assistant", "a2")],
    )
    out = {r.user_turn_idx: r for r in paired_turns_batch(df).collect()}
    assert out[0].reply_text is None  # next turn is another user turn
    assert out[1].reply_text == "a2"


_SEQ = [0]


def _stream_parity(spark, tmp_path, rows_by_file, impl=paired_turns_stream):
    """Feed files through the streaming join, compare to batch form.

    A far-future sentinel turn (separate conv) in a final file advances the
    watermark past every open conversation's event-time timeout, flushing
    trailing unpaired turns deterministically — then availableNow terminates.
    """
    import json
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    all_rows = [r for f in rows_by_file for r in f]
    sentinel = ("zz_sentinel", 0, "system", "eof")
    files = list(rows_by_file) + [[sentinel]]
    for i, chunk in enumerate(files):
        with open(os.path.join(src, f"f{i:03d}.jsonl"), "w") as fh:
            for (c, idx, role, text) in chunk:
                ts = (
                    BASE + datetime.timedelta(days=365)
                    if c == "zz_sentinel"
                    else BASE + datetime.timedelta(minutes=idx)
                )
                fh.write(
                    json.dumps(
                        {
                            "conv_id": c,
                            "turn_idx": idx,
                            "role": role,
                            "text": text,
                            "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
                        }
                    )
                    + "\n"
                )
        # the file source orders by modification time; force distinct mtimes
        # so the arrival order is exactly the file order (no tie flakiness)
        os.utime(os.path.join(src, f"f{i:03d}.jsonl"), (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.format("json")
        .schema(
            "conv_id string, turn_idx int, role string, text string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    _SEQ[0] += 1
    name = f"pairs_{_SEQ[0]}"
    q = (
        # disorder spans single-digit minutes; the 10-minute watermark must
        # tolerate it (rows later than the watermark are correctly dropped —
        # that policy is exercised separately in test_windows/test_streaming)
        impl(stream, gap="30 minutes", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        r
        for r in spark.sql(f"select * from {name}").collect()
        if r.conv_id != "zz_sentinel"
    ]
    batch = paired_turns_batch(_df(spark, all_rows)).collect()
    return got, batch


def test_stream_matches_batch_pairs(spark, tmp_path):
    rows_by_file = [
        [("c1", 0, "user", "q0"), ("c2", 0, "user", "x0")],
        [("c1", 1, "assistant", "a1"), ("c2", 1, "tool", "y1")],
        [("c1", 2, "user", "q2"), ("c1", 3, "assistant", "a3")],
    ]
    got, batch = _stream_parity(spark, tmp_path, rows_by_file)
    gotk = {
        (r.conv_id, r.user_turn_idx): (r.reply_text, r.latency_us) for r in got
    }
    batchk = {
        (r.conv_id, r.user_turn_idx): (r.reply_text, r.latency_us)
        for r in batch
        if r.reply_text is not None  # streamed run may hold trailing state
    }
    for k, v in batchk.items():
        assert gotk.get(k) == v, (k, v, gotk.get(k))


def test_stream_out_of_order_defers_not_mispairs(spark, tmp_path):
    # turn 1 arrives AFTER turn 2: without the contiguity rule the join
    # would wrongly pair user#0 with assistant#2
    rows_by_file = [
        [("c1", 0, "user", "q0")],
        [("c1", 2, "assistant", "a2")],
        [("c1", 1, "assistant", "a1")],
    ]
    got, _ = _stream_parity(spark, tmp_path, rows_by_file)
    paired = [r for r in got if r.user_turn_idx == 0 and r.reply_text]
    assert len(paired) == 1
    assert paired[0].reply_text == "a1"


def test_stream_duplicate_turns_collapse(spark, tmp_path):
    rows_by_file = [
        [("c1", 0, "user", "q0"), ("c1", 0, "user", "q0")],
        [("c1", 1, "assistant", "a1"), ("c1", 1, "assistant", "a1")],
    ]
    got, _ = _stream_parity(spark, tmp_path, rows_by_file)
    hits = [r for r in got if r.user_turn_idx == 0 and r.reply_text == "a1"]
    assert len(hits) == 1


def test_generator_scale_parity(spark):
    # batch join over the full generator output: every user turn appears
    # exactly once; replies' text matches ground truth
    cfg = gen.GenConfig(n_convs=8, turns_per_conv=10, mega_convs=1, mega_turns=50)
    truth = gen.turns(cfg)
    df = spark.createDataFrame(
        [
            (t["conv_id"], t["turn_idx"], t["role"], t["text"], t["tool"], t["ts"].replace(tzinfo=None))
            for t in truth
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = paired_turns_batch(df).collect()
    n_users = sum(1 for t in truth if t["role"] == "user")
    assert len(out) == n_users
    by_key = {(t["conv_id"], t["turn_idx"]): t for t in truth}
    for r in out:
        if r.reply_turn_idx is not None:
            t = by_key[(r.conv_id, r.reply_turn_idx)]
            assert t["text"] == r.reply_text and t["role"] in ("assistant", "tool")


def _have_protobuf() -> bool:
    # transformWithStateInPandas speaks protobuf to the state server; the
    # sandbox image ships without it (pip installs are not available), so
    # the tws tests run only where a real Spark 4 cluster image would.
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


needs_protobuf = pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithStateInPandas requires protobuf (absent in sandbox)",
)


@needs_protobuf
def test_tws_stream_matches_batch_pairs(spark, tmp_path):
    """Spark 4.x transformWithStateInPandas form: same parity contract."""
    rows_by_file = [
        [("c1", 0, "user", "q0"), ("c2", 0, "user", "x0")],
        [("c1", 1, "assistant", "a1"), ("c2", 1, "tool", "y1")],
        [("c1", 2, "user", "q2"), ("c1", 3, "assistant", "a3")],
    ]
    got, batch = _stream_parity(
        spark, tmp_path, rows_by_file, impl=paired_turns_stream_tws
    )
    gotk = {
        (r.conv_id, r.user_turn_idx): (r.reply_text, r.latency_us) for r in got
    }
    batchk = {
        (r.conv_id, r.user_turn_idx): (r.reply_text, r.latency_us)
        for r in batch
        if r.reply_text is not None
    }
    for k, v in batchk.items():
        assert gotk.get(k) == v, (k, v, gotk.get(k))


@needs_protobuf
def test_tws_out_of_order_defers_not_mispairs(spark, tmp_path):
    rows_by_file = [
        [("c1", 0, "user", "q0")],
        [("c1", 2, "assistant", "a2")],
        [("c1", 1, "assistant", "a1")],
    ]
    got, _ = _stream_parity(
        spark, tmp_path, rows_by_file, impl=paired_turns_stream_tws
    )
    paired = [r for r in got if r.user_turn_idx == 0 and r.reply_text]
    assert len(paired) == 1
    assert paired[0].reply_text == "a1"


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the state codec."""

    def __init__(self):
        self.exists = False
        self._t = None

    @property
    def get(self):
        return self._t

    def update(self, t):
        self.exists, self._t = True, tuple(t)

    def remove(self):
        self.exists, self._t = False, None


def test_state_codec_roundtrips_separators_and_nulls():
    """ADVICE: the old \x1f-joined text column split a buffered text that
    contained the separator (poison-pill conversation -> ValueError) and
    stringified nulls to 'None'. The JSON codec must round-trip both."""
    import pandas as pd

    from kafka2iceberg_spark.state import _pack_state, _unpack_state

    evil = "a\x1fb,c\nd\"quote\""
    buf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user", "tool", "user"],
            "text": [evil, None, ""],
            "ts": pd.to_datetime(
                ["2024-09-01 12:00:00", "2024-09-01 12:01:00",
                 "2024-09-01 12:02:00"]
            ),
        }
    )
    st = _FakeState()
    _pack_state(st, buf)
    out = _unpack_state(st, "c1")
    assert list(out["turn_idx"]) == [0, 1, 2]
    assert out["text"].iloc[0] == evil
    assert out["text"].iloc[1] is None
    assert out["text"].iloc[2] == ""
    assert list(out["role"]) == ["user", "tool", "user"]
    assert list(out["ts"]) == list(buf["ts"])


def test_stream_survives_separator_text(spark, tmp_path):
    """E2E: a buffered user turn whose text contains \x1f must pair
    correctly after the reply arrives in a later file."""
    evil = "payload\x1fwith separator"
    rows_by_file = [
        [("c1", 0, "user", evil)],
        [("c1", 1, "assistant", "ok")],
    ]
    got, batch = _stream_parity(spark, tmp_path, rows_by_file)
    gotk = {(r.conv_id, r.user_turn_idx): (r.user_text, r.reply_text) for r in got}
    assert gotk[("c1", 0)] == (evil, "ok")


def test_join_impl_matches_batch_pairs(spark, tmp_path):
    """The JVM stream-stream join variant must produce the same PAIRED rows
    as the batch oracle (unpaired trailing turns may stay in state, as with
    the stateful impl)."""
    from kafka2iceberg_spark.state import paired_turns_stream_join

    rows_by_file = [
        [("c1", 0, "user", "q0"), ("c2", 0, "user", "x0")],
        [("c1", 1, "assistant", "a1"), ("c2", 1, "tool", "y1")],
        [("c1", 2, "user", "q2"), ("c1", 3, "assistant", "a3"),
         ("c3", 0, "user", "solo")],
    ]
    got, batch = _stream_parity(
        spark, tmp_path, rows_by_file, impl=paired_turns_stream_join
    )
    gotk = {
        (r.conv_id, r.user_turn_idx): (r.reply_role, r.reply_text, r.latency_us)
        for r in got
        if r.reply_text is not None
    }
    batchk = {
        (r.conv_id, r.user_turn_idx): (r.reply_role, r.reply_text, r.latency_us)
        for r in batch
        if r.reply_text is not None
    }
    assert gotk == batchk
    assert len(batchk) >= 3  # the fixture actually exercises pairs


def test_join_impl_out_of_order_within_band(spark, tmp_path):
    """A reply that ARRIVES a file before its user turn (out-of-order
    arrival; timestamps within the join's event-time band) must still
    pair once both sides are in state."""
    from kafka2iceberg_spark.state import paired_turns_stream_join

    # turn 1 (reply) arrives in file 0; its user turn 0 arrives in file 1.
    rows_by_file = [
        [("c1", 1, "assistant", "a1")],
        [("c1", 0, "user", "q0")],
    ]
    got, batch = _stream_parity(
        spark, tmp_path, rows_by_file, impl=paired_turns_stream_join
    )
    gotk = {(r.conv_id, r.user_turn_idx): r.reply_text for r in got
            if r.reply_text is not None}
    assert gotk == {("c1", 0): "a1"}


def test_state_codec_reads_legacy_checkpoint_format():
    """A checkpoint written by the previous csv/\x1f codec must restore
    (review finding: json.loads on legacy strings poisoned the query)."""
    from kafka2iceberg_spark.state import _unpack_state

    st = _FakeState()
    st.update((
        "0,1",                     # turn_idx csv
        "user,assistant",          # legacy role csv
        "hello\x1fworld",          # legacy \x1f-joined text
        "1725192000000000,1725192060000000",
    ))
    out = _unpack_state(st, "c1")
    assert list(out["turn_idx"]) == [0, 1]
    assert list(out["role"]) == ["user", "assistant"]
    assert list(out["text"]) == ["hello", "world"]


def test_decode_list_legacy_payload_parsing_as_wrong_length_json():
    """ADVICE: a single legacy-buffered text that is itself valid JSON of
    the wrong length (e.g. '["a","b"]' with n=1) must NOT be adopted as
    the decoded list — it is one legacy value, not two JSON elements."""
    from kafka2iceberg_spark.state import _decode_list

    assert _decode_list('["a","b"]', 1, "\x1f") == ['["a","b"]']
    # the genuine JSON path is unaffected
    assert _decode_list('["a","b"]', 2, "\x1f") == ["a", "b"]
    assert _decode_list("[1]", 1, "\x1f") == [1]
