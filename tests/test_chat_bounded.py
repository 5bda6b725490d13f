"""Bounded-state streaming chat lift (operators/chat.py
``streaming_chat_threads_bounded``, r9 verdict ask #2): per-key state is
hard-capped at max_turns, so the never-idle hot key — which grows the
declarative session_window variant's collect_list state without bound —
emits one truncated segment per max_turns turns and never holds more than
max_turns turns of state. Normal keys must reproduce the session_window
lift exactly (the `stream_chat_bounded` gate query value-grades that
equivalence against the DuckDB oracle on every corpus).

State boundedness is by construction (the split empties the buffer the
moment it reaches the cap, INSIDE event processing, before state.update)
and asserted behaviorally here: split segments appear in the sink while
the session is still open — before any watermark advance could have
finalized anything — which is only possible if the buffer was flushed.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from tests.test_chat import _write_chat_file


def _drain_bounded(spark, src, ckpt, sink_rows, gap, max_turns):
    from realtime_spark.operators.chat import streaming_chat_threads_bounded

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = streaming_chat_threads_bounded(
        stream, gap_seconds=gap, watermark="0 seconds", max_turns=max_turns
    )
    q = (
        out.writeStream.foreachBatch(
            lambda df, _eid: sink_rows.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("bounded chat stream drain timed out")


def _burst(start_eid, t0, n, user_id, step_s=1):
    """n alternating click/error events 1 s apart — a bot that never goes
    idle for any realistic gap."""
    return [
        (
            start_eid + i,
            (t0 + dt.timedelta(seconds=i * step_s)).isoformat(),
            user_id,
            "click" if i % 2 == 0 else "error",
        )
        for i in range(n)
    ]


_T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def test_hot_key_splits_at_cap_within_one_batch(spark, tmp_path):
    """350 never-idle turns in ONE batch with max_turns=100: three exact
    splits emitted from inside event processing plus the 50-turn tail at
    finalization — every segment truncated, turns conserved, segments in
    time order."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = _burst(0, _T0, 350, user_id=1)
    rows.append((9000, "2026-01-01T13:00:00", 9, "click"))  # watermark pusher
    _write_chat_file(spark, src, "f0", rows)
    sink: list = []
    _drain_bounded(spark, src, ckpt, sink, gap=600, max_turns=100)

    hot = sorted(
        (r for r in sink if r["user_id"] == 1), key=lambda r: r["session_start"]
    )
    assert [r["n_turns"] for r in hot] == [100, 100, 100, 50]
    assert all(r["truncated"] for r in hot)
    assert sum(r["n_turns"] for r in hot) == 350
    # alternating roles: every full segment starts user (even offset) and
    # ends assistant, zero breaks — the per-segment stats stay exact
    for r in hot[:3]:
        assert (r["first_role"], r["last_role"], r["alternation_breaks"]) == (
            "user", "assistant", 0
        )
        assert r["valid"]  # structurally valid AS A SEGMENT; consumers
        # filter on truncated for sample admission
    # segments tile the session: each starts right after its predecessor
    for a, b in zip(hot, hot[1:]):
        assert b["session_start"] > a["session_start"]
        assert b["session_start"] < a["session_end"]  # same logical session
    # the pusher's own 1-turn session is still open (end > watermark)
    assert not any(r["user_id"] == 9 for r in sink)


def test_hot_key_state_stays_bounded_across_cycles(spark, tmp_path):
    """The never-idle key across three drain cycles (shared checkpoint):
    each cycle's splits emit WHILE the session is still open — the state
    buffer provably flushed at the cap — and the normal user's thread
    finalizes untruncated with exact stats."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink: list = []

    # cycle 1: 120 hot turns + a normal 2-turn user
    rows = _burst(0, _T0, 120, user_id=1)
    rows += [
        (5000, "2026-01-01T12:00:00", 2, "click"),
        (5001, "2026-01-01T12:01:00", 2, "error"),
    ]
    _write_chat_file(spark, src, "f0", rows)
    _drain_bounded(spark, src, ckpt, sink, gap=600, max_turns=100)
    after_c1 = [(r["user_id"], r["n_turns"], r["truncated"]) for r in sink]
    # the hot session is OPEN (last event 12:01:59, end 12:11:59 > any
    # watermark this cycle) yet its first 100-turn split already emitted
    assert (1, 100, True) in after_c1

    # cycle 2: the bot keeps firing seamlessly (no idle gap at the seam)
    _write_chat_file(
        spark, src, "f1",
        _burst(200, _T0 + dt.timedelta(seconds=120), 120, user_id=1),
    )
    _drain_bounded(spark, src, ckpt, sink, gap=600, max_turns=100)
    hot_so_far = [r for r in sink if r["user_id"] == 1]
    # 240 turns so far -> exactly two splits out, <=40 turns left in state
    assert [r["n_turns"] for r in hot_so_far] == [100, 100]

    # cycle 3: the bot finally stops; a pusher advances the watermark past
    # the session end so the tail segment and the normal thread finalize
    _write_chat_file(spark, src, "f2", [(9000, "2026-01-01T14:00:00", 9, "click")])
    _drain_bounded(spark, src, ckpt, sink, gap=600, max_turns=100)

    hot = [r for r in sink if r["user_id"] == 1]
    assert [r["n_turns"] for r in hot] == [100, 100, 40]
    assert all(r["truncated"] for r in hot)
    normal = [r for r in sink if r["user_id"] == 2]
    assert len(normal) == 1
    r = normal[0]
    assert (r["n_turns"], r["first_role"], r["last_role"], r["valid"],
            r["truncated"]) == (2, "user", "assistant", True, False)


def test_bounded_out_of_order_and_late_drop_parity(spark, tmp_path):
    """The bounded lift under the out-of-order fixture of
    test_streaming_chat_out_of_order_arrivals: same finalized set as the
    session_window variant — late event dropped (no reopen, no founding),
    open-session merge allowed — all untruncated below the cap."""
    gap = 600
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink: list = []
    _write_chat_file(
        spark, src, "f0",
        [
            (1, "2026-01-01T12:00:00", 1, "click"),
            (2, "2026-01-01T12:01:00", 1, "error"),
            (3, "2026-01-01T12:00:30", 2, "view"),
            (4, "2026-01-01T12:30:00", 3, "click"),
        ],
    )
    _drain_bounded(spark, src, ckpt, sink, gap, max_turns=100)
    _write_chat_file(
        spark, src, "f1",
        [
            (5, "2026-01-01T12:05:00", 1, "view"),   # LATE: dropped
            (6, "2026-01-01T12:50:00", 1, "click"),
            (7, "2026-01-01T12:35:00", 3, "error"),  # open-session merge
            (8, "2026-01-01T13:30:00", 4, "click"),
        ],
    )
    _drain_bounded(spark, src, ckpt, sink, gap, max_turns=100)
    _write_chat_file(spark, src, "f2", [(9, "2026-01-01T14:00:00", 5, "click")])
    _drain_bounded(spark, src, ckpt, sink, gap, max_turns=100)

    final = {
        (r["user_id"], str(r["session_start"])[11:19], r["n_turns"],
         r["first_role"], r["last_role"], r["valid"], r["truncated"])
        for r in sink
    }
    expected = {
        (1, "12:00:00", 2, "user", "assistant", True, False),
        (2, "12:00:30", 1, "user", "user", False, False),
        (3, "12:30:00", 2, "user", "assistant", True, False),
        (1, "12:50:00", 1, "user", "user", False, False),
        (4, "13:30:00", 1, "user", "user", False, False),
    }
    assert final == expected, f"\ngot: {sorted(final)}\nexp: {sorted(expected)}"
