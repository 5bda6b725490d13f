"""SFT/chat-data prep (operators/chat.py): thread assembly, alternation
validation, and context-budget left-truncation — semantic pins on a
handcrafted log plus the single-exchange plan-shape contract. The relational
results are oracle-graded via the `chat_threads` / `chat_context_fit`
registry entries; these tests pin the cases the synthetic log may or may
not contain (oversized single turn, empty kept window, tie ordering).
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from realtime_spark.operators.chat import (
    chat_turns,
    fit_context_budget,
    thread_stats,
)

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (user_id, minutes_offset, event_type, k) — k drives n_tokens
    via (k % 64) + 1."""
    data = [
        (i, _T0 + dt.timedelta(minutes=m), u, et, 0.0, json.dumps({"k": k}))
        for i, (u, m, et, k) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def test_turn_assembly_roles_and_tokens(spark):
    # one user, one session (gaps < 30 min): click,user / error,assistant
    e = _events(spark, [(1, 0, "click", 9), (1, 5, "error", 63), (1, 10, "view", 64)])
    t = chat_turns(e, gap_seconds=1800).orderBy("turn_idx").collect()
    assert [(r["turn_idx"], r["role"], r["n_tokens"]) for r in t] == [
        (1, "user", 10),   # 9 % 64 + 1
        (2, "assistant", 64),  # 63 % 64 + 1
        (3, "user", 1),    # 64 % 64 + 1
    ]
    assert {r["session_id"] for r in t} == {0}


def test_thread_validation_states(spark):
    rows = [
        # u1 s0: user, assistant, user, assistant -> valid
        (1, 0, "click", 10), (1, 1, "error", 10),
        (1, 2, "view", 10), (1, 3, "purchase", 10),
        # u2 s0: starts assistant -> invalid
        (2, 0, "error", 10), (2, 1, "click", 10), (2, 2, "purchase", 10),
        # u3 s0: user,user (break) then assistant -> invalid, 1 break
        (3, 0, "click", 10), (3, 1, "view", 10), (3, 2, "error", 10),
        # u4 s0: single user turn -> invalid (n_turns < 2, ends user)
        (4, 0, "click", 10),
    ]
    s = thread_stats(chat_turns(_events(spark, rows), gap_seconds=1800))
    by_user = {r["user_id"]: r for r in s.collect()}
    assert by_user[1]["valid"] and by_user[1]["alternation_breaks"] == 0
    assert not by_user[2]["valid"] and by_user[2]["first_role"] == "assistant"
    assert not by_user[3]["valid"] and by_user[3]["alternation_breaks"] == 1
    assert not by_user[4]["valid"] and by_user[4]["n_turns"] == 1
    assert by_user[1]["total_tokens"] == 44  # 4 * (10 % 64 + 1)


def test_context_fit_keeps_maximal_suffix(spark):
    # tokens 11 each (k=10); budget 25 keeps exactly the last 2 turns
    rows = [(1, 0, "click", 10), (1, 1, "error", 10), (1, 2, "view", 10)]
    out = fit_context_budget(
        chat_turns(_events(spark, rows), gap_seconds=1800), budget=25
    ).collect()[0]
    assert (out["kept_turns"], out["dropped_turns"], out["kept_tokens"]) == (2, 1, 22)
    # the kept suffix starts at the assistant turn — flagged for a further drop
    assert out["first_kept_role"] == "assistant"


def test_context_fit_oversized_single_turn_drops_all(spark):
    # newest turn alone (k=40 -> 41 tokens) exceeds budget 40: empty thread
    rows = [(1, 0, "click", 10), (1, 1, "error", 40)]
    out = fit_context_budget(
        chat_turns(_events(spark, rows), gap_seconds=1800), budget=40
    ).collect()[0]
    assert (out["kept_turns"], out["dropped_turns"], out["kept_tokens"]) == (0, 2, 0)
    assert out["first_kept_role"] is None


def test_gap_splits_threads(spark):
    rows = [(1, 0, "click", 10), (1, 1, "error", 10), (1, 120, "view", 10)]
    s = thread_stats(chat_turns(_events(spark, rows), gap_seconds=1800))
    got = {(r["session_id"], r["n_turns"]) for r in s.collect()}
    assert got == {(0, 2), (1, 1)}


def test_single_exchange_plan(spark):
    """The whole prep pipeline — sessionize window (user_id), thread windows
    (user_id, session_id), closing per-thread agg — rides ONE hash exchange:
    hashpartitioning(user_id) satisfies the finer clusterings (subset rule),
    so Catalyst adds sorts, never a second shuffle."""
    e = _events(spark, [(1, 0, "click", 10), (1, 1, "error", 10)])
    for df in (
        thread_stats(chat_turns(e, gap_seconds=1800)),
        fit_context_budget(chat_turns(e, gap_seconds=1800), budget=100),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan


def test_streaming_chat_threads_match_batch_up_to_watermark(spark):
    """Streaming lift parity (same harness as test_sessions): every thread
    the stream finalizes must carry EXACTLY the batch stats — including the
    order-dependent first/last role and alternation breaks computed on the
    collected array — and anything missing is a user's final (unfinalized)
    thread."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from realtime_spark.operators.chat import (
        chat_turns,
        streaming_chat_threads,
        thread_stats,
    )
    from realtime_spark.sources.testdata import load_table
    from tests.conftest import SF_DIR

    gap = 86400
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "props"
    )
    turns = chat_turns(ev, gap_seconds=gap)
    starts = turns.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start")
    )
    batch_df = thread_stats(turns).join(starts, ["user_id", "session_id"])

    def _key(r):
        return (
            r["user_id"], str(r["session_start"]), r["n_turns"],
            r["n_user_turns"], r["n_asst_turns"], r["first_role"],
            r["last_role"], r["alternation_breaks"], r["total_tokens"],
            r["valid"],
        )

    batch = {_key(r) for r in batch_df.collect()}

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = streaming_chat_threads(stream, gap_seconds=gap, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("chat_threads_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError(
                "streaming chat drain timed out — fail loudly, not as a "
                "confusing parity mismatch"
            )
        got = {_key(r) for r in spark.sql("SELECT * FROM chat_threads_test").collect()}

    assert got <= batch, f"streaming emitted threads batch never saw: {list(got - batch)[:3]}"
    last_per_user: dict = {}
    for row in batch:
        last_per_user[row[0]] = max(last_per_user.get(row[0], ""), row[1])
    for row in batch - got:
        assert row[1] == last_per_user[row[0]], (
            f"non-final thread missing from stream: user={row[0]} start={row[1]}"
        )
    assert len(got) > 0
