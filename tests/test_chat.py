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


def test_render_and_loss_mask(spark):
    """render_chat_template / chat_loss_spans semantic pins: ChatML shape in
    thread order, loss tokens = assistant tokens, span counting collapses
    ADJACENT assistant turns into one maximal run, and the per-turn token
    ranges tile the thread's token stream exactly."""
    from realtime_spark.operators.chat import chat_loss_spans, render_chat_template

    # u1: user(click,k=10), assistant(error), assistant(purchase), user(view)
    # -> ONE loss span covering turns 2-3 despite two assistant turns
    rows = [(1, 0, "click", 10), (1, 1, "error", 2),
            (1, 2, "purchase", 4), (1, 3, "view", 10)]
    turns = chat_turns(_events(spark, rows), gap_seconds=1800)
    r = render_chat_template(turns).collect()[0]
    assert r["n_turns"] == 4
    assert r["total_tokens"] == 11 + 3 + 5 + 11
    assert r["loss_tokens"] == 3 + 5
    assert r["n_loss_spans"] == 1  # adjacent assistant turns: one maximal run
    expected_render = (
        "<|im_start|>user\nclick#0<|im_end|>\n"
        "<|im_start|>assistant\nerror#1<|im_end|>\n"
        "<|im_start|>assistant\npurchase#2<|im_end|>\n"
        "<|im_start|>user\nview#3<|im_end|>\n"
    )
    assert r["rendered"] == expected_render
    assert r["n_chars"] == len(expected_render)

    spans = sorted(
        (s["turn_idx"], s["tok_start"], s["tok_end"], s["loss"])
        for s in chat_loss_spans(turns).collect()
    )
    assert spans == [
        (1, 0, 11, False), (2, 11, 14, True), (3, 14, 19, True),
        (4, 19, 30, False),
    ]


def test_pack_chat_threads_invariants(spark):
    """pack_chat_threads: only VALID threads are packed, bins are
    shard-local with contiguous 1-based positions, every bin except a
    shard's last stops only once the budget is reached (greedy rule:
    a pack ends when its running total reaches the budget, so it can
    overflow by at most one thread)."""
    from realtime_spark.operators.chat import pack_chat_threads

    rows = []
    # 6 valid 2-turn threads (22 tokens each) + 1 invalid (single turn)
    for u in range(1, 7):
        rows += [(u, 0, "click", 10), (u, 1, "error", 10)]
    rows.append((7, 0, "click", 10))
    t = thread_stats(chat_turns(_events(spark, rows), gap_seconds=1800))
    packed = pack_chat_threads(t, budget=40, n_shards=2).collect()
    assert len(packed) == 6  # the invalid thread is excluded
    assert {r["thread_key"] for r in packed} == {f"{u}:0" for u in range(1, 7)}
    by_bin: dict = {}
    for r in packed:
        by_bin.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for (shard, pack_id), members in by_bin.items():
        assert sorted(m["pack_pos"] for m in members) == list(
            range(1, len(members) + 1)
        )
        total = sum(m["total_tokens"] for m in members)
        last_bin = pack_id == max(p for s, p in by_bin if s == shard)
        if not last_bin:
            assert total >= 40  # greedy: a non-final bin reached the budget
        # 22-token threads with budget 40: exactly 2 per full bin
        assert len(members) <= 2


def test_streaming_render_matches_batch_render(spark):
    """The render=True streaming lift must emit, for every finalized
    thread, EXACTLY the batch render_chat_template string."""
    import os
    import tempfile

    from realtime_spark.operators.chat import (
        render_chat_template,
        streaming_chat_threads,
    )

    rows = [(1, 0, "click", 9), (1, 5, "error", 63), (2, 1, "view", 3),
            (2, 2, "purchase", 4), (3, 2000, "click", 1)]
    e = _events(spark, rows)
    batch = {
        r["rendered"]
        for r in render_chat_template(chat_turns(e, gap_seconds=1800)).collect()
    }
    got = []
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        e.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(e.schema).parquet(src)
        out = streaming_chat_threads(
            stream, gap_seconds=1800, watermark="0 seconds", render=True
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _eid: got.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    assert len(got) >= 2  # u1 and u2 finalize behind u3's watermark push
    for r in got:
        assert r["rendered"] in batch
        assert r["rendered"].startswith("<|im_start|>")


def test_single_exchange_plan(spark):
    """The whole prep pipeline — sessionize window (user_id), thread windows
    (user_id, session_id), closing per-thread agg — rides ONE hash exchange:
    hashpartitioning(user_id) satisfies the finer clusterings (subset rule),
    so Catalyst adds sorts, never a second shuffle."""
    from realtime_spark.operators.chat import chat_loss_spans, render_chat_template

    e = _events(spark, [(1, 0, "click", 10), (1, 1, "error", 10)])
    from realtime_spark.operators.chat import preference_pairs

    for df in (
        thread_stats(chat_turns(e, gap_seconds=1800)),
        fit_context_budget(chat_turns(e, gap_seconds=1800), budget=100),
        render_chat_template(chat_turns(e, gap_seconds=1800)),
        chat_loss_spans(chat_turns(e, gap_seconds=1800)),
        preference_pairs(chat_turns(e, gap_seconds=1800)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan


def test_preference_pairs_semantics(spark):
    """DPO pair assembly pins: a >= 2 candidate regeneration run yields one
    pair (chosen = most tokens tie-earliest, rejected = fewest tie-latest);
    single-candidate runs, user-only prompts, and leading assistants (no
    prompt) yield nothing; an all-tied run still splits earliest/latest."""
    from realtime_spark.operators.chat import preference_pairs

    rows = [
        # u1: prompt (idx1), then 3 candidates: 20, 40, 10 tokens ->
        #   chosen idx3 (40), rejected idx4 (10)
        (1, 0, "click", 19), (1, 1, "error", 19), (1, 2, "purchase", 39),
        (1, 3, "error", 9),
        # u1 second prompt (idx5) with ONE candidate -> no pair
        (1, 4, "view", 10), (1, 5, "purchase", 10),
        # u2: leading assistants before any user turn -> no prompt, no pair;
        #   then prompt (idx3) + 2 all-tied candidates -> chosen = earliest
        #   (idx4), rejected = latest (idx5), margin 0
        (2, 0, "error", 10), (2, 1, "purchase", 10),
        (2, 2, "click", 10), (2, 3, "error", 30), (2, 4, "purchase", 30),
    ]
    out = preference_pairs(chat_turns(_events(spark, rows), gap_seconds=1800))
    got = {
        (r["user_id"], r["prompt_idx"]): (
            r["n_candidates"], r["chosen_idx"], r["chosen_tokens"],
            r["rejected_idx"], r["rejected_tokens"], r["margin"],
        )
        for r in out.collect()
    }
    assert got == {
        (1, 1): (3, 3, 40, 4, 10, 30),
        (2, 3): (2, 4, 31, 5, 31, 0),
    }


def test_preference_pairs_session_and_prompt_boundaries(spark):
    """Tranche probes: (a) the prompt-run counter RESETS per session — a
    regeneration run must never straddle a gap-session boundary even for
    the same user; (b) consecutive user turns each found their own run
    (the first, candidate-less run yields nothing)."""
    from realtime_spark.operators.chat import preference_pairs

    rows = [
        # session 0: u,u,a,a -> run 1 = {u1} (no candidates), run 2 =
        #   {u2, a, a} -> one pair with prompt_idx 2
        (1, 0, "click", 10), (1, 1, "view", 20), (1, 2, "error", 5),
        (1, 3, "purchase", 40),
        # > 30 min gap -> session 1: a,a then u,a,a — the leading
        #   assistants belong to NO prompt (not to session 0's run 2!),
        #   the pair comes from the new prompt at turn_idx 3
        (1, 40, "error", 7), (1, 41, "purchase", 8),
        (1, 42, "click", 9), (1, 43, "error", 30), (1, 44, "purchase", 50),
    ]
    out = preference_pairs(chat_turns(_events(spark, rows), gap_seconds=1800))
    got = {
        (r["session_id"], r["prompt_idx"]): (
            r["n_candidates"], r["chosen_tokens"], r["rejected_tokens"],
        )
        for r in out.collect()
    }
    assert got == {
        (0, 2): (2, 41, 6),   # k=40 -> 41 tokens, k=5 -> 6 tokens
        (1, 3): (2, 51, 31),  # session-1 pair; the leading a,a made no run
    }


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


def _drain_chat_stream(spark, src, ckpt, sink_rows, gap):
    """One availableNow drain cycle of streaming_chat_threads off `src`,
    appending emitted rows to `sink_rows` (foreachBatch — the memory sink
    cannot recover from a checkpoint, and the shared checkpoint is the
    point: the watermark persists across cycles, exactly the multi-cycle
    shape of the stream_* gate queries)."""
    from realtime_spark.operators.chat import streaming_chat_threads

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = streaming_chat_threads(stream, gap_seconds=gap, watermark="0 seconds")
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
        raise TimeoutError("chat stream drain timed out")


def _write_chat_file(spark, src, tag, rows):
    """rows: (event_id, ts_str, user_id, event_type, k_json)."""
    import os

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "props string"
    )
    data = [
        (eid, dt.datetime.fromisoformat(ts), u, et, json.dumps({"k": 10}))
        for eid, ts, u, et in rows
    ]
    spark.createDataFrame(data, schema).coalesce(1).write.parquet(
        os.path.join(src, tag)
    )


def test_watermark_equality_boundary_emits(spark):
    """The ORACLE_STREAM_CHAT_THREADS emission rule is `end_us <= max ts`
    (watermark EQUALITY emits) — pinned empirically when the oracle was
    written; this fixture makes the boundary itself a named assertion, so
    a Spark upgrade flipping the eviction boundary to strict < fails HERE,
    not as a generic oracle hash mismatch (r8 ADVICE).

    u1's session end (last ts + gap) lands EXACTLY on the corpus max ts
    (u2's lone event): u1 must be emitted, u2 (end past the watermark)
    must not."""
    import os
    import tempfile

    gap = 600
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        _write_chat_file(
            spark, src, "f0",
            [
                (1, "2026-01-01T12:00:00", 1, "click"),
                (2, "2026-01-01T12:05:00", 1, "error"),
                # max ts == u1's session end: 12:05 + 600 s = 12:15 exactly
                (3, "2026-01-01T12:15:00", 2, "click"),
            ],
        )
        rows = []
        _drain_chat_stream(spark, src, ckpt, rows, gap)
    emitted = {(r["user_id"], r["n_turns"]) for r in rows}
    assert emitted == {(1, 2)}, (
        f"expected exactly u1's 2-turn thread at watermark equality, got {rows}"
    )
    (r,) = rows
    assert str(r["session_end"]) == "2026-01-01 12:15:00"
    assert r["valid"] and r["first_role"] == "user" and r["last_role"] == "assistant"


def test_streaming_chat_out_of_order_arrivals(spark):
    """r8 verdict ask #3: the gate query drains ONE file, so events arrive
    in written order and the watermark rule is only exercised trivially.
    Here the corpus arrives as 3 files across SEPARATE drain cycles
    (shared checkpoint carries the watermark), sessions interleaved across
    files, with a late event planted beyond the watermark: finalized
    threads must match the batch stats computed WITHOUT the late event,
    and the late event is dropped — it neither re-opens the finalized
    thread nor founds a session of its own (the documented ST2-class
    deviation)."""
    import os
    import tempfile

    gap = 600
    sink_rows: list = []
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        # cycle 1: u1's 2-turn session (end 12:11), u2's 1-turn session
        # (end 12:10), and a pusher at 12:30 — after this drain the
        # watermark is 12:30, so both sessions finalize
        _write_chat_file(
            spark, src, "f0",
            [
                (1, "2026-01-01T12:00:00", 1, "click"),
                (2, "2026-01-01T12:01:00", 1, "error"),
                (3, "2026-01-01T12:00:30", 2, "view"),
                (4, "2026-01-01T12:30:00", 3, "click"),
            ],
        )
        _drain_chat_stream(spark, src, ckpt, sink_rows, gap)
        after_c1 = {(r["user_id"], str(r["session_start"])[11:19], r["n_turns"])
                    for r in sink_rows}
        # cycle 2: a LATE u1 event at 12:05 (candidate window end 12:15 <=
        # watermark 12:30 -> dropped), u1's NEW session at 12:50, u3's
        # continuation... u3's 12:30 session is still open (end 12:40 >
        # 12:30); extend it at 12:35 (not late: > watermark is irrelevant,
        # merging an OPEN session is allowed), plus a pusher at 13:30
        _write_chat_file(
            spark, src, "f1",
            [
                (5, "2026-01-01T12:05:00", 1, "view"),   # LATE: dropped
                (6, "2026-01-01T12:50:00", 1, "click"),
                (7, "2026-01-01T12:35:00", 3, "error"),
                (8, "2026-01-01T13:30:00", 4, "click"),
            ],
        )
        _drain_chat_stream(spark, src, ckpt, sink_rows, gap)
        # cycle 3: nothing new for the finalized users; a final pusher so
        # u4's session (end 13:40) finalizes too
        _write_chat_file(
            spark, src, "f2",
            [(9, "2026-01-01T14:00:00", 5, "click")],
        )
        _drain_chat_stream(spark, src, ckpt, sink_rows, gap)
        final = {
            (r["user_id"], str(r["session_start"])[11:19], r["n_turns"],
             r["first_role"], r["last_role"], r["valid"])
            for r in sink_rows
        }

    # u1's first thread finalized after cycle 1 with exactly its 2
    # in-order turns
    assert (1, "12:00:00", 2) in after_c1, after_c1
    expected = {
        (1, "12:00:00", 2, "user", "assistant", True),     # late event NOT added
        (2, "12:00:30", 1, "user", "user", False),
        (3, "12:30:00", 2, "user", "assistant", True),     # open-session merge OK
        (1, "12:50:00", 1, "user", "user", False),
        (4, "13:30:00", 1, "user", "user", False),
    }
    assert final == expected, f"\ngot: {sorted(final)}\nexp: {sorted(expected)}"
    # the late event founded no session: no thread starts at 12:05
    assert not any(s == "12:05:00" for (_, s, *_rest) in final)


def test_custom_markers_shared_between_batch_and_stream(spark):
    """bos/eos are parameters of BOTH render paths and flow through the one
    shared _rendered_expr (r9 ADVICE, chat.py:375): a caller using custom
    template markers must get byte-identical batch and streaming renders."""
    import os
    import tempfile

    from realtime_spark.operators.chat import (
        render_chat_template,
        streaming_chat_threads,
    )

    bos, eos = "<s>", "</s>"
    rows = [(1, 0, "click", 9), (1, 5, "error", 63), (2, 1, "view", 3),
            (2, 2, "purchase", 4), (3, 2000, "click", 1)]
    e = _events(spark, rows)
    batch = {
        r["rendered"]
        for r in render_chat_template(
            chat_turns(e, gap_seconds=1800), bos=bos, eos=eos
        ).collect()
    }
    got = []
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        e.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(e.schema).parquet(src)
        out = streaming_chat_threads(
            stream, gap_seconds=1800, watermark="0 seconds",
            render=True, bos=bos, eos=eos,
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _eid: got.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    assert len(got) >= 2
    for r in got:
        assert r["rendered"] in batch
        assert r["rendered"].startswith("<s>user\n")
        assert r["rendered"].endswith("</s>\n")
        assert "<|im_start|>" not in r["rendered"]


def test_chat_turns_bpe_one_exchange_and_costing_parity(spark):
    """r9 verdict ask #5: the BPE coster runs map-only BEFORE the
    sessionize exchange, so the whole BPE-costed fit pipeline still pays
    ONE hash exchange; and the inline with_bpe_token_count agrees with
    segment_with_merges' n_bpe_tokens on the same texts."""
    from realtime_spark.operators.bpe import (
        segment_with_merges,
        train_bpe,
        with_bpe_token_count,
    )
    from realtime_spark.operators.chat import chat_turns_bpe, fit_context_budget
    from realtime_spark.sources.testdata import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").limit(200)
    merges = train_bpe(d, num_merges=6)

    # parity: the inline coster vs the segmenter's count, same merge table
    seg = segment_with_merges(d, merges).select("doc_id", "n_bpe_tokens")
    inline = with_bpe_token_count(
        d.select("doc_id", "text"), merges, out_col="n"
    ).select("doc_id", "n")
    joined = seg.join(inline, "doc_id")
    assert joined.filter("n_bpe_tokens <> n").count() == 0

    # plan shape: one exchange through sessionize + windows + closing agg
    e = load_table(spark, SF_DIR, "events")
    fit = fit_context_budget(chat_turns_bpe(e, merges, gap_seconds=86400), 128)
    plan = fit._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
