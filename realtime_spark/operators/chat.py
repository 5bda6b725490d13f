"""SFT/chat-data preparation: assemble event streams into conversation
threads, validate role alternation, and trim threads to a context budget.

Instruction-tuning pipelines consume MULTI-TURN data, not documents: a
thread is an ordered list of (role, text) turns, and the standard prep
stages are (1) thread assembly from raw interaction logs, (2) structural
validation — threads must start with a user turn and strictly alternate
user/assistant (template renderers reject anything else), and (3)
context-window fitting — when a thread exceeds the model's token budget the
OLDEST turns are dropped (left truncation), never the newest.

This module maps those stages onto the engine's event log: a conversation
is a gap session of one user's events (operators/sessions.py semantics), a
turn's role derives from the event type (request-like types are 'user',
response-like 'assistant'), and the per-turn token cost comes from the
event payload.

Scale shape (100 TB): everything below is ONE hash exchange on `user_id`.
The sessionize window partitions by user_id; the thread-local windows
partition by (user_id, session_id) — a SUPERSET clustering that
hashpartitioning(user_id) already satisfies (Spark's subset rule), so
Catalyst inserts sorts but no second exchange; the closing per-thread
groupBy partial-aggregates on the same key. Pinned by
tests/test_chat.py::test_single_exchange_plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from realtime_spark.operators.sessions import sessionize

# request-like event types become 'user' turns; the rest ('error',
# 'purchase' — system responses in this log's vocabulary) 'assistant'
USER_EVENT_TYPES = ("click", "view", "signup")


def turn_tokens(props: Column) -> Column:
    """Per-turn token cost from the event payload: the JSON `k` field folded
    into 1..64 — a deterministic stand-in for tokenizer output (the real
    pipeline would plug a token-count column in here, e.g.
    text.whitespace_token_count or a BPE segmenter count)."""
    # integer-literal gate before the cast: hostile payloads carry
    # non-integer k ('3.5', '+5', text) and the two engines' string->int
    # casts disagree on them (Spark NULLs '3.5' but accepts '+5'; DuckDB
    # ROUNDS '3.5') — an explicit integer grammar costs such turns the
    # floor of 1 token identically everywhere. Anchors are \A..\z, NOT
    # ^..$: Java's $ (Spark rlike) matches before a trailing newline while
    # RE2's (DuckDB) is end-of-text only, so '7\n' would cast here but not
    # in the oracle; \A/\z mean end-of-text in BOTH engines (verified
    # empirically, and the stress corpus plants the '7\n' shape).
    raw = F.get_json_object(props, "$.k")
    k = F.when(raw.rlike(r"\A-?[0-9]+\z"), raw.try_cast("int"))
    return (F.pmod(F.coalesce(k, F.lit(0)), F.lit(64)) + 1).cast("bigint")


def _turn_cols(user_types: tuple[str, ...]) -> list[Column]:
    """The shared event->turn projection (role from the event type, token
    cost from the payload, deterministic turn text) — the single place that
    contract lives, so the batch assembly and the streaming lift cannot
    drift apart. `text` is the per-turn content the template renderer
    emits; this log has no free text, so it is derived from the event
    identity (a real pipeline would plug the message body column here)."""
    role = F.when(
        F.col("event_type").isin(*user_types), F.lit("user")
    ).otherwise(F.lit("assistant"))
    return [
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id"),
        role.alias("role"),
        turn_tokens(F.col("props")).alias("n_tokens"),
        F.concat(
            F.col("event_type"), F.lit("#"), F.col("event_id").cast("string")
        ).alias("text"),
    ]


def chat_turns(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_types: tuple[str, ...] = USER_EVENT_TYPES,
) -> DataFrame:
    """Thread assembly: one row per turn with its conversation key
    (user_id, session_id), 1-based turn index, role, and token cost.

    Ordering inside a thread is (ts, event_id) — the same total order every
    other event window in the repo uses, so ties are deterministic."""
    s = sessionize(events, ["user_id"], "ts", gap_seconds)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    return s.select(
        F.col("session_id"), *_turn_cols(user_types)
    ).withColumn("turn_idx", F.row_number().over(w))


def thread_stats(turns: DataFrame) -> DataFrame:
    """Structural validation per thread: turn/role counts, whether the
    thread starts with a user turn and ends with an assistant turn, the
    number of alternation breaks (adjacent same-role turns), total tokens,
    and the template-validity verdict (starts user, ends assistant, >= 2
    turns, zero breaks) a chat-template renderer would enforce."""
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    prev_role = F.lag("role").over(w)
    t = turns.withColumn(
        "is_break", (prev_role.isNotNull() & (prev_role == F.col("role"))).cast("int")
    )
    first_role = F.min(F.struct("turn_idx", "role"))["role"]
    last_role = F.max(F.struct("turn_idx", "role"))["role"]
    agg = t.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int")).alias("n_user_turns"),
        F.sum((F.col("role") == "assistant").cast("int")).alias("n_asst_turns"),
        first_role.alias("first_role"),
        last_role.alias("last_role"),
        F.sum("is_break").cast("bigint").alias("alternation_breaks"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return agg.select(
        "user_id",
        "session_id",
        "n_turns",
        F.col("n_user_turns").cast("bigint").alias("n_user_turns"),
        F.col("n_asst_turns").cast("bigint").alias("n_asst_turns"),
        "first_role",
        "last_role",
        "alternation_breaks",
        "total_tokens",
        (
            (F.col("first_role") == "user")
            & (F.col("last_role") == "assistant")
            & (F.col("n_turns") >= 2)
            & (F.col("alternation_breaks") == 0)
        ).alias("valid"),
    )


def fit_context_budget(turns: DataFrame, budget: int) -> DataFrame:
    """Context-window fitting: per thread, keep the maximal SUFFIX of turns
    whose token total fits `budget` (left truncation — the newest turns
    always survive, like a chat template trimming history). A single turn
    larger than the budget is itself dropped, leaving an empty thread
    (kept_turns = 0), which downstream filters discard.

    Returns per-thread accounting: kept/dropped turn counts, kept tokens,
    and the role of the first kept turn — threads whose kept window starts
    with an assistant turn need a further leading-turn drop before
    rendering, so the count of those is the interesting data-quality
    number."""
    w_rev = (
        Window.partitionBy("user_id", "session_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = turns.withColumn("rev_cum", F.sum("n_tokens").over(w_rev)).withColumn(
        "kept", (F.col("rev_cum") <= budget).cast("int")
    )
    kept_first = F.min(
        F.when(F.col("kept") == 1, F.struct("turn_idx", "role"))
    )
    return t.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("kept").cast("bigint").alias("kept_turns"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("bigint").alias("dropped_turns"),
        F.sum(F.col("n_tokens") * F.col("kept")).alias("kept_tokens"),
        kept_first["role"].alias("first_kept_role"),
    )


def _rendered_expr(arr: Column, bos: str, eos: str) -> Column:
    """ChatML render of a sorted (ts, event_id, role, text) struct array:
    ``bos + role + \\n + text + eos + \\n`` per turn, concatenated. The ONE
    place the template lives — the batch render and the streaming lift both
    call this, so custom bos/eos markers cannot silently diverge between
    the two paths (r9 ADVICE, chat.py:375).

    Contract: turn text is carried VERBATIM — a text that itself contains
    the eos/bos marker is not escaped (ChatML renderers don't escape
    either; collators must split token-aware, not by substring search).
    Pinned by tests/test_chat_tranche.py."""
    return F.array_join(
        F.transform(
            arr,
            lambda x: F.concat(
                F.lit(bos), x["role"], F.lit("\n"), x["text"], F.lit(eos), F.lit("\n")
            ),
        ),
        "",
    )


def render_chat_template(
    turns: DataFrame,
    bos: str = "<|im_start|>",
    eos: str = "<|im_end|>",
) -> DataFrame:
    """The actual SFT sample (r8 verdict ask #5): per thread, the rendered
    role-tagged string — ``bos + role + \\n + text + eos + \\n`` per turn,
    concatenated in thread order (the ChatML shape every chat template is a
    variant of) — plus the loss-mask accounting an SFT collator needs:
    total tokens, assistant (loss) tokens, and the number of maximal
    assistant runs (= contiguous loss spans; with strict alternation every
    assistant turn is its own span, so n_loss_spans == n_asst_turns exactly
    when the thread validates).

    Scale shape (100 TB): the render is a per-thread fold on the sorted
    collected turn array — bounded by the session gap like the streaming
    lift's `_turns` — computed JVM-side (sort_array + transform +
    array_join, no Python UDF); the span counter is a lag window on the
    same (user_id, session_id) clustering, so the whole thing still rides
    the ONE hash exchange pinned by tests/test_chat.py."""
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    prev_role = F.lag("role").over(w)
    t = turns.withColumn(
        "is_span_start",
        (
            (F.col("role") == "assistant")
            & (prev_role.isNull() | (prev_role != "assistant"))
        ).cast("int"),
    )
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "role", "text")))
    rendered = _rendered_expr(arr, bos, eos)
    agg = t.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(
            F.when(F.col("role") == "assistant", F.col("n_tokens")).otherwise(
                F.lit(0)
            )
        ).cast("bigint").alias("loss_tokens"),
        F.sum("is_span_start").cast("bigint").alias("n_loss_spans"),
        rendered.alias("rendered"),
    )
    return agg.withColumn("n_chars", F.length("rendered").cast("bigint"))


def chat_loss_spans(turns: DataFrame) -> DataFrame:
    """Per-turn loss-mask token ranges over the rendered thread: each turn's
    [tok_start, tok_end) offset into the thread's token stream (exclusive
    prefix sum in thread order — the same shard-confined window shape as
    pack_token_windows' start_tok) and whether the range is trained on
    (loss = assistant turn; user turns are context-only, the standard SFT
    masking rule). A collator zips these ranges straight into the 0/1 mask
    vector. One hash exchange, same clustering as every other thread
    window."""
    w = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return turns.select(
        "user_id",
        "session_id",
        "turn_idx",
        "role",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        start.alias("tok_start"),
        (start + F.col("n_tokens")).cast("bigint").alias("tok_end"),
        (F.col("role") == "assistant").alias("loss"),
    )


def pack_chat_threads(
    threads: DataFrame,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """SFT sample packing: lay VALIDATED threads (thread_stats rows with
    valid = true) out in the deterministic hash order and greedily chunk
    them into ~`budget`-token training bins — the standard "packing SFT
    samples" layout where several short conversations share one context
    window behind a cross-sample attention mask. Thread identity is the
    composite key rendered as 'user_id:session_id'.

    Scale shape (100 TB): packing runs per hash shard
    (text.pack_by_token_budget with partition_col — one exchange on the
    shard id, never a corpus-global total order), the same sub-sharding
    rule as pack_token_windows; bins simply spread across shards.

    Output: (thread_key, total_tokens, shard, pack_id, pack_pos)."""
    from realtime_spark.operators.sampling import hash_bucket
    from realtime_spark.operators.text import pack_by_token_budget

    key = F.concat_ws(":", F.col("user_id"), F.col("session_id"))
    units = threads.filter(F.col("valid")).select(
        key.alias("thread_key"),
        F.col("total_tokens"),
        hash_bucket(key, n_shards).cast("int").alias("shard"),
    )
    return pack_by_token_budget(
        units, "thread_key", "total_tokens", budget, partition_col="shard"
    )


def streaming_chat_threads(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 minutes",
    user_types: tuple[str, ...] = USER_EVENT_TYPES,
    render: bool = False,
    bos: str = "<|im_start|>",
    eos: str = "<|im_end|>",
) -> DataFrame:
    """Streaming lift of chat_turns -> thread_stats: native session_window
    aggregation with watermarking, so threads finalize (append mode) once
    the watermark passes their gap — the same semantics over an unbounded
    stream, keyed by (user_id, session start/end) instead of the batch
    session index.

    The order-dependent fields (first/last role, alternation breaks) are
    not commutative folds, so the aggregate collects the session's
    (ts, event_id, role) triples — bounded by the session length, which the
    gap bounds in any real log — and computes them JVM-side on the sorted
    array with higher-order functions; no Python UDF, no second shuffle.
    Late events beyond the watermark are dropped rather than reopening a
    finalized thread (the documented ST2-class deviation, same as
    streaming_sessions).

    With ``render=True`` the finalized thread additionally carries its
    ChatML-rendered string (the SAME shared template expression as
    render_chat_template, including the bos/eos markers — _rendered_expr
    is the single source of truth for both paths),
    computed JVM-side from the SAME sorted collected array the
    order-dependent stats already use — the streaming path emits the
    finished SFT sample, not just its stats, at zero extra shuffle/state
    beyond the turn text riding in the collected struct."""
    t = events.select(*_turn_cols(user_types))
    agg = (
        t.withWatermark("ts", watermark)
        .groupBy(
            "user_id", F.session_window(F.col("ts"), f"{gap_seconds} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("role") == "user").cast("int"))
            .cast("bigint")
            .alias("n_user_turns"),
            F.sum((F.col("role") == "assistant").cast("int"))
            .cast("bigint")
            .alias("n_asst_turns"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sort_array(
                F.collect_list(
                    # text rides in the collected struct ONLY when the
                    # render is requested — the stats-only stream keeps
                    # its original (smaller) state rows
                    F.struct("ts", "event_id", "role", "text")
                    if render
                    else F.struct("ts", "event_id", "role")
                )
            ).alias("_turns"),
        )
    )
    roles = F.transform(F.col("_turns"), lambda x: x["role"])
    n = F.size(roles)
    breaks = F.size(
        F.filter(
            F.zip_with(
                F.slice(roles, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    ).cast("bigint")
    first_role = F.element_at(roles, 1)
    last_role = F.element_at(roles, -1)
    cols = [
        F.col("user_id"),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col("n_turns"),
        F.col("n_user_turns"),
        F.col("n_asst_turns"),
        first_role.alias("first_role"),
        last_role.alias("last_role"),
        breaks.alias("alternation_breaks"),
        F.col("total_tokens"),
        (
            (first_role == "user")
            & (last_role == "assistant")
            & (F.col("n_turns") >= 2)
            & (breaks == F.lit(0))
        ).alias("valid"),
    ]
    if render:
        cols.append(_rendered_expr(F.col("_turns"), bos, eos).alias("rendered"))
    return agg.select(*cols)
