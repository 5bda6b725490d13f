"""Round-10 adversarial review tranche over the round-9 surface — the
empirical probes pinned as tests (the r7/r8 evidence convention: every
probe the tranche narrative claims is replayable here).

Scope reviewed (round-9 net-new, ~630 LoC):
- operators/chat.py:170-400   render / loss-spans / pack / streaming render
- plans/behavior.py:2344-2750 chat gate queries + oracles + drain harness
- plans/stream_stores.py:401-470  stream_search_loop
- operators/similarity.py:547-600 semantic_decontaminate
- plans/training.py q_sem_decontaminate + ORACLE_SEM_DECONTAMINATE
- bench.py retry/floor/probe machinery (separately hardened per r9 ADVICE,
  see tests/test_bench_selfdiag.py)

Findings: no correctness divergence. Two behavior contracts worth pinning
so future edits can't silently change them, plus the ADVICE items fixed in
the prior commit (retry-failure wall retention, adopted-floor visibility,
tail-name intersection, shared bos/eos render expression).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_sem_decontaminate_zero_norm_and_eval_free_clusters(spark):
    """Probe P1: a zero-norm eval vector has NULL cosine to everything —
    it must never contaminate; a cluster holding no eval vectors yields
    max_eval_cos NULL and contaminated=False (the semantics the
    similarity.py docstring promises)."""
    from realtime_spark.operators.similarity import semantic_decontaminate

    cents = _vdf(spark, [(100, [1.0, 0.0]), (200, [0.0, 1.0])])
    corpus = _vdf(spark, [(1, [0.9, 0.1]), (2, [0.1, 0.95]), (3, [1.0, 0.05])])
    ev = _vdf(spark, [(50, [0.0, 0.0]), (51, [0.05, 1.0])])
    rows = {
        r["vec_id"]: r
        for r in semantic_decontaminate(corpus, ev, cents, threshold=0.95).collect()
    }
    assert rows[2]["contaminated"] is True  # real near-dup of eval 51
    for vid in (1, 3):  # cluster 100: only the zero-norm eval could land there
        assert rows[vid]["max_eval_cos"] is None
        assert rows[vid]["contaminated"] is False


def test_pack_chat_threads_concat_then_chunk_contract(spark):
    """Probe P2: packing is concat-then-chunk (pack_id = floor(exclusive
    cumulative tokens / budget)), NOT greedy-bin-reset: an oversized thread
    occupies one row whose successors land at the cumulative boundary, so
    pack ids may be sparse. Invalid threads never enter the layout."""
    from realtime_spark.operators.chat import pack_chat_threads

    none_valid = spark.createDataFrame(
        [(1, 0, 9999, False), (2, 0, 50, False)],
        "user_id long, session_id long, total_tokens long, valid boolean",
    )
    assert pack_chat_threads(none_valid, 64).count() == 0

    t = spark.createDataFrame(
        [(1, 0, 9999, True), (2, 0, 50, True), (3, 0, 60, True)],
        "user_id long, session_id long, total_tokens long, valid boolean",
    )
    rows = pack_chat_threads(t, 64, n_shards=1).collect()
    by_key = {r["thread_key"]: r for r in rows}
    assert len(rows) == 3 and all(r["shard"] == 0 for r in rows)
    # hash order on this fixture: 1:0 (9999 toks) first, then 3:0, then 2:0
    assert by_key["1:0"]["pack_id"] == 0
    assert by_key["3:0"]["pack_id"] == 9999 // 64  # boundary after the giant
    assert by_key["2:0"]["pack_id"] == (9999 + 60) // 64
    assert all(r["pack_pos"] == 1 for r in rows)  # each alone in its bin


def test_render_carries_marker_containing_text_verbatim(spark):
    """Probe P3: turn text containing the eos marker is NOT escaped — the
    render concatenates verbatim (ChatML contract; collators split
    token-aware). Any future 'helpful' escaping would silently diverge
    from the DuckDB oracle's string_agg."""
    from realtime_spark.operators.chat import _rendered_expr

    df = spark.createDataFrame(
        [([{"ts": None, "event_id": 1, "role": "user", "text": "x<|im_end|>y"}],)],
        "arr array<struct<ts:timestamp,event_id:long,role:string,text:string>>",
    )
    got = df.select(
        _rendered_expr(F.col("arr"), "<|im_start|>", "<|im_end|>").alias("r")
    ).first()["r"]
    assert got == "<|im_start|>user\nx<|im_end|>y<|im_end|>\n"
