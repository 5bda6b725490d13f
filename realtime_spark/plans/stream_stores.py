"""Matrix-level oracle queries over the STREAMING ingest stores.

The streaming trio's batch-equivalence was pytest-asserted (r5); these
queries put the stores themselves under the driver's CORRECTNESS gate: each
one seeds a store from deterministic slices of the warehouse tables, folds
several ingest epochs through the real foreachBatch bodies (the exact unit
the stream executes and replays — stream == sequential fold is proven by
tests/test_streaming_*.py), runs an EPOCH COMPACTION mid-sequence, ingests
more epochs into the compacted store, and returns the final read off the
live store. The DuckDB oracle computes the same answer from the raw tables:

- stream_ingest_accepted: the corpus-ingest dedup fold (digest anti-join +
  LSH index probe, epoch-ordered) as an unrolled 3-epoch CTE over the same
  MinHash SQL machinery the dedup_minhash_lsh oracle proved engine-exact.
- stream_ivf_topk: vector ingest accepts the whole embeddings table across
  epochs (one epoch is a full re-delivery that the seen-id anti-join must
  reject), so search off the live store must equal the ORACLE_ANN_IVF_TOPK
  batch answer over all embeddings.
- stream_bm25_topk: search ingest indexes the whole documents table across
  epochs; folded-partial BM25 off the live store must hash-match the batch
  ORACLE_SEARCH_BM25.

Every query exercises compaction + post-compaction epochs on the hot path,
so the driver gate now covers the stores' full lifecycle, not just their
first write.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.sources.testdata import load_table
from realtime_spark.plans.training import (
    NEAR_DUP_TAIL,
    ORACLE_ANN_IVF_TOPK,
    ORACLE_SEARCH_BM25,
    SQL_TOKS,
    _ANN_K,
    _ANN_QUERY_PRED,
    _BM25_TERMS,
    _BM25_K,
    _IVF_CENT_PRED,
    _IVF_NPROBE,
    _SQL_BANDED_CTES,
)


def _fresh_root(sf_dir: str, name: str) -> str:
    """Per-(corpus, query) scratch root; wiped first so a re-run in the same
    process never sees a previously compacted manifest."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/realtime_spark_stream_{name}_{sf_tag}_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    return root


# ---------------------------------------------------------------------------
# corpus ingest: epoch-ordered dedup fold
# ---------------------------------------------------------------------------


def q_stream_ingest_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ingest over three epochs with engineered fates: exact dups of
    the corpus and of earlier-epoch docs (digest store must grow), near-dup
    tails of corpus and earlier-epoch docs (LSH index must grow), natural
    cross-slice text duplicates from the warehouse itself, and genuinely
    fresh reversed-token docs. Epochs 0-1 land pre-compaction, epoch 2 lands
    in the COMPACTED store."""
    from realtime_spark.operators.dedup import tokens_expr
    from realtime_spark.streaming.compaction import compact_ingest_state
    from realtime_spark.streaming.ingest import (
        accepted_docs,
        process_ingest_batch,
        seed_ingest_state,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter("doc_id % 3 = 0")
    e0 = d.filter("doc_id % 3 = 1").unionByName(
        d.filter("doc_id % 9 = 0").select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    e1 = (
        d.filter("doc_id % 3 = 2")
        .unionByName(
            d.filter("doc_id % 3 = 1 AND doc_id % 7 = 0").select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter("doc_id % 9 = 3").select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat("text", F.lit(NEAR_DUP_TAIL)).alias("text"),
            )
        )
    )
    e2 = d.filter("doc_id % 3 = 1 AND doc_id % 5 = 0").select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat("text", F.lit(NEAR_DUP_TAIL)).alias("text"),
    ).unionByName(
        d.filter("doc_id % 9 = 6").select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            F.array_join(F.reverse(tokens_expr(F.col("text"))), " ").alias("text"),
        )
    )

    root = _fresh_root(sf_dir, "ingest")
    seed_ingest_state(corpus, root)
    process_ingest_batch(e0, 0, root)
    process_ingest_batch(e1, 1, root)
    compact_ingest_state(spark, root)
    process_ingest_batch(e2, 2, root)
    return accepted_docs(spark, root).select(
        "doc_id", F.md5("text").alias("digest")
    )


_STREAM_SRC_CTE = f"""
src AS (
  SELECT doc_id, text, -1 AS epoch FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, text, 0 FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id + 1000000, text, 0 FROM documents WHERE doc_id % 9 = 0
  UNION ALL
  SELECT doc_id, text, 1 FROM documents WHERE doc_id % 3 = 2
  UNION ALL
  SELECT doc_id + 2000000, text, 1 FROM documents
  WHERE doc_id % 3 = 1 AND doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 3000000, text || '{NEAR_DUP_TAIL}', 1 FROM documents
  WHERE doc_id % 9 = 3
  UNION ALL
  SELECT doc_id + 4000000, text || '{NEAR_DUP_TAIL}', 2 FROM documents
  WHERE doc_id % 3 = 1 AND doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 5000000,
         array_to_string(list_reverse({SQL_TOKS}), ' '), 2 FROM documents
  WHERE doc_id % 9 = 6
)
"""

# the shared banded-MinHash machinery tokenizes a `_docs_dup` source —
# rebind it to the epoch-labelled src set
_STREAM_BANDED = _SQL_BANDED_CTES.strip().replace("FROM _docs_dup", "FROM src")


def _acc_cte(n: int) -> str:
    """One epoch of the ingest fold: digest not already in the index, min
    doc_id per digest within the epoch (dedup_incremental), and no banded
    (band, key) collision with any indexed doc (lsh_candidates_against_
    index). Conditions AND-compose exactly like the pipeline because a
    row failing an earlier stage cannot be resurrected by a later one."""
    return f"""
acc{n} AS (
  SELECT d.doc_id, d.digest FROM dig d
  WHERE d.epoch = {n}
    AND NOT EXISTS (SELECT 1 FROM idx{n} i WHERE i.digest = d.digest)
    AND d.doc_id = (SELECT min(x.doc_id) FROM dig x
                    WHERE x.epoch = {n} AND x.digest = d.digest)
    AND NOT EXISTS (
      SELECT 1 FROM banded nb JOIN banded ib
        ON nb.band = ib.band AND nb.key = ib.key
      WHERE nb.doc = d.doc_id
        AND ib.doc IN (SELECT doc_id FROM idx{n}))
)"""


ORACLE_STREAM_INGEST_ACCEPTED = f"""
WITH {_STREAM_SRC_CTE.strip()},
{_STREAM_BANDED},
dig AS (SELECT doc_id, epoch, md5(text) AS digest FROM src),
idx0 AS (SELECT doc_id, digest FROM dig WHERE epoch = -1),
{_acc_cte(0).strip()},
idx1 AS (SELECT * FROM idx0 UNION ALL SELECT * FROM acc0),
{_acc_cte(1).strip()},
idx2 AS (SELECT * FROM idx1 UNION ALL SELECT * FROM acc1),
{_acc_cte(2).strip()}
SELECT doc_id, digest FROM acc0
UNION ALL SELECT doc_id, digest FROM acc1
UNION ALL SELECT doc_id, digest FROM acc2
"""


def q_stream_compaction_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 scheduled-compaction policy under the driver gate: the
    SAME three-epoch arrival sequence as q_stream_ingest_accepted, but
    driven through ``run_ingest_cycles`` — real availableNow drain cycles
    off a file source with compaction as a threshold janitor BETWEEN
    cycles (max_epochs=2: the trigger fires after the second drain, so
    epoch 2 lands in the auto-compacted store). The accepted set must
    equal the manually-sequenced twin's, i.e. the identical oracle."""
    import tempfile

    from realtime_spark.operators.dedup import tokens_expr
    from realtime_spark.streaming.compaction import (
        INGEST_SUBSTORES,
        compact_ingest_state,
        run_ingest_cycles,
    )
    from realtime_spark.streaming.ingest import (
        accepted_docs,
        run_ingest_stream,
        seed_ingest_state,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter("doc_id % 3 = 0")
    e0 = d.filter("doc_id % 3 = 1").unionByName(
        d.filter("doc_id % 9 = 0").select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    e1 = (
        d.filter("doc_id % 3 = 2")
        .unionByName(
            d.filter("doc_id % 3 = 1 AND doc_id % 7 = 0").select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter("doc_id % 9 = 3").select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat("text", F.lit(NEAR_DUP_TAIL)).alias("text"),
            )
        )
    )
    e2 = d.filter("doc_id % 3 = 1 AND doc_id % 5 = 0").select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat("text", F.lit(NEAR_DUP_TAIL)).alias("text"),
    ).unionByName(
        d.filter("doc_id % 9 = 6").select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            F.array_join(F.reverse(tokens_expr(F.col("text"))), " ").alias("text"),
        )
    )

    root = _fresh_root(sf_dir, "loop")
    seed_ingest_state(corpus, root)
    src = tempfile.mkdtemp(prefix="rs_loop_src_")
    ckpt = f"{root}/_ckpt"
    arrivals = iter([e0, e1, e2])

    def start_stream():
        batch = next(arrivals)
        # parallel write (r10): one drain cycle = ALL new files in one
        # availableNow batch, so multi-file epochs batch identically while
        # the scan map side keeps cluster parallelism (a coalesce(1)
        # source serialized every epoch's tokenize/probe onto one core)
        batch.write.parquet(f"{src}/f{len(os.listdir(src))}")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return run_ingest_stream(stream, root, ckpt)

    try:
        telemetry = run_ingest_cycles(
            spark, root, start_stream, compact_ingest_state,
            INGEST_SUBSTORES, cycles=3, max_epochs=2,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
    if [t["compacted"] for t in telemetry] != [False, True, False]:
        raise AssertionError(f"compaction trigger misfired: {telemetry}")
    return accepted_docs(spark, root).select(
        "doc_id", F.md5("text").alias("digest")
    )


# ---------------------------------------------------------------------------
# vector ingest: live-store IVF search == batch answer over the union
# ---------------------------------------------------------------------------


def q_stream_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector ingest across four epochs that jointly cover the whole
    embeddings table, then a FULL RE-DELIVERY epoch whose every id the
    seen-id anti-join must reject; compaction lands mid-sequence. The
    final top-k off the live store must equal the batch IVF answer over
    all embeddings (ORACLE_ANN_IVF_TOPK verbatim)."""
    from realtime_spark.operators.similarity import ivf_topk_from_index
    from realtime_spark.streaming.compaction import compact_vector_state
    from realtime_spark.streaming.vector_ingest import (
        process_vector_batch,
        searchable_index,
        seed_vector_state,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = e.filter(F.expr(_IVF_CENT_PRED))
    corpus = e.filter("vec_id % 4 = 0")
    parts = [e.filter(f"vec_id % 4 = {i}") for i in (1, 2, 3)]

    root = _fresh_root(sf_dir, "ivf")
    seed_vector_state(corpus, cents, root)
    process_vector_batch(parts[0], 0, root)
    process_vector_batch(parts[1], 1, root)
    compact_vector_state(spark, root)
    process_vector_batch(parts[2], 2, root)
    # re-deliver epoch 0's vectors under their ORIGINAL ids: every row must
    # be rejected by the id anti-join against the (compacted) index
    process_vector_batch(parts[0], 3, root)

    queries = e.filter(F.expr(_ANN_QUERY_PRED))
    return ivf_topk_from_index(
        searchable_index(spark, root), queries, cents, k=_ANN_K, nprobe=_IVF_NPROBE
    )


def q_stream_vector_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8: the scheduled-compaction poll loop driving the VECTOR store
    under the driver gate — the q_stream_ivf_topk arrival sequence (three
    covering epochs plus a full re-delivery every id of which the
    anti-join must reject) as real availableNow drain cycles off a file
    source, with compact_vector_state as the threshold janitor
    (max_epochs=2: fires after the second drain, epochs 2-3 land in the
    auto-compacted store). Search off the live store must equal the batch
    IVF answer over all embeddings — the identical oracle."""
    import tempfile

    from realtime_spark.operators.similarity import ivf_topk_from_index
    from realtime_spark.streaming.compaction import (
        VECTOR_SUBSTORES,
        compact_vector_state,
        run_ingest_cycles,
    )
    from realtime_spark.streaming.vector_ingest import (
        run_vector_ingest_stream,
        searchable_index,
        seed_vector_state,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = e.filter(F.expr(_IVF_CENT_PRED))
    corpus = e.filter("vec_id % 4 = 0")
    parts = [e.filter(f"vec_id % 4 = {i}") for i in (1, 2, 3)]

    root = _fresh_root(sf_dir, "vecloop")
    seed_vector_state(corpus, cents, root)
    src = tempfile.mkdtemp(prefix="rs_vecloop_src_")
    ckpt = f"{root}/_ckpt"
    arrivals = iter([parts[0], parts[1], parts[2], parts[0]])

    def start_stream():
        batch = next(arrivals)
        # parallel write (r10): see the ingest loop note above
        batch.write.parquet(f"{src}/f{len(os.listdir(src))}")
        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return run_vector_ingest_stream(stream, root, ckpt)

    try:
        telemetry = run_ingest_cycles(
            spark, root, start_stream, compact_vector_state,
            VECTOR_SUBSTORES, cycles=4, max_epochs=2,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
    if [t["compacted"] for t in telemetry] != [False, True, False, True]:
        raise AssertionError(f"compaction trigger misfired: {telemetry}")

    queries = e.filter(F.expr(_ANN_QUERY_PRED))
    return ivf_topk_from_index(
        searchable_index(spark, root), queries, cents, k=_ANN_K, nprobe=_IVF_NPROBE
    )


# ---------------------------------------------------------------------------
# search ingest: folded-partial BM25 == batch answer over the union
# ---------------------------------------------------------------------------


def q_stream_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search ingest across epochs that jointly index the whole documents
    table, compaction mid-sequence (stat partials summed into one base
    row), one epoch landing after it. BM25 served off the live store must
    hash-match the batch ORACLE_SEARCH_BM25 over all documents."""
    from realtime_spark.streaming.compaction import compact_search_state
    from realtime_spark.streaming.search_ingest import (
        bm25_topk_from_live_index,
        process_search_batch,
        seed_search_state,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = _fresh_root(sf_dir, "bm25")
    seed_search_state(d.filter("doc_id % 4 = 0"), root)
    process_search_batch(d.filter("doc_id % 4 = 1"), 0, root)
    process_search_batch(d.filter("doc_id % 4 = 2"), 1, root)
    compact_search_state(spark, root)
    process_search_batch(d.filter("doc_id % 4 = 3"), 2, root)
    return bm25_topk_from_live_index(spark, root, list(_BM25_TERMS), k=_BM25_K)


def q_stream_search_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9: the scheduled-compaction poll loop driving the SEARCH store —
    the last store whose loop was pytest-only, and the one with the
    documented torn-epoch window (streaming/search_ingest.py:17-26: the
    three per-epoch writes — postings, doclen, stats — are not mutually
    atomic), so the janitor firing BETWEEN drain cycles against those
    tri-part epochs is its most interesting window (r8 verdict ask #6).

    The q_stream_bm25_topk arrival sequence (three quarters that jointly
    index the whole documents table) plus a FULL RE-DELIVERY of the first
    quarter — every id of which the doclen anti-join must reject, or the
    duplicated doclen rows fan out the score join and the summed stat
    partials skew every BM25 score — as real availableNow drain cycles off
    a file source, with compact_search_state as the threshold janitor
    (max_epochs=2: fires after the second and fourth drains, so epochs 2-3
    land in a compacted store whose stat partials were already folded into
    one base row). BM25 off the live store must hash-match the batch
    ORACLE_SEARCH_BM25 over all documents — the identical oracle."""
    import tempfile

    from realtime_spark.streaming.compaction import (
        SEARCH_SUBSTORES,
        compact_search_state,
        run_ingest_cycles,
    )
    from realtime_spark.streaming.search_ingest import (
        bm25_topk_from_live_index,
        run_search_ingest_stream,
        seed_search_state,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = _fresh_root(sf_dir, "searchloop")
    seed_search_state(d.filter("doc_id % 4 = 0"), root)
    src = tempfile.mkdtemp(prefix="rs_searchloop_src_")
    ckpt = f"{root}/_ckpt"
    arrivals = iter([
        d.filter("doc_id % 4 = 1"),
        d.filter("doc_id % 4 = 2"),
        d.filter("doc_id % 4 = 3"),
        d.filter("doc_id % 4 = 1"),  # full re-delivery under original ids
    ])

    def start_stream():
        batch = next(arrivals)
        # parallel write (r10): see the ingest loop note above
        batch.write.parquet(f"{src}/f{len(os.listdir(src))}")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return run_search_ingest_stream(stream, root, ckpt)

    try:
        telemetry = run_ingest_cycles(
            spark, root, start_stream, compact_search_state,
            SEARCH_SUBSTORES, cycles=4, max_epochs=2,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
    if [t["compacted"] for t in telemetry] != [False, True, False, True]:
        raise AssertionError(f"compaction trigger misfired: {telemetry}")
    return bm25_topk_from_live_index(spark, root, list(_BM25_TERMS), k=_BM25_K)


def stream_stores_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stream_ingest_accepted": q_stream_ingest_accepted,
        "stream_compaction_loop": q_stream_compaction_loop,
        "stream_ivf_topk": q_stream_ivf_topk,
        "stream_vector_loop": q_stream_vector_loop,
        "stream_bm25_topk": q_stream_bm25_topk,
        "stream_search_loop": q_stream_search_loop,
    }


def stream_stores_oracles() -> dict[str, str]:
    return {
        "stream_ingest_accepted": ORACLE_STREAM_INGEST_ACCEPTED,
        # the loop runs the identical arrival sequence through the
        # scheduled-compaction poll loop — the accepted set is the same
        "stream_compaction_loop": ORACLE_STREAM_INGEST_ACCEPTED,
        "stream_ivf_topk": ORACLE_ANN_IVF_TOPK,
        # the loop runs the identical arrival sequence (epochs + full
        # re-delivery) through the poll loop — same batch IVF answer
        "stream_vector_loop": ORACLE_ANN_IVF_TOPK,
        "stream_bm25_topk": ORACLE_SEARCH_BM25,
        # the loop runs the bm25 arrival sequence (quarters + full
        # re-delivery) through the poll loop — same batch BM25 answer
        "stream_search_loop": ORACLE_SEARCH_BM25,
    }
