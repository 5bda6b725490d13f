"""Streaming search-index ingest (streaming/search_ingest.py): BM25 served
off the growing per-epoch store must be BIT-IDENTICAL to bm25_topk over the
union of every ingested document — the operator pair whose agreement is
independently DuckDB-oracled (search_bm25 / search_bm25_index)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_spark.operators.search import bm25_topk
from realtime_spark.sources.testdata import load_table
from realtime_spark.streaming.search_ingest import (
    bm25_topk_from_live_index,
    process_search_batch,
    run_search_ingest_stream,
    seed_search_state,
)

SF = "/root/testdata/sf0.001"
TERMS = ("spark", "window", "merge")


@pytest.fixture(scope="module")
def spark():
    from realtime_spark.session import get_spark

    return get_spark("test_streaming_search_ingest", cpus=4)


def _parts(spark):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 3 == 0)
    b0 = d.filter(F.col("doc_id") % 3 == 1)
    b1 = d.filter(F.col("doc_id") % 3 == 2)
    return corpus, b0, b1


def _rows(df):
    return sorted(
        (r["doc"], r["score"], r["n_terms_matched"], r["rank"])
        for r in df.collect()
    )


def test_search_ingest_scores_match_batch_rebuild(spark, tmp_path):
    root = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    os.makedirs(src)

    corpus, b0, b1 = _parts(spark)
    seed_search_state(corpus, root)
    b0.coalesce(1).write.parquet(f"{src}/f0")
    b1.coalesce(1).write.parquet(f"{src}/f1")

    q = run_search_ingest_stream(
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
    )
    q.awaitTermination(300)

    # global BM25 terms (df_t, N, avgdl) shift with every epoch: the live
    # index must score exactly like a batch run over corpus ∪ b0 ∪ b1
    live = _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20))
    full = corpus.unionByName(b0).unionByName(b1)
    want = _rows(bm25_topk(full, "doc_id", "text", TERMS, k=20))
    assert live == want and live

    # crash-replay idempotency: re-running the last epoch rewrites identical
    # bytes; scores unchanged
    process_search_batch(b1, 1, root)
    assert _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20)) == want

    # restart with nothing new: a no-op
    q = run_search_ingest_stream(
        spark.readStream.schema("doc_id bigint, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
    )
    q.awaitTermination(300)
    assert _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20)) == want


def test_chained_corpus_ingest_feeds_search_ingest(spark, tmp_path):
    """Multi-hop streaming: the corpus-ingest ACCEPTED sink is the search
    ingest's file source — dedup admission upstream, index maintenance
    downstream, searchable state bit-identical to a batch rebuild over
    corpus ∪ accepted."""
    from realtime_spark.streaming.ingest import (
        accepted_docs,
        run_ingest_stream,
        seed_ingest_state,
    )

    corpus, b0, b1 = _parts(spark)
    croot = str(tmp_path / "corpus")
    iroot = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    os.makedirs(src)

    # hop 1: dedup admission (b1 includes exact dups of corpus + b0 docs)
    seed_ingest_state(corpus, croot)
    b0.coalesce(1).write.parquet(f"{src}/f0")
    b1.unionByName(corpus.limit(5)).unionByName(b0.limit(5)).coalesce(1).write.parquet(
        f"{src}/f1"
    )
    q = run_ingest_stream(
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        croot,
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(300)

    # hop 2: index maintenance over the accepted sink's files
    seed_search_state(corpus, iroot)
    q = run_search_ingest_stream(
        spark.readStream.schema("doc_id bigint, text string")
        .option("recursiveFileLookup", "true")
        .parquet(f"{croot}/accepted"),
        iroot,
        str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(300)

    live = _rows(bm25_topk_from_live_index(spark, iroot, TERMS, k=20))
    full = corpus.unionByName(
        accepted_docs(spark, croot).select("doc_id", "text")
    )
    want = _rows(bm25_topk(full, "doc_id", "text", TERMS, k=20))
    assert live == want and live
    # and the dup injections really were stopped upstream
    acc = {r["doc_id"] for r in accepted_docs(spark, croot).collect()}
    corpus_ids = {r["doc_id"] for r in corpus.limit(5).collect()}
    assert not (acc & corpus_ids)


def test_search_ingest_seed_only_matches_corpus_scan(spark, tmp_path):
    """Before any batch arrives the live index is just the seeded corpus."""
    root = str(tmp_path / "idx")
    corpus, _, _ = _parts(spark)
    seed_search_state(corpus, root)
    live = _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20))
    want = _rows(bm25_topk(corpus, "doc_id", "text", TERMS, k=20))
    assert live == want and live


def test_search_ingest_redelivered_ids_not_double_counted(spark, tmp_path):
    """A batch containing already-indexed doc ids (seeding overlap or a
    re-seeded source) must not index them again: duplicate doclen rows fan
    out the score join and doubled stat partials skew every document's
    BM25 (r6 review finding, twin of the vector-ingest re-delivery bug)."""
    from realtime_spark.streaming.search_ingest import process_search_batch

    root = str(tmp_path / "idx")
    corpus, b0, _ = _parts(spark)
    seed_search_state(corpus, root)
    process_search_batch(b0, 0, root)
    want = _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20))
    n_doclen = spark.read.parquet(f"{root}/doclen").count()

    # re-deliver the seed corpus AND batch 0 under a NEW epoch
    process_search_batch(corpus.unionByName(b0), 1, root)
    assert spark.read.parquet(f"{root}/doclen").count() == n_doclen
    assert _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20)) == want

    # crash-replay of the same epoch is still byte-identical (own-epoch
    # exclusion composes with the seen-id scan)
    process_search_batch(corpus.unionByName(b0), 1, root)
    assert spark.read.parquet(f"{root}/doclen").count() == n_doclen
    assert _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20)) == want


def test_search_ingest_within_batch_duplicate_ids(spark, tmp_path):
    """r7 review find: duplicate doc ids INSIDE one micro-batch passed the
    prior-epoch anti-join with every copy — doubled doclen rows fanned out
    the score join and the stat partials counted the doc twice. One row
    per id survives, picked deterministically (content hash) so a
    crash-replay rewrites identical bytes."""
    from pyspark.sql import functions as F

    from realtime_spark.streaming.search_ingest import process_search_batch

    root = str(tmp_path / "idx")
    corpus, b0, _ = _parts(spark)
    seed_search_state(corpus, root)
    # every b0 id twice: verbatim + a mutated revision in the same batch
    batch = b0.unionByName(
        b0.select("doc_id", F.concat("text", F.lit(" extra tail")).alias("text"))
    )
    process_search_batch(batch, 0, root)

    doclen = spark.read.parquet(f"{root}/doclen")
    assert doclen.groupBy("doc").count().filter("count > 1").count() == 0
    n_docs = (
        spark.read.parquet(f"{root}/stats")
        .agg(F.sum("n_docs").alias("n"))
        .collect()[0]["n"]
    )
    assert n_docs == corpus.count() + b0.count()

    want = _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20))
    # crash-replay: the deterministic winner set rewrites identical state
    process_search_batch(batch, 0, root)
    assert _rows(bm25_topk_from_live_index(spark, root, TERMS, k=20)) == want
