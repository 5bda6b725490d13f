"""Streaming corpus ingest (streaming/ingest.py): arrival-order dedup with
cross-batch state, exactly-once via per-epoch deterministic overwrite.

Closed-form fixture: every batch doc is constructed so its fate is known —
exact copies of the corpus and of earlier-accepted docs must be rejected by
the digest store, tail-appended near-dups by the LSH index (of the corpus
AND of earlier accepted batches), and genuinely fresh docs must survive.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_spark.sources.testdata import load_table
from realtime_spark.streaming.ingest import (
    accepted_docs,
    process_ingest_batch,
    run_ingest_stream,
    seed_ingest_state,
)

SF = "/root/testdata/sf0.001"
NEAR_TAIL = " near dup tail marker"


@pytest.fixture(scope="module")
def spark():
    from realtime_spark.session import get_spark

    return get_spark("test_streaming_ingest", cpus=4)


def _corpus(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 30)
    )


def _batches(spark):
    """Three batches with closed-form fates (i ranges over corpus ids).
    'Fresh' docs are token-transformed CORPUS texts — long enough that the
    near-dup tail keeps nearly all shingles (the same construction the
    dedup fixtures prove produces LSH band collisions); short synthetic
    strings would not reliably collide in any band."""
    from realtime_spark.operators.dedup import tokens_expr

    c = _corpus(spark)
    toks = tokens_expr(F.col("text"))
    # reversed-token corpus docs: long, genuinely new content
    fresh0 = c.select(
        (F.col("doc_id") + 3000).alias("doc_id"),
        F.array_join(F.reverse(toks), " ").alias("text"),
    )
    # every-token-suffixed corpus docs: new vs corpus AND vs fresh0
    fresh1 = c.select(
        (F.col("doc_id") + 6000).alias("doc_id"),
        F.array_join(F.transform(toks, lambda t: F.concat(t, F.lit("x"))), " ")
        .alias("text"),
    )
    b0 = (
        c.select((F.col("doc_id") + 1000).alias("doc_id"), "text")  # exact dup
        .unionByName(
            c.select(
                (F.col("doc_id") + 2000).alias("doc_id"),
                F.concat("text", F.lit(NEAR_TAIL)).alias("text"),  # near dup
            )
        )
        .unionByName(fresh0)  # accepted
    )
    b1 = (
        fresh0.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
        # ^ exact dup of batch-0 ACCEPTED docs -> digest store must have grown
        .unionByName(
            fresh0.select(
                (F.col("doc_id") + 2000).alias("doc_id"),
                F.concat("text", F.lit(NEAR_TAIL)).alias("text"),
                # ^ near dup of batch-0 accepted -> LSH index must have grown
            )
        )
        .unionByName(fresh1)  # accepted
    )
    b2 = c.limit(1).select(
        F.lit(8000).alias("doc_id"),
        F.lit("fresh two content row eta theta iota 8000").alias("text"),
    )
    return b0, b1, b2


def _expected_fold(spark, batches):
    """Sequential BATCH fold over the same operators — the oracle for the
    streaming run (LSH recall is deliberately <100%, so survivor sets are
    not closed-form; what the streaming layer must get right is the state
    threading: each batch dedups against corpus + every EARLIER batch's
    survivors, exactly once, across restarts)."""
    from realtime_spark.operators.dedup import (
        dedup_incremental,
        lsh_candidates_against_index,
        minhash_bands,
    )

    corpus = _corpus(spark)
    digests = corpus.select(F.md5("text").alias("digest")).distinct()
    index = minhash_bands(corpus, "doc_id", "text")
    accepted: set[int] = set()
    for b in batches:
        fresh = dedup_incremental(b, digests, "doc_id", "text").localCheckpoint()
        near = (
            lsh_candidates_against_index(fresh, index)
            .select(F.col("new_doc").alias("doc_id"))
            .distinct()
        )
        kept = fresh.join(near, "doc_id", "left_anti").localCheckpoint()
        accepted |= {r["doc_id"] for r in kept.select("doc_id").collect()}
        digests = digests.unionByName(
            kept.select(F.md5("text").alias("digest"))
        ).distinct().localCheckpoint()
        index = index.unionByName(
            minhash_bands(kept, "doc_id", "text")
        ).localCheckpoint()
    return accepted


def test_streaming_ingest_end_to_end(spark, tmp_path):
    root = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    os.makedirs(src)

    seed_ingest_state(_corpus(spark), root)
    b0, b1, b2 = _batches(spark)

    # two files first: the stream processes them as two micro-batches
    b0.coalesce(1).write.parquet(f"{src}/f0")
    b1.coalesce(1).write.parquet(f"{src}/f1")
    schema = "doc_id bigint, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = run_ingest_stream(stream, root, ckpt)
    q.awaitTermination(300)

    got = {r["doc_id"] for r in accepted_docs(spark, root).collect()}
    want01 = _expected_fold(spark, [b0, b1])
    # sanity on the fold itself: all reversed/suffixed docs survive, no
    # exact dup survives, and near-dup rejection actually fired
    ids = {r["doc_id"] for r in _corpus(spark).collect()}
    assert {i + 3000 for i in ids} <= want01 and {i + 6000 for i in ids} <= want01
    assert not ({i + 1000 for i in ids} & want01)
    assert len({i + 2000 for i in ids} & want01) < len(ids) // 2
    assert got == want01

    # late-arriving third batch: SAME checkpoint continues the epochs
    b2.coalesce(1).write.parquet(f"{src}/f2")
    q = run_ingest_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
    )
    q.awaitTermination(300)
    got = {r["doc_id"] for r in accepted_docs(spark, root).collect()}
    assert got == _expected_fold(spark, [b0, b1, b2])

    # restart with nothing new: a no-op, nothing double-ingested
    q = run_ingest_stream(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
    )
    q.awaitTermination(300)
    got2 = {r["doc_id"] for r in accepted_docs(spark, root).collect()}
    assert got2 == got

    # crash-replay idempotency: re-executing the LAST epoch with the same id
    # and batch content (what the checkpoint does after a mid-epoch crash —
    # its own partial output may exist, later epochs cannot) rewrites
    # identical state instead of appending duplicates or self-deduping
    before = sorted(r["doc_id"] for r in accepted_docs(spark, root).collect())
    dig_before = spark.read.parquet(f"{root}/digests").count()
    process_ingest_batch(b2, 2, root)
    after = sorted(r["doc_id"] for r in accepted_docs(spark, root).collect())
    assert after == before
    assert spark.read.parquet(f"{root}/digests").count() == dig_before

    # the stores the NEXT batch would consult are exactly corpus + accepted
    dig = spark.read.parquet(f"{root}/digests")
    corpus_and_accepted = (
        _corpus(spark)
        .select("text")
        .unionByName(accepted_docs(spark, root).select("text"))
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    assert dig.select("digest").distinct().count() == corpus_and_accepted.count()


def test_streaming_ingest_gate(spark, tmp_path):
    """The admission gate runs before any state is consulted or written."""
    root = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    os.makedirs(src)

    seed_ingest_state(_corpus(spark), root)
    batch = spark.createDataFrame(
        [(9001, "short"), (9002, "long enough fresh content kappa lambda mu nu xi")],
        "doc_id bigint, text string",
    )
    batch.coalesce(1).write.parquet(f"{src}/f0")

    def gate(df):
        return df.filter(F.length("text") > 20)

    q = run_ingest_stream(
        spark.readStream.schema("doc_id bigint, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
        gate=gate,
    )
    q.awaitTermination(300)
    got = {r["doc_id"] for r in accepted_docs(spark, root).collect()}
    assert got == {9002}
