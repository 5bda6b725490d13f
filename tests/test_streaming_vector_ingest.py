"""Streaming vector ingest (streaming/vector_ingest.py): continuous IVF
maintenance with bucket-confined semantic dedup, exactly-once per-epoch
overwrite, and search served straight off the growing store.

The decisive assertion is search equivalence: after the stream drains, a
query answered from the on-disk index must equal ivf_topk over the
materialized corpus ∪ accepted set — the operator pair whose agreement is
independently oracle-checked (ann_ivf_topk / ann_ivf_index share one
DuckDB oracle)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_spark.operators.similarity import ivf_topk, ivf_topk_from_index
from realtime_spark.sources.testdata import load_table
from realtime_spark.streaming.vector_ingest import (
    process_vector_batch,
    run_vector_ingest_stream,
    searchable_index,
    seed_vector_state,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from realtime_spark.session import get_spark

    return get_spark("test_streaming_vector_ingest", cpus=4)


def _parts(spark):
    e = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 2 == 0)
    cents = e.filter(F.col("vec_id") % 50 == 0)
    b0 = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 100))
    # batch 1: fresh odd vectors PLUS exact copies of batch-0 vectors
    # (re-keyed +10000) — the copies must be rejected by the bucket dedup
    # AGAINST BATCH 0'S SURVIVORS, proving the index grew
    b1 = (
        e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") >= 100))
        .unionByName(
            b0.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
        )
    )
    return corpus, cents, b0, b1


def test_vector_ingest_end_to_end(spark, tmp_path):
    root = str(tmp_path / "vstore")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    os.makedirs(src)

    corpus, cents, b0, b1 = _parts(spark)
    seed_vector_state(corpus, cents, root)
    b0.coalesce(1).write.parquet(f"{src}/f0")
    b1.coalesce(1).write.parquet(f"{src}/f1")

    schema = "vec_id bigint, embedding array<float>"
    q = run_vector_ingest_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
        dedup_threshold=0.999999,
    )
    q.awaitTermination(300)

    accepted = {
        r["vec_id"]
        for r in spark.read.parquet(f"{root}/accepted").select("vec_id").collect()
    }
    b0_ids = {r["vec_id"] for r in b0.select("vec_id").collect()}
    # every batch-0 vector is novel vs the (even-id) corpus -> accepted
    assert b0_ids <= accepted
    # batch-1 re-keyed copies of batch-0 vectors: cosine 1.0 to an indexed
    # member of their own bucket -> every one rejected
    assert not accepted & {i + 10000 for i in b0_ids}

    # search equivalence: the on-disk index answers exactly like ivf_topk
    # over corpus ∪ accepted (the independently-oracled operator pair)
    e = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    queries = e.filter(F.col("vec_id") < 8)
    live = corpus.unionByName(
        e.join(
            spark.read.parquet(f"{root}/accepted").select("vec_id"), "vec_id"
        )
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(live, queries, cents, k=5, nprobe=2).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk_from_index(
            searchable_index(spark, root), queries, cents, k=5, nprobe=2
        ).collect()
    }
    assert got == want and got

    # crash-replay idempotency of the LAST epoch
    before = sorted(spark.read.parquet(f"{root}/accepted").collect())
    process_vector_batch(b1, 1, root, dedup_threshold=0.999999)
    after = sorted(spark.read.parquet(f"{root}/accepted").collect())
    assert after == before

    # restart with nothing new: a no-op
    q = run_vector_ingest_stream(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
        dedup_threshold=0.999999,
    )
    q.awaitTermination(300)
    assert sorted(spark.read.parquet(f"{root}/accepted").collect()) == before


def test_vector_ingest_redelivered_id_not_duplicated(spark, tmp_path):
    """A batch row whose vec_id is already indexed (seeding overlap or a
    re-seeded source) must not be appended again — regression for the r5
    id-inequality guard that exempted the cosine-1.0 self-match (ADVICE r5).
    Covers both the dedup and the no-dedup path (the latter previously had
    no protection at all)."""
    corpus, cents, b0, _ = _parts(spark)
    overlap = corpus.filter(F.col("vec_id") < 40)
    assert overlap.count() > 0
    batch = b0.unionByName(overlap)
    b0_ids = {r["vec_id"] for r in b0.select("vec_id").collect()}

    for thresh in (0.999999, None):
        root = str(tmp_path / f"vstore_{thresh}")
        seed_vector_state(corpus, cents, root)
        process_vector_batch(batch, 0, root, dedup_threshold=thresh)
        dup_ids = (
            spark.read.parquet(f"{root}/ivf")
            .groupBy("vec_id")
            .count()
            .filter("count > 1")
            .count()
        )
        assert dup_ids == 0
        accepted = {
            r["vec_id"]
            for r in spark.read.parquet(f"{root}/accepted").collect()
        }
        # fresh rows still land; the re-delivered ids are not re-accepted
        assert accepted == b0_ids


def test_vector_ingest_within_batch_duplicate_ids(spark, tmp_path):
    """r7 review find: duplicate vec_ids INSIDE one micro-batch passed the
    prior-epoch anti-join with every copy and double-indexed. One row per
    id survives, picked deterministically (content hash) so a crash-replay
    rewrites identical bytes."""
    corpus, cents, b0, _ = _parts(spark)
    # same ids twice: once verbatim, once with a shifted embedding — a
    # genuinely ambiguous duplicate the pick must resolve deterministically
    batch = b0.unionByName(
        b0.select("vec_id", F.transform("embedding", lambda x: x + 1).alias("embedding"))
    )
    b0_ids = {r["vec_id"] for r in b0.select("vec_id").collect()}

    for thresh in (0.999999, None):
        root = str(tmp_path / f"vstore_{thresh}")
        seed_vector_state(corpus, cents, root)
        process_vector_batch(batch, 0, root, dedup_threshold=thresh)
        idx = spark.read.parquet(f"{root}/ivf")
        assert idx.groupBy("vec_id").count().filter("count > 1").count() == 0
        accepted = {
            r["vec_id"] for r in spark.read.parquet(f"{root}/accepted").collect()
        }
        assert accepted == b0_ids
        picked = sorted(
            (r["vec_id"], tuple(r["embedding"]))
            for r in idx.filter(F.col("ingest_epoch") == "e0")
            .select("vec_id", "embedding")
            .collect()
        )
        # crash-replay of the same epoch: byte-identical winner set
        process_vector_batch(batch, 0, root, dedup_threshold=thresh)
        again = sorted(
            (r["vec_id"], tuple(r["embedding"]))
            for r in spark.read.parquet(f"{root}/ivf")
            .filter(F.col("ingest_epoch") == "e0")
            .select("vec_id", "embedding")
            .collect()
        )
        assert again == picked


def test_vector_ingest_no_dedup(spark, tmp_path):
    """threshold=None: pure index maintenance, everything indexed."""
    root = str(tmp_path / "vstore")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    os.makedirs(src)

    corpus, cents, b0, _ = _parts(spark)
    seed_vector_state(corpus, cents, root)
    dup = b0.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    b0.unionByName(dup).coalesce(1).write.parquet(f"{src}/f0")

    q = run_vector_ingest_stream(
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        root,
        ckpt,
    )
    q.awaitTermination(300)
    n_b0 = b0.count()
    assert spark.read.parquet(f"{root}/accepted").count() == 2 * n_b0
