"""Persisted IVF index: build/read roundtrip, result parity with the direct
ivf_topk plan, and partition pruning down to the probed centroid buckets."""

from __future__ import annotations

import io
import tempfile
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from realtime_spark.operators.similarity import (
    ivf_topk,
    ivf_topk_from_index,
    read_ivf_index,
    write_ivf_index,
)
from realtime_spark.sources.testdata import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _result_set(df):
    return {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"]) for r in df.collect()
    }


def test_index_search_matches_direct(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter("vec_id < 8")
    cents = e.filter("vec_id % 100 = 0")
    direct = _result_set(ivf_topk(e, q, cents, k=5, nprobe=2))
    with tempfile.TemporaryDirectory() as d:
        write_ivf_index(e, cents, d)
        idx = read_ivf_index(spark, d)
        from_index = ivf_topk_from_index(idx, q, cents, k=5, nprobe=2)
        assert _result_set(from_index) == direct
        assert len(direct) > 0


def test_index_scan_prunes_to_probed_buckets(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter("vec_id < 8")
    cents = e.filter("vec_id % 100 = 0")
    with tempfile.TemporaryDirectory() as d:
        write_ivf_index(e, cents, d)
        idx = read_ivf_index(spark, d)
        out = ivf_topk_from_index(idx, q, cents, k=5, nprobe=1)
        p = _plan(out)
        seg = p.split("PartitionFilters", 1)
        assert len(seg) == 2, f"no partition pruning on index scan:\n{p}"
        assert "centroid_id" in seg[1][:400]


def test_index_layout_is_per_centroid(spark):
    import os

    e = load_table(spark, SF_DIR, "embeddings")
    cents = e.filter("vec_id % 100 = 0")
    n_cents = cents.count()
    with tempfile.TemporaryDirectory() as d:
        write_ivf_index(e, cents, d)
        parts = [x for x in os.listdir(d) if x.startswith("centroid_id=")]
        assert 0 < len(parts) <= n_cents
        # every corpus vector appears in exactly one bucket
        assert read_ivf_index(spark, d).count() == e.count()
        assert (
            read_ivf_index(spark, d).select("vec_id").distinct().count() == e.count()
        )


class TestIncrementalAppend:
    def test_appended_vectors_are_searchable(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from realtime_spark.operators.similarity import (
            append_to_ivf_index,
            ivf_topk_from_index,
            read_ivf_index,
            write_ivf_index,
        )
        from realtime_spark.sources.testdata import load_table
        from tests.conftest import SF_DIR

        path = str(tmp_path / "ivf")
        e = load_table(spark, SF_DIR, "embeddings")
        cents = e.filter("vec_id % 100 = 0")
        base = e.filter("vec_id % 2 = 0")
        incr = e.filter("vec_id % 2 = 1")
        write_ivf_index(base, cents, path)
        n_base = read_ivf_index(spark, path).count()
        append_to_ivf_index(incr, cents, path)
        idx = read_ivf_index(spark, path)
        assert idx.count() == e.count() and n_base < e.count()

        # a query must now retrieve odd (appended) neighbors too
        q = e.filter("vec_id < 2")
        got = ivf_topk_from_index(idx, q, cents, k=10, nprobe=2)
        neighbors = {r["neighbor_id"] for r in got.collect()}
        assert any(n % 2 == 1 for n in neighbors), neighbors


class TestLshIndex:
    """Persisted MinHash-LSH index: build, probe, incremental append."""

    def test_probe_matches_direct(self, spark, sf_dir, tmp_path):
        from realtime_spark.operators.dedup import (
            lsh_candidates_against_index,
            minhash_bands,
            write_lsh_index,
        )
        from realtime_spark.plans.training import docs_with_dups

        d = docs_with_dups(spark, sf_dir)
        corpus = d.filter("doc_id < 1000000")
        batch = d.filter("doc_id >= 1000000")
        path = str(tmp_path / "lsh")
        write_lsh_index(corpus, path)
        got = {
            (r["new_doc"], r["corpus_doc"])
            for r in lsh_candidates_against_index(
                batch, spark.read.parquet(path)
            ).collect()
        }
        # direct (no index) computation over the union gives the same pairs
        cb = minhash_bands(corpus, "doc_id", "text").withColumnRenamed("doc", "cdoc")
        bb = minhash_bands(batch, "doc_id", "text").withColumnRenamed("doc", "ndoc")
        want = {
            (r["ndoc"], r["cdoc"])
            for r in bb.join(cb, ["band", "key"]).select("ndoc", "cdoc").distinct().collect()
        }
        assert got == want
        assert got  # the injected duplicates must actually collide

    def test_append_then_probe_sees_new_docs(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from realtime_spark.operators.dedup import (
            append_to_lsh_index,
            lsh_candidates_against_index,
            write_lsh_index,
        )
        from realtime_spark.plans.training import docs_with_dups

        d = docs_with_dups(spark, sf_dir)
        corpus = d.filter("doc_id < 1000000")
        day1 = d.filter("doc_id >= 1000000 AND doc_id < 2000000")  # exact dups
        # day2: a fresh third copy of the same texts -> must collide with BOTH
        # the original corpus rows and the day-1 appended rows
        day2 = day1.select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
        path = str(tmp_path / "lsh")
        write_lsh_index(corpus, path)
        append_to_lsh_index(day1, path)
        hits = lsh_candidates_against_index(day2, spark.read.parquet(path))
        partners = {
            r[0]
            for r in hits.select(
                (F.col("corpus_doc") >= 1000000).alias("from_day1")
            ).distinct().collect()
        }
        assert partners == {True, False}


class TestPq:
    """Product quantization: code compactness and ADC recall vs exact."""

    def test_codes_and_recall(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from realtime_spark.operators.similarity import (
            brute_force_topk,
            pq_adc_topk,
            pq_codebook,
            pq_encode,
        )
        from realtime_spark.sources.testdata import load_table

        e = load_table(spark, sf_dir, "embeddings")
        cents = e.filter("vec_id % 100 = 0")
        q = e.filter("vec_id < 8")
        cb = pq_codebook(cents, m=4)
        codes = pq_encode(e, cb)
        # every vector encodes to m codes drawn from the centroid id set
        row = codes.first()
        assert len(row["codes"]) == 4
        cid_set = {r[0] for r in cents.select("vec_id").collect()}
        assert set(row["codes"]) <= cid_set
        # ADC top-10 must overlap exact cosine top-10 for most queries
        # (loose bound: PQ with a tiny codebook is coarse, but cannot be
        # uncorrelated with true similarity)
        pq10 = pq_adc_topk(codes, q, cb, k=10)
        ex10 = brute_force_topk(e, q, k=10)
        j = (
            pq10.select("query_id", "neighbor_id")
            .join(ex10.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        hits = {r["query_id"]: r["hits"] for r in j.collect()}
        # chance overlap of two random top-10 sets over n vectors is
        # 100/n per query (~1 total here); require clearly above chance
        n_q = q.count()
        n_vec = e.count()
        chance = n_q * 100.0 / n_vec
        assert sum(hits.values()) >= max(3.0 * chance, 0.1 * n_q)


def test_query_collect_cap_raises_cleanly(spark, monkeypatch):
    """Past-cap query sets fail fast with an actionable error instead of
    collecting an unbounded probe/ADC table onto the driver."""
    import pytest

    import realtime_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "QUERY_COLLECT_MAX", 5)
    big = spark.range(10).selectExpr(
        "id AS vec_id", "array(double(id), 1.0d, 2.0d, 3.0d) AS embedding"
    )
    with pytest.raises(ValueError, match="QUERY_COLLECT_MAX"):
        sim._collect_bounded(big.select("vec_id", "embedding"), "test op")
    # within the cap passes through unchanged
    ok = sim._collect_bounded(big.limit(3).select("vec_id", "embedding"), "t")
    assert len(ok) == 3


def test_semantic_decontaminate_flags_near_eval_vectors(spark):
    """semantic_decontaminate semantic pin: a training vector cosine-near an
    eval vector IN ITS CLUSTER is flagged; a near-identical pair split
    across clusters is NOT (the documented IVF confinement trade-off); a
    cluster without eval vectors yields NULL max_eval_cos and no flag."""
    from pyspark.sql import functions as F

    from realtime_spark.operators.similarity import semantic_decontaminate

    # two well-separated clusters on axes x and y
    cents = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    train = spark.createDataFrame(
        [
            (1, [0.99, 0.02, 0.0]),   # cluster x, near eval 50 -> flagged
            (2, [0.90, 0.40, 0.0]),   # cluster x, far from eval 50 -> clean
            (3, [0.02, 0.98, 0.0]),   # cluster y, NO eval there -> NULL/clean
        ],
        "vec_id long, embedding array<float>",
    )
    eval_df = spark.createDataFrame(
        [(50, [0.995, 0.01, 0.0])], "vec_id long, embedding array<float>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            train, eval_df, cents, threshold=0.99
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["max_eval_cos"] >= 0.99
    assert not out[2]["contaminated"] and out[2]["max_eval_cos"] is not None
    assert not out[3]["contaminated"] and out[3]["max_eval_cos"] is None
    assert {r["centroid_id"] for r in out.values()} == {100, 200}
