"""Bucket-digest corpus diff: the pruning claim behind the oracle-checked
row-level result — few changed rows must light up few buckets, and
identical corpora must produce an EMPTY changed-bucket set (the anti-entropy
no-op: nothing beyond the digest rows ever crosses the wire)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_spark.operators.syncdiff import changed_buckets, corpus_changed_docs
from realtime_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"
BUCKETS = 256


def _corpora(spark):
    a = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # touch exactly 3 docs
    b = a.select(
        "doc_id",
        F.when(F.col("doc_id").isin(7, 97, 211), F.concat("text", F.lit(" x")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return a, b


class TestSyncDiff:
    def test_identical_corpora_no_buckets(self, spark):
        a, _ = _corpora(spark)
        assert changed_buckets(a, a, "doc_id", "text", BUCKETS).count() == 0
        assert corpus_changed_docs(a, a, "doc_id", "text", BUCKETS).count() == 0

    def test_small_change_lights_few_buckets(self, spark):
        a, b = _corpora(spark)
        n_changed = changed_buckets(a, b, "doc_id", "text", BUCKETS).count()
        assert 1 <= n_changed <= 3  # at most one bucket per touched doc
        out = {
            r["id"]: r["status"]
            for r in corpus_changed_docs(a, b, "doc_id", "text", BUCKETS).collect()
        }
        assert out == {7: "changed", 97: "changed", 211: "changed"}
