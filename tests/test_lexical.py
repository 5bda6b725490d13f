"""Value contracts for the lexical operators whose queries are oracle-gated
elsewhere, plus the compression-ratio signal (no SQL oracle possible —
deterministic zlib; the contract is pinned here instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_spark.operators.text import compression_ratio
from realtime_spark.sources.testdata import load_table


def test_compression_ratio_contract(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = compression_ratio(d, "doc_id", "text").cache()
    stats = out.agg(
        F.min("ratio").alias("mn"),
        F.max("ratio").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_compressed") <= 0).cast("int")).alias("bad"),
    ).collect()[0]
    assert stats["n"] == d.count()
    assert stats["bad"] == 0
    # word-soup from a small vocabulary compresses well; very short docs can
    # expand slightly (zlib header overhead), bounded well under 1.5
    assert 0.05 < stats["mn"] and stats["mx"] < 1.5, stats

    # determinism: same input -> identical ratios on a re-run
    again = compression_ratio(d, "doc_id", "text")
    diff = out.join(again.withColumnRenamed("ratio", "r2"), "doc_id").filter(
        F.col("ratio") != F.col("r2")
    )
    assert diff.count() == 0
