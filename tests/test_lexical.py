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


def test_winnow_staged_matches_expression_form(spark, sf_dir):
    """winnow_fingerprints' staged projections (r10: tokens and gram hashes
    computed once per row) must be set-identical to exploding the
    single-expression winnow_expr — the form the DuckDB oracle mirrors.
    Covers the short-doc edges too: < k tokens (no fingerprints) and
    >= k but < one full window (single clamped-window minimum)."""
    from pyspark.sql import functions as F

    from realtime_spark.operators.winnow import winnow_expr, winnow_fingerprints
    from realtime_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(
        [(9000001, "one two"), (9000002, "a b c"), (9000003, "a b c d e")],
        "doc_id bigint, text string",
    )
    src = d.limit(200).unionByName(edges)

    staged = winnow_fingerprints(src, "doc_id", "text", 3, 4)
    expr_form = src.select(
        F.col("doc_id").alias("doc"),
        F.explode(winnow_expr(F.col("text"), 3, 4)).alias("fp"),
    )
    assert staged.exceptAll(expr_form).count() == 0
    assert expr_form.exceptAll(staged).count() == 0
    # the < k-token doc must be invisible; the clamped-window doc visible
    docs = {r["doc"] for r in staged.filter("doc >= 9000000").collect()}
    assert 9000001 not in docs and 9000002 in docs and 9000003 in docs
