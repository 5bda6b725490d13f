"""Sketch semantics: CMS never undercounts (and really collides when the
width is pressed), Bloom admits every member and really produces false
positives (but never false negatives). Params here are deliberately
aggressive so the interesting behavior shows at the tiny test SF; the
oracle-gated queries use production-ish widths."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_spark.operators.sketches import (
    bloom_build,
    bloom_maybe_contains,
    cms_build,
    cms_estimate,
)
from realtime_spark.sources.testdata import load_table


def test_cms_never_undercounts_and_collides(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    sketch = cms_build(e, "k", depth=2, width=8)  # pressed: collisions certain
    exact = e.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact.select("k"), "k", depth=2, width=8)
    out = (
        exact.join(est, "k")
        .select((F.col("est") - F.col("exact")).alias("over"))
        .agg(
            F.min("over").alias("mn"),
            F.max("over").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert out["n"] > 0
    assert out["mn"] >= 0, "CMS undercounted — impossible by construction"
    assert out["mx"] > 0, "no collisions at width 8 — sketch degenerate"


def test_bloom_no_false_negatives_some_false_positives(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )
    seen = d.filter(F.col("doc_id") % 2 == 0)
    bloom = bloom_build(seen, "digest", num_hashes=3, num_bits=64)  # pressed
    probed = bloom_maybe_contains(bloom, d, "digest", num_hashes=3, num_bits=64)
    out = d.join(probed, "digest").cache()
    missed = out.filter(
        (F.col("doc_id") % 2 == 0) & ~F.col("maybe_present")
    ).count()
    fps = out.filter((F.col("doc_id") % 2 != 0) & F.col("maybe_present")).count()
    outsiders = out.filter(F.col("doc_id") % 2 != 0).count()
    assert missed == 0, "Bloom false negative — impossible by construction"
    assert fps > 0, "no false positives at 64 bits — filter degenerate"
    assert fps <= outsiders
