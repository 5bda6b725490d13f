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


class TestHll:
    def test_registers_merge_losslessly(self, spark, sf_dir):
        """Sharded builds merge by union+max to EXACTLY the monolithic
        registers — the property that lets HLL run over shards, days, or
        streaming micro-batches without re-reading history."""
        from realtime_spark.operators.sketches import hll_estimate, hll_registers

        e = load_table(spark, sf_dir, "events")
        full = hll_registers(e, "user_id", ["event_type"])
        halves = [
            hll_registers(e.filter(F.col("event_id") % 2 == i), "user_id", ["event_type"])
            for i in (0, 1)
        ]
        merged = (
            halves[0].unionByName(halves[1])
            .groupBy("event_type", "j")
            .agg(F.max("rho").alias("rho"))
        )
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0
        est_full = {r["event_type"]: r["est"] for r in hll_estimate(full, ["event_type"]).collect()}
        est_merged = {r["event_type"]: r["est"] for r in hll_estimate(merged, ["event_type"]).collect()}
        assert est_full == est_merged

    def test_streaming_incremental_estimate(self, spark, sf_dir, tmp_path):
        """foreachBatch folds each micro-batch's registers into a running
        register table (union+max) — the streaming distinct-count that
        never stores keys. Final estimate == the batch estimate."""
        from realtime_spark.operators.sketches import hll_estimate, hll_registers

        e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
        src = str(tmp_path / "src")
        e.repartition(4).write.parquet(src)
        state = {"regs": None}

        def on_batch(batch_df, epoch_id):
            regs = hll_registers(batch_df, "user_id", ["event_type"])
            if state["regs"] is None:
                state["regs"] = regs.collect()
            else:
                prev = batch_df.sparkSession.createDataFrame(
                    state["regs"], "event_type string, j bigint, rho int"
                )
                state["regs"] = (
                    prev.unionByName(regs)
                    .groupBy("event_type", "j")
                    .agg(F.max("rho").alias("rho"))
                    .collect()
                )

        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        stream.awaitTermination(120)
        final = spark.createDataFrame(
            state["regs"], "event_type string, j bigint, rho int"
        )
        want = {
            r["event_type"]: r["est"]
            for r in hll_estimate(hll_registers(e, "user_id", ["event_type"]), ["event_type"]).collect()
        }
        got = {r["event_type"]: r["est"] for r in hll_estimate(final, ["event_type"]).collect()}
        assert got == want
