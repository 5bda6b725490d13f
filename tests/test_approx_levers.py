"""The approximate levers SCALE.md names for when exact shuffles dominate:
percentile_approx and approx_count_distinct against their exact
counterparts, and the accumulating Bloom gate as a streaming dedup
pre-filter. These pin the accuracy/behavior contract the scale levers rely
on — the oracle-gated queries stay exact."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from realtime_spark.sources.testdata import load_table


def test_percentile_approx_tracks_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    row = d.agg(
        F.expr("percentile(n_chars, 0.5)").alias("exact"),
        F.expr("percentile_approx(n_chars, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    # with accuracy=10000 the sketch is exact up to interpolation: the
    # approx value must be an actual datapoint within 2% of the median
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_streaming_bloom_gate_dedup(spark, sf_dir):
    """Accumulating Bloom gate: each micro-batch is pre-filtered against the
    positions set by all previous batches, then adds its own — the at-scale
    shape for 'drop documents whose digest we already ingested' where the
    exact digest set no longer fits a broadcast. Bits are sized so FP = 0
    here, making the assertion exact; at scale FPs only over-drop (safe
    direction for dedup)."""
    from realtime_spark.operators.sketches import bloom_build, bloom_maybe_contains

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )
    # 3 batches; batches 2 and 3 re-deliver some of batch 1's docs
    b1 = d.filter(F.col("doc_id") % 3 == 0)
    b2 = d.filter((F.col("doc_id") % 3 == 1) | (F.col("doc_id") % 6 == 0))
    b3 = d  # everything again
    num_bits = 1 << 22
    delivered: list[int] = []
    seen_positions = None  # accumulated Bloom (positions DataFrame)

    with tempfile.TemporaryDirectory() as tmp:
        store = os.path.join(tmp, "bloom")
        for batch in (b1, b2, b3):
            if seen_positions is None:
                fresh = batch
            else:
                probed = bloom_maybe_contains(
                    seen_positions, batch, "digest", num_bits=num_bits
                )
                fresh = batch.join(probed, "digest").filter(
                    ~F.col("maybe_present")
                ).drop("maybe_present")
            delivered.extend(r["doc_id"] for r in fresh.select("doc_id").collect())
            add = bloom_build(fresh, "digest", num_bits=num_bits)
            add.write.mode("append").parquet(store)
            seen_positions = spark.read.parquet(store).distinct()

    all_ids = [r["doc_id"] for r in d.select("doc_id").collect()]
    assert sorted(delivered) == sorted(set(all_ids)), (
        f"delivered {len(delivered)} vs {len(set(all_ids))} unique docs"
    )
