"""Training-shard writer: the dataloader-facing sink of the corpus pipeline.

A cleaned corpus is consumed by data loaders that want (a) a deterministic
global order (resume from step N without replaying), (b) size-bounded files
(loader parallelism = file count, no 100 GB stragglers), and (c) in-file
order matching the global permutation. `training_order` (sampling.py)
computes the (shard, position) permutation; this module materializes it:

    write_training_shards: one output file per shard, rows sorted by
    position INSIDE each file — repartition on shard + sortWithinPartitions,
    so the only movement is one hash exchange; no global sort ever happens.

Scale notes (100 TB):
- file count = n_shards, chosen so corpus/n_shards ~ 256 MB-1 GB per file.
- partitionBy(shard) writes each shard's file independently; with
  maxRecordsPerFile as a safety bound an oversized shard splits rather
  than OOMing a writer task.
- the manifest (per-shard row counts + digests) is tiny and lets a loader
  verify completeness before an epoch starts; re-derived from the written
  files so it certifies what is actually on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.sampling import training_order


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Materialize the deterministic training permutation to disk: parquet
    partitioned by `shard`, rows sorted by `position` within each file."""
    ordered = training_order(df, key_col, n_shards)
    (
        # range-partition on the shard id: hash-partitioning the id leaves
        # ~1/e of the write tasks empty and others carrying 2-3 shards
        # (balls-in-bins), breaking the one-balanced-file-per-task shape;
        # ranges over the uniform 0..n_shards-1 ids map ~one shard per task
        ordered.repartitionByRange(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def shard_manifest(spark: SparkSession, path: str, key_col: str) -> DataFrame:
    """Per-shard certification manifest from the WRITTEN files: row count,
    min/max position, and an order-insensitive key digest. A loader compares
    this against the expected permutation before starting an epoch."""
    df = spark.read.parquet(path)
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.min("position").alias("min_pos"),
        F.max("position").alias("max_pos"),
        # decimal accumulator: ANSI mode makes a bigint SUM of 64-bit hashes
        # throw on overflow; decimal(38,0) never overflows at any shard size
        F.sum(
            F.xxhash64(F.col(key_col).cast("string")).cast("decimal(38,0)")
        ).alias("key_digest"),
    )
