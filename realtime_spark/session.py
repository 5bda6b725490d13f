"""SparkSession factory tuned for the test/bench environment.

local[N] single-JVM for tests; the configs below are the ones that matter at
cluster scale too (AQE, shuffle partitions, Arrow for the Pandas-UDF paths,
UTC session timezone so results hash-match the duckdb oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "realtime_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # duckdb-written parquet carries TIMESTAMP(NANOS); read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # split file scans to at least the cluster parallelism: a small parquet
        # file is one 128MB-bounded split by default, serializing the whole
        # pipeline onto one core; scale-neutral (no-op when files >> cores)
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally provided session
    (the driver passes its own SparkSession to __spark_entry__.entry)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # idempotence sentinel read by sources.testdata.load_table — a conf
    # key survives as long as the session does, unlike an id()-keyed set
    # whose address a NEW session can reuse after GC
    spark.conf.set("spark.realtime_spark.tuned", "1")
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:
        par = os.cpu_count() or 4
    # small files must not serialize the pipeline onto one core (no-op at
    # scale: files >> maxPartitionBytes already split). openCostInBytes (4 MiB
    # default) floors the split size, so it must shrink with the fixture files
    # for minPartitionNum to bite.
    spark.conf.set("spark.sql.files.minPartitionNum", str(par))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    return spark
