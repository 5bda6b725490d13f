"""Write-Audit-Publish (WAP): the production pattern for gating a dataset
release behind quality checks — write to an isolated staging location, run
the audit suite against the staged data, and only on a clean audit promote
it to the published location (atomic rename). Consumers reading `published/`
never observe a half-written or audit-failing dataset.

This is the workflow glue over quality_checks.run_checks — the Iceberg/
Netflix WAP branch-commit pattern expressed on plain directories: staging
and published are sibling dirs, promotion is a single os.replace (atomic on
POSIX within a filesystem), and a failed audit leaves the staging dir for
inspection plus the previous published version untouched.

At 100 TB the rename becomes an Iceberg branch fast-forward / Delta table
swap; the stage->audit->promote sequence and the audit frame are identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class AuditFailure(Exception):
    """Raised when the staged dataset fails its audit; carries the audit
    rows for the failure report."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        names = ", ".join(f["constraint"] for f in failures)
        super().__init__(f"audit failed: {names}")


def wap_publish(
    df: DataFrame,
    base_dir: str,
    checks,
    table: str = "dataset",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Stage `df`, audit the STAGED files (what consumers would read, not
    the logical plan — catches writer bugs too), and promote on success.

    Returns the audit frame (all ok). Raises AuditFailure (staging left in
    place for inspection, previous published untouched) when any check
    fails. Layout: {base_dir}/staging, {base_dir}/published.
    """
    from realtime_spark.operators.quality_checks import run_checks

    spark = df.sparkSession
    staging = os.path.join(base_dir, "staging")
    published = os.path.join(base_dir, "published")
    shutil.rmtree(staging, ignore_errors=True)

    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    staged = spark.read.parquet(staging)
    audit = run_checks(staged, table, checks)
    rows = [r.asDict() for r in audit.collect()]
    failures = [r for r in rows if not r["ok"]]
    if failures:
        raise AuditFailure(failures)

    # atomic promote: replace published with the audited staging dir
    tmp_old = os.path.join(base_dir, "_retired")
    shutil.rmtree(tmp_old, ignore_errors=True)
    if os.path.exists(published):
        os.replace(published, tmp_old)
    os.replace(staging, published)
    shutil.rmtree(tmp_old, ignore_errors=True)
    return audit


def read_published(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "published"))
