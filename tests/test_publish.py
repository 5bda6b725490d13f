"""Write-Audit-Publish workflow: promotion only on clean audit; failed
audits leave the previous published version untouched; schema evolution
across day partitions reads back unified."""

import pytest
from pyspark.sql import functions as F

from realtime_spark.operators.publish import (
    AuditFailure,
    read_published,
    wap_publish,
)
from realtime_spark.operators.quality_checks import in_range, not_null, unique


def test_wap_promotes_on_clean_audit(spark, tmp_path):
    base = str(tmp_path / "wap")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("v")
    )
    audit = wap_publish(
        df, base, [not_null("id"), unique("id"), in_range("v", 0, 9)]
    )
    assert all(r["ok"] for r in audit.collect())
    assert read_published(spark, base).count() == 100


def test_wap_failed_audit_keeps_previous_version(spark, tmp_path):
    base = str(tmp_path / "wap")
    good = spark.range(50).select(F.col("id"), (F.col("id") % 5).alias("v"))
    wap_publish(good, base, [unique("id"), in_range("v", 0, 4)])

    bad = spark.range(30).select(
        F.col("id"), (F.col("id") % 20).alias("v")  # violates range
    )
    with pytest.raises(AuditFailure) as ei:
        wap_publish(bad, base, [unique("id"), in_range("v", 0, 4)])
    assert any("range" in f["constraint"] for f in ei.value.failures)
    # previous publish still served, staging left for inspection
    assert read_published(spark, base).count() == 50
    import os

    assert os.path.isdir(os.path.join(base, "staging"))


def test_wap_audits_staged_files_not_plan(spark, tmp_path):
    """The audit reads the parquet that was actually written — a dataset
    violating uniqueness after the write is caught even if some upstream
    plan property suggested otherwise."""
    base = str(tmp_path / "wap")
    dup = spark.range(10).select((F.col("id") % 5).alias("id"))
    with pytest.raises(AuditFailure):
        wap_publish(dup, base, [unique("id")])


def test_messages_store_schema_evolution(spark, tmp_path):
    """Day-partitioned stores accumulate schema over time (the reference's
    messages table gained binary payloads mid-life): later days add a
    column; mergeSchema reads the union with nulls for early days."""
    base = str(tmp_path / "msgs")
    d1 = spark.createDataFrame(
        [(1, "t1", "e1")], "id bigint, topic string, event string"
    ).withColumn("day", F.lit("2026-01-01"))
    d1.write.partitionBy("day").parquet(base)
    d2 = spark.createDataFrame(
        [(2, "t2", "e2", bytearray(b"\x01\x02"))],
        "id bigint, topic string, event string, binary_payload binary",
    ).withColumn("day", F.lit("2026-01-02"))
    d2.write.mode("append").partitionBy("day").parquet(base)

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert "binary_payload" in merged.columns
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["binary_payload"] is None
    assert bytes(rows[2]["binary_payload"]) == b"\x01\x02"
