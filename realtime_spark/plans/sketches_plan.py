"""Oracle-checked queries for the deterministic sketches (operators/
sketches.py): count-min estimation error measured against exact counts, and
Bloom membership with its actual false positives enumerated.

Because the hash family is engine-stable md5, the DuckDB oracle reproduces
the sketch bit-for-bit: every CMS overcount and every Bloom false positive
is asserted exactly, not bounded statistically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.sketches import (
    bloom_build,
    bloom_maybe_contains,
    cms_build,
    cms_estimate,
    sql_stable_hash,
)
from realtime_spark.sources.testdata import load_table

_CMS_DEPTH = 4
_CMS_WIDTH = 64  # deliberately narrow so collisions (overcounts) occur
_BLOOM_K = 3
_BLOOM_BITS = 2048  # ~5% FP at the gate SF: false positives actually appear


def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS estimate vs exact per-user event counts; overcount >= 0 always."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_key")
    )
    sketch = cms_build(e, "user_key", _CMS_DEPTH, _CMS_WIDTH)
    exact = e.groupBy("user_key").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(sketch, exact.select("user_key"), "user_key", _CMS_DEPTH, _CMS_WIDTH)
    return exact.join(est, "user_key").select(
        "user_key",
        "exact_cnt",
        F.col("est").alias("cms_est"),
        (F.col("est") - F.col("exact_cnt")).alias("overcount"),
    )


ORACLE_CMS_USER_COUNTS = f"""
WITH h AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
build AS (
  SELECT i, {sql_stable_hash("k", "i", _CMS_WIDTH)} AS bucket, COUNT(*) AS cnt
  FROM h CROSS JOIN (SELECT unnest(range(0, {_CMS_DEPTH})) AS i)
  GROUP BY 1, 2
),
ex AS (SELECT k, COUNT(*) AS exact_cnt FROM h GROUP BY k),
probes AS (
  SELECT ex.k, i, {sql_stable_hash("ex.k", "i", _CMS_WIDTH)} AS bucket
  FROM ex CROSS JOIN (SELECT unnest(range(0, {_CMS_DEPTH})) AS i)
),
est AS (
  SELECT p.k, MIN(COALESCE(b.cnt, 0)) AS cms_est
  FROM probes p LEFT JOIN build b USING (i, bucket) GROUP BY p.k
)
SELECT ex.k AS user_key, CAST(ex.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(est.cms_est AS BIGINT) AS cms_est,
       CAST(est.cms_est - ex.exact_cnt AS BIGINT) AS overcount
FROM ex JOIN est ON est.k = ex.k
"""


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built over even-doc digests (the 'already ingested'
    set); every doc probed. False positives = odd docs the filter admits —
    enumerated exactly, since the hash family is engine-stable."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )
    seen = d.filter(F.col("doc_id") % 2 == 0)
    bloom = bloom_build(seen, "digest", _BLOOM_K, _BLOOM_BITS)
    probed = bloom_maybe_contains(bloom, d, "digest", _BLOOM_K, _BLOOM_BITS)
    out = d.join(probed, "digest").select(
        "doc_id",
        "maybe_present",
        (F.col("doc_id") % 2 == 0).alias("actually_in"),
        (F.col("maybe_present") & (F.col("doc_id") % 2 != 0)).alias(
            "false_positive"
        ),
    )
    return out


ORACLE_BLOOM_MEMBERSHIP = f"""
WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
bits AS (
  SELECT DISTINCT {sql_stable_hash("digest", "i", _BLOOM_BITS)} AS bitpos
  FROM d CROSS JOIN (SELECT unnest(range(0, {_BLOOM_K})) AS i)
  WHERE doc_id % 2 = 0
),
probes AS (
  SELECT d.doc_id, {sql_stable_hash("d.digest", "i", _BLOOM_BITS)} AS bitpos
  FROM d CROSS JOIN (SELECT unnest(range(0, {_BLOOM_K})) AS i)
),
hits AS (
  SELECT p.doc_id,
         (SUM(CASE WHEN b.bitpos IS NOT NULL THEN 1 ELSE 0 END) = {_BLOOM_K})
           AS maybe_present
  FROM probes p LEFT JOIN bits b USING (bitpos) GROUP BY p.doc_id
)
SELECT doc_id, maybe_present, (doc_id % 2 = 0) AS actually_in,
       (maybe_present AND doc_id % 2 <> 0) AS false_positive
FROM hits
"""


def sketches_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cms_user_counts": q_cms_user_counts,
        "bloom_membership": q_bloom_membership,
    }


def sketches_oracles() -> dict[str, str]:
    return {
        "cms_user_counts": ORACLE_CMS_USER_COUNTS,
        "bloom_membership": ORACLE_BLOOM_MEMBERSHIP,
    }
