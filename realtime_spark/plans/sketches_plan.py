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
    hll_estimate,
    hll_registers,
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


_HLL_P = 8  # 256 registers -> ~6.5% standard error; plenty to exercise both
#              the raw path and the small-range linear-counting branch


def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-user estimate per event_type, next to the exact count.

    The register build shuffles at most |event_types| x 256 max-aggregates
    however large the event stream is — the approximate lever for exact
    COUNT(DISTINCT)'s full-key shuffle at 100 TB. Register contents AND the
    estimate are oracle-checked exactly (engine-stable hash + exact-integer
    harmonic sum; the lone float division is reproduced verbatim in SQL)."""
    e = load_table(spark, sf_dir, "events")
    regs = hll_registers(e, "user_id", ["event_type"], _HLL_P)
    est = hll_estimate(regs, ["event_type"], _HLL_P)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_registers",
        F.col("est").alias("hll_est"),
        "exact_distinct",
    )


_HLL_M = 1 << _HLL_P
_HLL_QBITS = 60 - _HLL_P
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)

ORACLE_HLL_USERS = f"""
WITH h AS (
  SELECT event_type,
         {sql_stable_hash("CAST(user_id AS VARCHAR)", "''", 1 << 60)} AS h
  FROM events
),
reg AS (
  SELECT event_type, h % {_HLL_M} AS j,
         MAX({_HLL_QBITS} + 1 - length(bin(h // {_HLL_M}))) AS rho
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT event_type, COUNT(*) AS n_registers,
         SUM((1::BIGINT << ({_HLL_QBITS} - rho))::BIGINT) AS s_used
  FROM reg GROUP BY 1
),
est AS (
  SELECT event_type, n_registers,
         CAST(s_used + ({_HLL_M} - n_registers)
              * (1::BIGINT << {_HLL_QBITS}) AS DOUBLE) AS s_d,
         {_HLL_M} - n_registers AS zeros
  FROM agg
),
raw AS (
  SELECT event_type, n_registers, zeros,
         {_HLL_ALPHA!r}::DOUBLE * {_HLL_M * _HLL_M}
           / (s_d / {float(1 << _HLL_QBITS)!r}::DOUBLE) AS r
  FROM est
),
fin AS (
  SELECT event_type, n_registers,
         CASE WHEN r <= {2.5 * _HLL_M} AND zeros > 0
              THEN {float(_HLL_M)!r}::DOUBLE * ln({float(_HLL_M)!r}::DOUBLE / zeros)
              ELSE r END AS e
  FROM raw
)
SELECT f.event_type, CAST(f.n_registers AS BIGINT) AS n_registers,
       CAST(round(f.e) AS BIGINT) AS hll_est,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct
FROM fin f
JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1) x USING (event_type)
"""


def sketches_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cms_user_counts": q_cms_user_counts,
        "bloom_membership": q_bloom_membership,
        "hll_users": q_hll_users,
        "hll_overlap": q_hll_overlap,
    }


def sketches_oracles() -> dict[str, str]:
    return {
        "cms_user_counts": ORACLE_CMS_USER_COUNTS,
        "bloom_membership": ORACLE_BLOOM_MEMBERSHIP,
        "hll_users": ORACLE_HLL_USERS,
        "hll_overlap": _oracle_hll_overlap(),
    }


# ---------------------------------------------------------------------------
# HLL sketch algebra: set-overlap estimation via register merge
# ---------------------------------------------------------------------------

_OVL_A, _OVL_B = "click", "purchase"


def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from sketches alone: |A∩B| ≈ est(A) +
    est(B) - est(A∪B), where the union sketch is the register-wise MAX of
    the two HLL register tables (lossless sketch mergeability) — the
    standard way to answer overlap questions without re-scanning either
    side. Output one row: per-side estimates, union estimate, the
    inclusion-exclusion intersection estimate, and the exact intersection
    for reference."""
    from realtime_spark.operators.sketches import hll_estimate, hll_registers

    e = load_table(spark, sf_dir, "events")
    ab = e.filter(F.col("event_type").isin([_OVL_A, _OVL_B])).select(
        "event_type", "user_id"
    )
    regs = hll_registers(ab, "user_id", ["event_type"], precision=_HLL_P)
    merged = (
        regs.groupBy("j")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("_union").alias("event_type"), "j", "rho")
    )
    ests = hll_estimate(
        regs.unionByName(merged), ["event_type"], precision=_HLL_P
    )
    row = ests.agg(
        F.max(F.when(F.col("event_type") == _OVL_A, F.col("est"))).alias(
            "est_a"
        ),
        F.max(F.when(F.col("event_type") == _OVL_B, F.col("est"))).alias(
            "est_b"
        ),
        F.max(F.when(F.col("event_type") == "_union", F.col("est"))).alias(
            "est_union"
        ),
    )
    exact = (
        ab.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == _OVL_A, 1).otherwise(0)).alias(
                "ha"
            ),
            F.max(F.when(F.col("event_type") == _OVL_B, 1).otherwise(0)).alias(
                "hb"
            ),
        )
        .filter((F.col("ha") == 1) & (F.col("hb") == 1))
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return row.crossJoin(exact).select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_inter"
        ),
        F.col("exact_inter").cast("bigint").alias("exact_inter"),
    )


def _oracle_hll_overlap() -> str:
    hll_core = f"""
  SELECT tag, n_registers,
         CAST(round(CASE WHEN r <= {2.5 * _HLL_M} AND zeros > 0
              THEN {float(_HLL_M)!r}::DOUBLE * ln({float(_HLL_M)!r}::DOUBLE / zeros)
              ELSE r END) AS BIGINT) AS est
  FROM (
    SELECT tag, n_registers, zeros,
           {_HLL_ALPHA!r}::DOUBLE * {_HLL_M * _HLL_M}
             / (CAST(s_used + zeros * (1::BIGINT << {_HLL_QBITS}) AS DOUBLE)
                / {float(1 << _HLL_QBITS)!r}::DOUBLE) AS r
    FROM (
      SELECT tag, COUNT(*) AS n_registers, {_HLL_M} - COUNT(*) AS zeros,
             SUM((1::BIGINT << ({_HLL_QBITS} - rho))::BIGINT) AS s_used
      FROM regs3 GROUP BY tag
    )
  )
"""
    return f"""
WITH h AS (
  SELECT event_type,
         {sql_stable_hash("CAST(user_id AS VARCHAR)", "''", 1 << 60)} AS h
  FROM events WHERE event_type IN ('{_OVL_A}', '{_OVL_B}')
),
regs AS (
  SELECT event_type AS tag, h % {_HLL_M} AS j,
         MAX({_HLL_QBITS} + 1 - length(bin(h // {_HLL_M}))) AS rho
  FROM h GROUP BY 1, 2
),
regs3 AS (
  SELECT * FROM regs
  UNION ALL
  SELECT '_union' AS tag, j, MAX(rho) AS rho FROM regs GROUP BY j
),
ests AS ({hll_core}),
row1 AS (
  SELECT MAX(CASE WHEN tag = '{_OVL_A}' THEN est END) AS est_a,
         MAX(CASE WHEN tag = '{_OVL_B}' THEN est END) AS est_b,
         MAX(CASE WHEN tag = '_union' THEN est END) AS est_union
  FROM ests
),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
    SELECT user_id FROM events WHERE event_type IN ('{_OVL_A}', '{_OVL_B}')
    GROUP BY user_id
    HAVING MAX(CASE WHEN event_type = '{_OVL_A}' THEN 1 ELSE 0 END) = 1
       AND MAX(CASE WHEN event_type = '{_OVL_B}' THEN 1 ELSE 0 END) = 1
  )
)
SELECT est_a, est_b, est_union, est_a + est_b - est_union AS est_inter,
       exact_inter
FROM row1 CROSS JOIN ex
"""
