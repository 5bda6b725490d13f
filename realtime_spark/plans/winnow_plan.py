"""Oracle-checked queries for winnowing fingerprints (operators/winnow.py):
per-document fingerprint statistics and near-dup pair detection over the
dup-injected corpus, mirrored exactly in DuckDB (same md5 gram digests,
same leftmost-min window selection).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.winnow import winnow_fingerprints, winnow_pairs
from realtime_spark.plans.training import DOCS_DUP_CTE, SQL_TOKS, docs_with_dups
from realtime_spark.sources.testdata import load_table

_K = 3
_W = 4
_THRESHOLD = 0.5

# shared CTE: tokens -> k-gram 60-bit digests -> window minima -> distinct
_WINNOW_CTES = f"""
t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM {{src}}),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {_K} THEN
           list_transform(
             range(1, greatest(len(toks) - {_K - 1}, 1) + 1),
             i -> ('0x' || substr(md5(array_to_string(
                    list_slice(toks, i, i + {_K - 1}), ' ')), 1, 15))::BIGINT)
         ELSE CAST([] AS BIGINT[]) END AS grams
  FROM t
),
mins AS (
  SELECT doc_id,
         CASE WHEN len(grams) > 0 THEN
           list_distinct(list_transform(
             range(1, greatest(len(grams) - {_W - 1}, 1) + 1),
             i -> list_min(list_slice(grams, i, i + {_W - 1}))))
         ELSE CAST([] AS BIGINT[]) END AS fps
  FROM g
),
fps AS (SELECT doc_id AS doc, unnest(fps) AS fp FROM mins)
"""


def q_winnow_fp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, "doc_id", "text", _K, _W)
    return fps.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )


ORACLE_WINNOW_FP_STATS = f"""
WITH {_WINNOW_CTES.format(src="documents").strip()}
SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_fps,
       MIN(fp) AS fp_min, MAX(fp) AS fp_max
FROM fps GROUP BY doc
"""


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs_with_dups(spark, sf_dir)
    return winnow_pairs(d, "doc_id", "text", _K, _W, threshold=_THRESHOLD)


ORACLE_WINNOW_PAIRS = f"""
WITH {DOCS_DUP_CTE.strip()},
{_WINNOW_CTES.format(src="_docs_dup").strip()},
freq_ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 1000),
f AS (SELECT fps.* FROM fps SEMI JOIN freq_ok USING (fp)),
sizes AS (SELECT doc, COUNT(*) AS n_fp FROM f GROUP BY doc),
shared AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared
  FROM f a JOIN f b ON a.fp = b.fp AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       round(n_shared / (sa.n_fp + sb.n_fp - n_shared), 6) AS overlap
FROM shared
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE round(n_shared / (sa.n_fp + sb.n_fp - n_shared), 6) >= {_THRESHOLD}
"""


def winnow_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "winnow_fp_stats": q_winnow_fp_stats,
        "winnow_pairs": q_winnow_pairs,
    }


def winnow_oracles() -> dict[str, str]:
    return {
        "winnow_fp_stats": ORACLE_WINNOW_FP_STATS,
        "winnow_pairs": ORACLE_WINNOW_PAIRS,
    }
