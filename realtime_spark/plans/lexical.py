"""Lexical-statistics queries: character-entropy quality signal and TF-IDF
nearest-neighbor doc similarity (operators/text.py::char_entropy,
operators/search.py::tfidf_nearest_neighbor), DuckDB-mirrored.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_spark.operators.search import tfidf_nearest_neighbor
from realtime_spark.operators.text import char_entropy
from realtime_spark.plans.training import SQL_TOKS
from realtime_spark.sources.testdata import load_table


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return char_entropy(d, "doc_id", "text")


ORACLE_TEXT_CHAR_ENTROPY = """
WITH tok AS (
  SELECT doc_id, substr(lower(text), u.i, 1) AS ch
  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
),
c AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
p AS (SELECT doc_id, SUM(cnt) AS n, SUM(cnt * log2(cnt)) AS s FROM c GROUP BY 1)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
       floor((log2(n) - s / n) * 10000.0 + 0.5) / 10000.0 AS entropy
FROM p
"""


def q_tfidf_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return tfidf_nearest_neighbor(d, "doc_id", "text")


ORACLE_TFIDF_NN = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id AS doc, unnest(toks) AS term FROM t),
post AS (SELECT term, doc, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM post GROUP BY 1),
w AS (
  SELECT doc, term, tf * ln(1.0 + n_docs / df_t) AS w
  FROM post JOIN dfreq USING (term) CROSS JOIN nd
),
norms AS (SELECT doc, sqrt(SUM(w * w)) AS norm FROM w GROUP BY doc),
dots AS (
  SELECT a.doc AS doc, b.doc AS neighbor,
         floor((SUM(a.w * b.w) / (sa.norm * sb.norm)) * 10000.0 + 0.5)
           / 10000.0 AS cos
  FROM w a
  JOIN w b ON a.term = b.term AND a.doc <> b.doc
  JOIN norms sa ON sa.doc = a.doc
  JOIN norms sb ON sb.doc = b.doc
  GROUP BY 1, 2, sa.norm, sb.norm
),
ranked AS (
  SELECT doc, neighbor, cos,
         row_number() OVER (PARTITION BY doc ORDER BY cos DESC, neighbor)
           AS rn
  FROM dots
)
SELECT doc, neighbor, cos FROM ranked WHERE rn = 1
"""


def lexical_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_char_entropy": q_text_char_entropy,
        "tfidf_nn": q_tfidf_nn,
    }


def lexical_oracles() -> dict[str, str]:
    return {
        "text_char_entropy": ORACLE_TEXT_CHAR_ENTROPY,
        "tfidf_nn": ORACLE_TFIDF_NN,
    }
