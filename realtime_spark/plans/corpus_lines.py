"""Line-level corpus hygiene queries: boilerplate detection, cross-corpus
first-occurrence line dedup, cleaned-text reassembly (operators/lines.py).

The test documents are single-line word soup, so line structure is imposed
deterministically — consecutive 8-token chunks — and hygiene targets are
injected in closed form so the DuckDB oracle can state expectations exactly:

  - doc_id % 5 == 1  -> the doc's own first line is appended again
                        (a within-corpus duplicate at a later (doc, idx))
  - doc_id % 4 == 0  -> a newsletter boilerplate line is appended
  - doc_id % 6 == 0  -> a rights-reserved boilerplate line is appended

With 500 docs at the sf0.01 gate, the two boilerplate lines appear in 125 and
84 docs — far above the min_docs=20 threshold — while organic 8-token chunks
from a ~24-word vocabulary essentially never collide across documents, so the
oracle's expected flags are exact.

On a real corpus the chunker is replaced by split(text, '\\n') and nothing
else changes; see operators/lines.py for the 100 TB scale notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.lines import (
    LINE_TOKENS,
    boilerplate_lines,
    chunk_lines_expr,
    clean_text,
    explode_lines,
    line_dedup_stats,
)
from realtime_spark.plans.training import SQL_TOKS
from realtime_spark.sources.testdata import load_table

_BOILER_NEWSLETTER = "please subscribe to our newsletter for updates today"
_BOILER_RIGHTS = (
    "all rights reserved unauthorized reproduction strictly prohibited"
)
_MIN_DOCS = 20


def docs_with_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lines): deterministic 8-token chunking + injected hygiene
    targets, mirrored 1:1 by the _LINES_CTE oracle below."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = chunk_lines_expr(F.col("text"), LINE_TOKENS)
    # try_: an empty doc chunks to zero lines, and under ANSI a bare
    # element_at on the empty array kills the job; DuckDB's base[1] yields
    # NULL there, so the mirrored value is a NULL first line
    first_line = F.try_element_at(base, F.lit(1))
    key = F.col("doc_id")
    empty = F.array().cast("array<string>")
    lines = F.concat(
        base,
        # size guard: a zero-line doc must NOT inject a NULL self-dup line —
        # NULL join keys make the two engines diverge (Spark's left join
        # keeps the row with NULL flags, DuckDB's USING join drops it), so
        # the line frames carry a no-NULL-lines contract instead
        F.when((key % 5 == 1) & (F.size(base) > 0), F.array(first_line)).otherwise(
            empty
        ),
        F.when(key % 4 == 0, F.array(F.lit(_BOILER_NEWSLETTER))).otherwise(empty),
        F.when(key % 6 == 0, F.array(F.lit(_BOILER_RIGHTS))).otherwise(empty),
    )
    return d.select("doc_id", lines.alias("lines"))


_LINES_CTE = f"""
t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
chunked AS (
  SELECT doc_id, toks,
         list_transform(
           range(0, CAST(ceil(len(toks) / {LINE_TOKENS}.0) AS BIGINT)),
           i -> array_to_string(
                  list_slice(toks, i * {LINE_TOKENS} + 1,
                             i * {LINE_TOKENS} + {LINE_TOKENS}), ' ')
         ) AS base
  FROM t
),
doc_lines AS (
  SELECT doc_id,
         base
         || CASE WHEN doc_id % 5 = 1 AND len(base) > 0 THEN [base[1]]
                 ELSE CAST([] AS VARCHAR[]) END
         || CASE WHEN doc_id % 4 = 0 THEN ['{_BOILER_NEWSLETTER}']
                 ELSE CAST([] AS VARCHAR[]) END
         || CASE WHEN doc_id % 6 = 0 THEN ['{_BOILER_RIGHTS}']
                 ELSE CAST([] AS VARCHAR[]) END AS lines
  FROM chunked
),
lines AS (
  SELECT doc_id AS doc, CAST(u.i AS INT) AS line_idx, lines[u.i + 1] AS line
  FROM doc_lines, unnest(range(0, len(lines))) AS u(i)
)
"""


def q_lines_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = explode_lines(docs_with_lines(spark, sf_dir), "doc_id")
    return boilerplate_lines(lines, min_docs=_MIN_DOCS)


ORACLE_LINES_BOILERPLATE = f"""
WITH {_LINES_CTE.strip()}
SELECT line, COUNT(DISTINCT doc) AS n_docs, COUNT(*) AS n_occurrences
FROM lines GROUP BY line HAVING COUNT(DISTINCT doc) >= {_MIN_DOCS}
"""


def q_lines_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = explode_lines(docs_with_lines(spark, sf_dir), "doc_id")
    return line_dedup_stats(lines, min_docs=_MIN_DOCS)


# keeper of a duplicated line = smallest (doc, line_idx); the injected
# self-dup always loses to the doc's own line 0, and organic chunks never
# repeat, so is_dup is exactly "the appended copy on %5=1 docs" — unless the
# copied line equals a boilerplate line (impossible: boilerplate words
# 'newsletter'/'prohibited' etc. are outside the corpus vocabulary).
ORACLE_LINES_DEDUP_STATS = f"""
WITH {_LINES_CTE.strip()},
boiler AS (
  SELECT line FROM lines GROUP BY line
  HAVING COUNT(DISTINCT doc) >= {_MIN_DOCS}
),
keepers AS (
  SELECT line, MIN(ROW(doc, line_idx)) AS keeper FROM lines GROUP BY line
),
flagged AS (
  SELECT l.doc,
         (b.line IS NOT NULL) AS is_boiler,
         (b.line IS NULL AND ROW(l.doc, l.line_idx) <> k.keeper) AS is_dup
  FROM lines l
  LEFT JOIN boiler b USING (line)
  JOIN keepers k USING (line)
)
SELECT doc, COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN NOT is_boiler AND NOT is_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM flagged GROUP BY doc
"""


def q_lines_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = explode_lines(docs_with_lines(spark, sf_dir), "doc_id")
    return clean_text(lines, min_docs=_MIN_DOCS)


ORACLE_LINES_CLEAN_TEXT = f"""
WITH {_LINES_CTE.strip()},
boiler AS (
  SELECT line FROM lines GROUP BY line
  HAVING COUNT(DISTINCT doc) >= {_MIN_DOCS}
),
keepers AS (
  SELECT line, MIN(ROW(doc, line_idx)) AS keeper FROM lines GROUP BY line
),
kept AS (
  SELECT l.doc, l.line_idx, l.line
  FROM lines l
  LEFT JOIN boiler b USING (line)
  JOIN keepers k USING (line)
  WHERE b.line IS NULL AND ROW(l.doc, l.line_idx) = k.keeper
)
SELECT doc, COUNT(*) AS n_kept,
       md5(string_agg(line, chr(10) ORDER BY line_idx)) AS clean_md5
FROM kept GROUP BY doc
"""


def corpus_lines_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lines_boilerplate": q_lines_boilerplate,
        "lines_dedup_stats": q_lines_dedup_stats,
        "lines_clean_text": q_lines_clean_text,
    }


def corpus_lines_oracles() -> dict[str, str]:
    return {
        "lines_boilerplate": ORACLE_LINES_BOILERPLATE,
        "lines_dedup_stats": ORACLE_LINES_DEDUP_STATS,
        "lines_clean_text": ORACLE_LINES_CLEAN_TEXT,
    }
