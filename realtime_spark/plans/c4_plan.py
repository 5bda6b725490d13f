"""C4 cleaning-rule bundle (Raffel et al. 2020, arXiv:1910.10683 §2.2 —
public method): line-level terminal-punctuation + minimum-word rules,
doc-level sentence-count / "lorem ipsum" / curly-brace / "javascript"
rules.

The fixture corpus is punctuation-free word soup, so (exactly like the
corpus_lines plan) sentence structure is imposed deterministically and
rule triggers are injected in closed form, which lets the DuckDB oracle
state the expected flags exactly:

  - lines = consecutive 6-token chunks; line i of doc d ends with '.'
    iff (d + i) % 3 != 0  (so ~2/3 of lines carry terminal punctuation)
  - doc_id % 11 == 3 -> 'lorem ipsum' appended as an extra line
  - doc_id % 9  == 2 -> a '{' brace line appended
  - doc_id % 13 == 5 -> a line containing 'javascript' appended

Rules applied (per C4):
  L1 keep a line only if it ends in terminal punctuation
  L2 ... and has >= 5 words
  L3 drop any line containing the word 'javascript'
  D1 drop the whole doc if it has < 3 sentences (kept lines)
  D2 drop the doc on 'lorem ipsum' or '{' anywhere

Everything is expression-level (split/transform/filter/aggregate) inside
whole-stage codegen; one row in, one row out — no shuffle at all, the
scan partitioning carries straight to the sink. At 100 TB this family is
scan-bound, exactly as it should be.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.plans.training import SQL_TOKS
from realtime_spark.sources.testdata import load_table

_LINE_TOKENS = 6
_MIN_WORDS = 5
_MIN_SENTENCES = 3


def _c4_lines(d: DataFrame) -> DataFrame:
    """(doc_id, lines array<string>) with deterministic punctuation and
    injected rule triggers."""
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(_LINE_TOKENS)).cast("int")
    base = F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
        lambda i: F.concat(
            F.array_join(
                F.slice(toks, (i - 1) * _LINE_TOKENS + 1, _LINE_TOKENS), " "
            ),
            F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    extras = F.array_compact(
        F.array(
            F.when(F.col("doc_id") % 11 == 3, F.lit("lorem ipsum dolor sit amet.")),
            F.when(F.col("doc_id") % 9 == 2, F.lit("function() { return x; }")),
            F.when(
                F.col("doc_id") % 13 == 5,
                F.lit("please enable javascript to view this page."),
            ),
        )
    )
    return d.select("doc_id", F.concat(base, extras).alias("lines"))


def _kept(line: Column) -> Column:
    """C4 line keep rule: terminal punctuation AND >= MIN_WORDS words AND
    no 'javascript'."""
    words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    return (
        line.rlike("[.!?]$")
        & (words >= _MIN_WORDS)
        & ~line.contains("javascript")
    )


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lined = _c4_lines(d)
    kept = F.filter(F.col("lines"), _kept)
    joined = F.array_join(F.col("lines"), " ")
    has_lorem = joined.contains("lorem ipsum")
    has_brace = joined.contains("{")
    n_kept = F.size(kept)
    return lined.select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        joined.contains("javascript").cast("int").alias("has_js"),
        (
            (n_kept >= _MIN_SENTENCES) & ~has_lorem & ~has_brace
        ).cast("int").alias("c4_keep"),
    )


ORACLE_C4_RULES = f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS} AS toks FROM documents
),
lined AS (
  SELECT doc_id,
    list_concat(
      [concat(array_to_string(toks[(i-1)*{_LINE_TOKENS}+1 : i*{_LINE_TOKENS}], ' '),
              CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)
       FOR i IN range(1, CAST(greatest(ceil(len(toks)/{_LINE_TOKENS}.0), 1) AS BIGINT) + 1)],
      list_filter([
        CASE WHEN doc_id % 11 = 3 THEN 'lorem ipsum dolor sit amet.' END,
        CASE WHEN doc_id % 9 = 2 THEN 'function() {{ return x; }}' END,
        CASE WHEN doc_id % 13 = 5
             THEN 'please enable javascript to view this page.' END],
        x -> x IS NOT NULL)
    ) AS lines
  FROM t
),
flags AS (
  SELECT doc_id, lines,
    len(list_filter(lines, l ->
        regexp_matches(l, '[.!?]$')
        AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= {_MIN_WORDS}
        AND NOT contains(l, 'javascript'))) AS n_kept_lines,
    array_to_string(lines, ' ') AS joined
  FROM lined
)
SELECT doc_id,
  len(lines) AS n_lines,
  n_kept_lines,
  CAST(contains(joined, 'lorem ipsum') AS INT) AS has_lorem,
  CAST(contains(joined, '{{') AS INT) AS has_brace,
  CAST(contains(joined, 'javascript') AS INT) AS has_js,
  CAST(n_kept_lines >= {_MIN_SENTENCES}
       AND NOT contains(joined, 'lorem ipsum')
       AND NOT contains(joined, '{{') AS INT) AS c4_keep
FROM flags
"""


def c4_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"c4_rules": q_c4_rules}


def c4_oracles() -> dict[str, str]:
    return {"c4_rules": ORACLE_C4_RULES}
