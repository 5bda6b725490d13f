"""Dataset profiling / manifest queries — the bookkeeping layer of a
training-data pipeline: per-column quality stats (null rate, cardinality,
value lengths) and per-source corpus manifests for ingest auditing.

Shape: ONE full pass over the table computes every metric as a wide agg
row (map-side partial aggregation, no shuffle of raw rows), then `stack`
unpivots the single row into (column, metric) form driver-side-free. At
100 TB this is the cheapest possible profile — the scan dominates and
each executor emits one partial row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import load_table

_SQL_Q2 = "floor({expr} * 100.0 + 0.5) / 100.0"


def profile_columns(df: DataFrame, cols: dict[str, bool]) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct, avg_len).
    ``cols`` maps column name -> is_string (strings get avg length).
    Exact distinct counts (count_distinct shuffles only the distinct
    partials, not rows)."""
    aggs = []
    n_rows = F.count(F.lit(1)).alias("__n")
    for c, is_str in cols.items():
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nd"))
        if is_str:
            aggs.append(quantize(F.avg(F.length(F.col(c))), 2).alias(f"{c}__al"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__al"))
    wide = df.agg(n_rows, *aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}', {c}__nn, {c}__nd, {c}__al")
    stack = f"stack({len(cols)}, {', '.join(stack_args)}) as (column_name, n_notnull, n_distinct, avg_len)"
    return wide.selectExpr("__n as n_rows", stack).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_null"),
        "n_distinct",
        "avg_len",
    )


_DOC_COLS = {
    "doc_id": False,
    "text": True,
    "lang": True,
    "source": True,
    "n_chars": False,
}


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, _DOC_COLS)


def _doc_profile_oracle() -> str:
    parts = []
    for c, is_str in _DOC_COLS.items():
        al = (
            # length() = characters, matching Spark's F.length; strlen()
            # counts BYTES and silently diverges on any non-ASCII text
            _SQL_Q2.format(expr=f"AVG(length({c}))")
            if is_str
            else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,"
            f" COUNT(*) - COUNT({c}) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct, {al} AS avg_len FROM documents"
        )
    return "\nUNION ALL\n".join(parts)


ORACLE_PROFILE_DOCUMENTS = _doc_profile_oracle()


def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ingest manifest: doc counts, char volume, language mix,
    id range — the audit row a pipeline writes per ingest partition."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        quantize(F.avg("n_chars"), 2).alias("avg_chars"),
    )


ORACLE_CORPUS_MANIFEST = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
       {_SQL_Q2.format(expr="AVG(n_chars)")} AS avg_chars
FROM documents GROUP BY source
"""


def profiling_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_documents": q_profile_documents,
        "corpus_manifest": q_corpus_manifest,
    }


def profiling_oracles() -> dict[str, str]:
    return {
        "profile_documents": ORACLE_PROFILE_DOCUMENTS,
        "corpus_manifest": ORACLE_CORPUS_MANIFEST,
    }
