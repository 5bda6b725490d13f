"""BPE tokenizer-training queries over the documents corpus.

`bpe_pair_counts` (the round-0 statistic every merge decision is made
from) is oracle-checked against DuckDB; the iterative trainer and the
segmenter are genuinely non-SQL-expressible (driver-looped argmax rounds),
so they get rows-only driver checks plus an exact pure-Python differential
test (tests/test_bpe.py) — the same contract as k-means/PageRank.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.bpe import (
    pair_counts,
    segment_with_merges,
    symbolize,
    train_bpe,
    word_freqs,
)
from realtime_spark.sources.testdata import load_table

_N_MERGES = 12


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pc = pair_counts(symbolize(word_freqs(d)))
    return pc.select(
        F.col("left").alias("l_sym"),
        F.col("right").alias("r_sym"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


ORACLE_BPE_PAIR_COUNTS = """
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS word
  FROM documents
),
wf AS (SELECT word, COUNT(*) AS freq FROM toks GROUP BY 1),
syms AS (
  SELECT freq,
         list_append([substr(word, CAST(i AS INT), 1)
                      FOR i IN range(1, len(word)+1)], '</w>') AS s
  FROM wf
),
pairs AS (
  SELECT s[CAST(i AS INT)] AS l_sym, s[CAST(i AS INT)+1] AS r_sym, freq
  FROM syms, unnest(range(1, len(s))) AS t(i)
)
SELECT l_sym, r_sym, CAST(SUM(freq) AS BIGINT) AS cnt
FROM pairs GROUP BY 1, 2
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table (rank, l_sym, r_sym, pair_count) — iterative
    argmax rounds; rows-only check + differential pytest."""
    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe(d, num_merges=_N_MERGES)
    return spark.createDataFrame(
        merges, schema="rank int, l_sym string, r_sym string, pair_count bigint"
    )


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenized with the learned merges: per-doc BPE token count
    and the compression vs character count (the metric a tokenizer is
    judged by)."""
    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe(d, num_merges=_N_MERGES)
    seg = segment_with_merges(d, merges)
    return seg.select("doc_id", "n_bpe_tokens")


def tokenizer_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_merges": q_bpe_merges,
        "bpe_segment": q_bpe_segment,
    }


def tokenizer_oracles() -> dict[str, str]:
    return {"bpe_pair_counts": ORACLE_BPE_PAIR_COUNTS}
