"""BPE tokenizer-training queries over the documents corpus.

ALL THREE queries are oracle-checked. `bpe_pair_counts` is the round-0
statistic. The trainer (`bpe_merges`) is driver-looped argmax rounds, but
at the fixture's _N_MERGES=12 the rounds UNROLL into chained MATERIALIZED
CTEs: each round is one pair-count aggregate, a 1-row argmax, and a pure
list-expression merge application. The leftmost non-overlapping merge has
a positional closed form (merge at i iff the pair matches and, for l==r
runs, the offset inside the run of l's is even), so no fold is needed.
The segmenter (`bpe_segment`) replays the rank-greedy per-word loop as a
recursive CTE over DISTINCT words (word types, exactly like the Spark
memo cache). The pure-Python differential (tests/test_bpe.py) remains as
the independent third implementation.
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


# positional closed form of merge_pair_expr's leftmost non-overlapping
# merge: position i merges iff (syms[i], syms[i+1]) == (l, r) and — only
# relevant when l == r, where consecutive candidates overlap — i sits at an
# EVEN offset inside its maximal run of l's (leftmost-first consumption)
_SQL_MERGE_POSITIONS = """list_filter(range(1, len(syms)), i ->
      syms[CAST(i AS INT)] = m.l AND syms[CAST(i AS INT) + 1] = m.r
      AND (m.l <> m.r OR ((i - coalesce(list_max(list_filter(range(1, i),
            j -> syms[CAST(j AS INT)] <> m.l)), 0) - 1) % 2 = 0)))"""


def _bpe_chain_ctes() -> str:
    """WITH-body that unrolls _N_MERGES training rounds: s{k} is the
    word-type symbol table after round k, m{k} the round's argmax merge.
    MATERIALIZED is load-bearing: each round references the previous one
    twice (pair counts + merge application), so un-materialized CTEs would
    inline exponentially (2^rounds parquet scans)."""
    parts = [f"""toksd AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x <> '')) AS word
  FROM documents
),
wf AS (SELECT word, COUNT(*) AS freq FROM toksd GROUP BY 1),
s0 AS MATERIALIZED (
  SELECT freq,
         list_append([substr(word, CAST(i AS INT), 1)
                      FOR i IN range(1, len(word)+1)], '</w>') AS syms
  FROM wf
)"""]
    for k in range(1, _N_MERGES + 1):
        parts.append(f""",
pc{k} AS (
  SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT)+1] AS r,
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM s{k - 1}, unnest(range(1, len(syms))) t(i) GROUP BY 1, 2
),
m{k} AS MATERIALIZED (SELECT l, r, cnt FROM pc{k}
                      ORDER BY cnt DESC, l, r LIMIT 1),
sp{k} AS (SELECT freq, syms, {_SQL_MERGE_POSITIONS} AS mp
          FROM s{k - 1}, m{k} m),
s{k} AS MATERIALIZED (
  SELECT freq,
         [CASE WHEN list_contains(mp, i) THEN m.l || m.r
               ELSE syms[CAST(i AS INT)] END
          FOR i IN range(1, len(syms) + 1)
          IF NOT list_contains(mp, i - 1)] AS syms
  FROM sp{k}, m{k} m
)""")
    traces = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, l, r, cnt FROM m{k}"
        for k in range(1, _N_MERGES + 1)
    )
    # train_bpe stops at the first round whose best count is <= 1; the
    # cumulative-min gate mirrors the break (later rounds computed on the
    # then-divergent symbol table are discarded with it)
    parts.append(f""",
allm AS ({traces}),
gated AS (SELECT *, MIN(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
            AS chain_min FROM allm)""")
    return "".join(parts)


def _oracle_bpe_merges() -> str:
    return f"""
WITH {_bpe_chain_ctes()}
SELECT CAST(rank AS INT) AS rank, l AS l_sym, r AS r_sym,
       cnt AS pair_count
FROM gated WHERE chain_min > 1 ORDER BY rank
"""


def _bpe_seg_ctes(dwords_body: str) -> str:
    """mm/dwords/seg/final CTE chain: the rank-greedy segmenter replayed
    as a recursive CTE over the DISTINCT words of `dwords_body` (exactly
    the Spark memo cache's word-type set). Shared by the documents
    segmenter oracle below and the chat BPE-costing oracle
    (plans/behavior.py ORACLE_CHAT_BPE_COST), so the two cannot drift."""
    return f"""mm AS MATERIALIZED (
  SELECT map_from_entries(list(struct_pack(k := l || chr(1) || r,
                                           v := rank))) AS m
  FROM gated WHERE chain_min > 1
),
dwords AS ({dwords_body}),
seg AS (
  SELECT word,
         list_append([substr(word, CAST(i AS INT), 1)
                      FOR i IN range(1, len(word)+1)], '</w>') AS syms
  FROM dwords
  UNION ALL
  SELECT s.word,
         list_slice(s.syms, 1, b.best.i - 1)
         || [s.syms[CAST(b.best.i AS INT)] || s.syms[CAST(b.best.i AS INT) + 1]]
         || list_slice(s.syms, b.best.i + 2, len(s.syms))
  FROM seg s, mm,
  LATERAL (SELECT list_sort(list_filter(
             [struct_pack(r := map_extract(mm.m,
                  s.syms[CAST(i AS INT)] || chr(1)
                  || s.syms[CAST(i AS INT) + 1])[1], i := i)
              FOR i IN range(1, len(s.syms))],
             x -> x.r IS NOT NULL))[1] AS best) b
  WHERE b.best IS NOT NULL
),
final AS (
  SELECT s.word, len(s.syms) AS n
  FROM seg s, mm
  WHERE len(list_filter(range(1, len(s.syms)), i ->
          map_extract(mm.m, s.syms[CAST(i AS INT)] || chr(1)
                      || s.syms[CAST(i AS INT) + 1])[1] IS NOT NULL)) = 0
)"""


def _oracle_bpe_segment() -> str:
    return f"""
WITH RECURSIVE {_bpe_chain_ctes()},
{_bpe_seg_ctes("SELECT DISTINCT word FROM toksd")}
SELECT d.doc_id, CAST(COALESCE(SUM(f.n), 0) AS INT) AS n_bpe_tokens
FROM documents d
LEFT JOIN toksd t ON t.doc_id = d.doc_id
LEFT JOIN final f ON f.word = t.word
GROUP BY d.doc_id
"""


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer health per language: FERTILITY = BPE tokens per word (the
    metric multilingual tokenizer reports lead with — a language whose
    fertility is far above the corpus mean is being shredded into
    characters and will train poorly). Words are the trainer's own
    tokenization, so the ratio is internally consistent; the language
    label is the n-gram lang-id detector.

    Scale shape: the BPE cost is the map-only inline coster (merge table
    as a closure-constant broadcast dim, per-batch word memo), lang-id and
    word counts are per-row expressions, and the only exchange is the
    final tiny per-language aggregate.

    r10 optimization (guide section 4): lang-id rides the STAGED projection
    (`with_detected_lang` — the expression form re-tokenized the text ~3x
    per language through interpreted HOF lambdas, ~20 s of the query's
    28 s wall at sf0.1), it is computed BEFORE the Python coster together
    with n_words, and the coster returns only (lang, n_words, count) — the
    document text crosses the Arrow boundary once inbound and never back
    out (out_cols pruning; mapInPandas is opaque to Catalyst's own column
    pruning)."""
    from realtime_spark.operators.bpe import TOKEN_RE, with_bpe_token_count
    from realtime_spark.operators.text import with_detected_lang

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(d, num_merges=_N_MERGES)
    pre = with_detected_lang(d, "text", "lang").withColumn(
        "n_words",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), TOKEN_RE), lambda t: t != "")
        ),
    )
    per_doc = with_bpe_token_count(
        pre, merges, out_cols=["lang", "n_words"]
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_words",
        "total_bpe_tokens",
        F.when(
            F.col("total_words") > 0,
            F.round(F.col("total_bpe_tokens") / F.col("total_words"), 6),
        ).alias("fertility"),
    )


def _oracle_bpe_fertility() -> str:
    # lazy import: plans.training also imports this module's _N_MERGES
    from realtime_spark.plans.training import _oracle_lang_id

    return f"""
WITH RECURSIVE {_bpe_chain_ctes()},
{_bpe_seg_ctes("SELECT DISTINCT word FROM toksd")},
doctok AS (
  SELECT d.doc_id,
         CAST(COALESCE(SUM(f.n), 0) AS BIGINT) AS n_bpe,
         CAST(COUNT(t.word) AS BIGINT) AS n_words
  FROM documents d
  LEFT JOIN toksd t ON t.doc_id = d.doc_id
  LEFT JOIN final f ON f.word = t.word
  GROUP BY d.doc_id
),
lang AS ({_oracle_lang_id()})
SELECT l.detected_lang AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(dt.n_words) AS BIGINT) AS total_words,
       CAST(SUM(dt.n_bpe) AS BIGINT) AS total_bpe_tokens,
       CASE WHEN SUM(dt.n_words) > 0
            THEN round(CAST(SUM(dt.n_bpe) AS DOUBLE) / SUM(dt.n_words), 6)
       END AS fertility
FROM doctok dt JOIN lang l ON l.doc_id = dt.doc_id
GROUP BY 1
"""


def tokenizer_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_merges": q_bpe_merges,
        "bpe_segment": q_bpe_segment,
        "bpe_fertility": q_bpe_fertility,
    }


def tokenizer_oracles() -> dict[str, str]:
    return {
        "bpe_pair_counts": ORACLE_BPE_PAIR_COUNTS,
        "bpe_merges": _oracle_bpe_merges(),
        "bpe_segment": _oracle_bpe_segment(),
        "bpe_fertility": _oracle_bpe_fertility(),
    }
