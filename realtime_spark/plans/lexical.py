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
    """max_df=200 exercises the operator's own scale lever: a term in d
    docs contributes d^2 postings-join rows, and the UNcapped registered
    form filled an 80 GB disk with shuffle spill at sf1 (the sf1 gate's
    concrete proof that the cap is load-bearing, not optional). Weights
    keep full-corpus df; norms are recomputed over surviving terms —
    the oracle mirrors both."""
    d = load_table(spark, sf_dir, "documents")
    return tfidf_nearest_neighbor(d, "doc_id", "text", max_df=200)


ORACLE_TFIDF_NN = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id AS doc, unnest(toks) AS term FROM t),
post AS (SELECT term, doc, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM post GROUP BY 1),
w AS (
  -- df cap mirrors max_df=200: weights keep full-corpus df_t; dropped
  -- stop-terms leave the vector space and the norms below
  SELECT doc, term, tf * ln(1.0 + n_docs / df_t) AS w
  FROM post JOIN dfreq USING (term) CROSS JOIN nd
  WHERE df_t <= 200
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


_KN_D = 0.75  # absolute discount (standard KN default)


def q_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average log-probability under an interpolated
    Kneser-Ney bigram model — the smoothed upgrade of the MLE bigram LM
    (window_analytics.q_bigram_lm), the form actually used for
    perplexity-based corpus filtering:

      P(w2|w1) = (c12 - d)/c1 + d * N1+(w1,.)/c1 * N1+(.,w2)/N1+(.,.)

    All five count tables are map-side-combined aggregations over the
    bigram frame; the model join keys on the bigram. Probabilities are
    strictly positive for every seen bigram, and the continuation term is
    the novel-context distribution (how many distinct left contexts a word
    follows), not raw frequency — KN's defining property.
    """
    from pyspark.sql import functions as F  # local: keep module imports lean

    from realtime_spark.operators.text import quantize

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
        ).alias("toks"),
    )
    idx = F.when(
        F.size("toks") >= 2, F.sequence(F.lit(1), F.size("toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg_counts.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p1")
    )
    cont = bg_counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1pr"))
    tot = bg_counts.agg(F.count(F.lit(1)).alias("tot"))
    lm = (
        bg_counts.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c12") - F.lit(_KN_D)) / F.col("c1")
                + F.lit(_KN_D) * F.col("n1p1") / F.col("c1")
                * (F.col("n1pr") / F.col("tot"))
            ).alias("logp"),
        )
    )
    scored = (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.avg("logp").alias("avg_logp"), F.count(F.lit(1)).alias("n_bigrams"))
    )
    return scored.select(
        "doc_id", quantize(F.col("avg_logp"), 4).alias("avg_logp"), "n_bigrams"
    )


ORACLE_KN_BIGRAM_LM = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
),
bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p1 FROM bgc GROUP BY 1),
cont AS (SELECT w2, COUNT(*) AS n1pr FROM bgc GROUP BY 1),
tot AS (SELECT COUNT(*) AS tot FROM bgc),
lm AS (
  SELECT bgc.w1, bgc.w2,
         ln((c12 - {_KN_D}) / c1.c1
            + {_KN_D} * c1.n1p1 / c1.c1 * (cont.n1pr / tot.tot)) AS logp
  FROM bgc JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN tot
),
scored AS (
  SELECT doc_id, AVG(logp) AS avg_logp, COUNT(*) AS n_bigrams
  FROM bg JOIN lm USING (w1, w2) GROUP BY doc_id
)
SELECT doc_id, floor(avg_logp * 10000.0 + 0.5) / 10000.0 AS avg_logp,
       CAST(n_bigrams AS BIGINT) AS n_bigrams
FROM scored
"""


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib ratio quality signal. Deliberately has NO oracle_sql entry:
    zlib is not expressible in SQL, so the driver records the weaker
    rows-only check; tests/test_lexical.py pins the value contract."""
    from realtime_spark.operators.text import compression_ratio

    d = load_table(spark, sf_dir, "documents")
    return compression_ratio(d, "doc_id", "text")


def lexical_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_char_entropy": q_text_char_entropy,
        "compression_ratio": q_compression_ratio,
        "tfidf_nn": q_tfidf_nn,
        "kn_bigram_lm": q_kn_bigram_lm,
    }


def lexical_oracles() -> dict[str, str]:
    return {
        "text_char_entropy": ORACLE_TEXT_CHAR_ENTROPY,
        "tfidf_nn": ORACLE_TFIDF_NN,
        "kn_bigram_lm": ORACLE_KN_BIGRAM_LM,
    }
