"""Window-function, multidimensional, and fuzzy-match analytics.

The reference's own windowing is minimal (replay top-k W1, deterministic
group ordering W2 — SURVEY §2.5); a standalone analytics engine additionally
needs the standard window-function family, OLAP multi-dimensional rollups,
reshaping (pivot/unpivot), fuzzy matching, and higher-order LM scoring over
the corpus. All expressed as single declarative plans (Catalyst window /
rollup / cube operators — zero UDFs) and each mirrored by ANSI SQL for the
DuckDB oracle.

Scale notes (100 TB):
- window queries: one shuffle on the partition key, per-partition sort; no
  global sort anywhere. Ties are always broken by a unique id so results
  are engine-stable.
- rollup/cube: Spark expands grouping sets into a single Expand + one
  aggregation — partial aggregation still applies per grouping set; the
  shuffle carries |groups| not |rows|.
- pivot: a fixed, explicitly listed pivot-value set (never inferred from
  data — inference would be a separate distinct scan and non-deterministic
  column order) compiles to one map-side-combined aggregation.
- fuzzy pairs: candidate generation by an equi-joinable blocking key
  (length band) bounds the quadratic levenshtein work to in-block pairs —
  the same blocking pattern as LSH: never all-pairs over the corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_spark.functions.timeutil import epoch_seconds
from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import load_table


# ---------------------------------------------------------------------------
# lag/lead event deltas
# ---------------------------------------------------------------------------

def q_win_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event cadence: seconds since the previous event and until
    the next one (lag/lead over the per-user time-ordered stream)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    sec = epoch_seconds("ts")
    return e.select(
        "event_id",
        "user_id",
        (sec - F.lag(sec).over(w)).alias("gap_prev_sec"),
        (F.lead(sec).over(w) - sec).alias("gap_next_sec"),
        F.row_number().over(w).alias("event_rank"),
    )


ORACLE_WIN_EVENT_DELTAS = """
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT)
         - lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_prev_sec,
       lead(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - CAST(floor(epoch(ts)) AS BIGINT) AS gap_next_sec,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
         AS event_rank
FROM events
"""


# ---------------------------------------------------------------------------
# ntile quartiles
# ---------------------------------------------------------------------------

def q_win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-quartile summary per event_type: ntile(4) over (value, id) —
    the unique id tiebreak makes bucket assignment deterministic — then
    per-bucket count and value bounds."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    tiled = e.select(
        "event_type", "value", F.ntile(4).over(w).alias("quartile")
    )
    return tiled.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        quantize(F.min("value"), 6).alias("lo"),
        quantize(F.max("value"), 6).alias("hi"),
    )


ORACLE_WIN_NTILE_QUARTILES = """
WITH t AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS quartile
  FROM events
)
SELECT event_type, CAST(quartile AS INT) AS quartile, COUNT(*) AS n,
       floor(MIN(value) * 1000000.0 + 0.5) / 1000000.0 AS lo,
       floor(MAX(value) * 1000000.0 + 0.5) / 1000000.0 AS hi
FROM t GROUP BY event_type, quartile
"""


# ---------------------------------------------------------------------------
# cumulative distribution
# ---------------------------------------------------------------------------

def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist of order value within each priority class (tie-safe: the
    function itself is defined on value ordering alone)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").asc())
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        quantize(F.cume_dist().over(w), 6).alias("price_cume"),
        F.rank().over(w).alias("price_rank"),
    )


ORACLE_WIN_CUME_DIST = """
SELECT o_orderkey, o_orderpriority,
       floor(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
             * 1000000.0 + 0.5) / 1000000.0 AS price_cume,
       CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS BIGINT)
         AS price_rank
FROM orders
"""


# ---------------------------------------------------------------------------
# running (cumulative) per-user value sum
# ---------------------------------------------------------------------------

def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running value total in event order (ROWS frame so same-
    timestamp peers accumulate one at a time, deterministic via id)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        quantize(F.sum("value").over(w), 4).alias("running_value"),
    )


ORACLE_WIN_RUNNING_SUM = """
SELECT event_id, user_id,
       floor(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 10000.0 + 0.5) / 10000.0 AS running_value
FROM events
"""


# ---------------------------------------------------------------------------
# pivot / unpivot
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """day × event_type count matrix via an explicit-value pivot (the value
    list is fixed, so the plan is a single aggregation — no inference scan,
    stable column order)."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy(F.to_date("ts").cast("string").alias("day"))
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (day, type) combination never occurred
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _PIVOT_TYPES]
    )


ORACLE_PIVOT_EVENT_MATRIX = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY 1
"""


def q_unpivot_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of per-document stats (melt via stack: one
    projection, no join, no shuffle before the final ordering-free frame)."""
    d = load_table(spark, sf_dir, "documents")
    wide = d.select(
        "doc_id",
        F.length("text").cast("double").alias("n_chars"),
        F.size(F.split(F.col("text"), r"\s+")).cast("double").alias("n_ws_tokens"),
        F.size(F.split(F.col("text"), r"\.")).cast("double").alias("n_sentences"),
    )
    return wide.unpivot(
        "doc_id", ["n_chars", "n_ws_tokens", "n_sentences"], "stat", "stat_value"
    )


ORACLE_UNPIVOT_DOC_STATS = """
WITH wide AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,  -- chars, not strlen bytes
         CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_ws_tokens,
         CAST(len(string_split_regex(text, '\\.')) AS DOUBLE) AS n_sentences
  FROM documents
)
SELECT doc_id, stat, stat_value
FROM wide
UNPIVOT (stat_value FOR stat IN (n_chars, n_ws_tokens, n_sentences))
"""


# ---------------------------------------------------------------------------
# rollup / cube
# ---------------------------------------------------------------------------

def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts + revenue by (status, priority) with ROLLUP subtotals;
    grouping_id distinguishes the aggregation level (0=detail, 1=per-status,
    3=grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        quantize(F.sum("o_totalprice"), 2).alias("revenue"),
        F.grouping_id().alias("gid"),
    )


ORACLE_ROLLUP_ORDERS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       floor(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS revenue,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts over the full (event_type, weekday) CUBE — all four
    grouping sets in one Expand+aggregate plan."""
    e = load_table(spark, sf_dir, "events")
    wd = F.date_format("ts", "EEEE").alias("weekday")
    return e.cube(F.col("event_type"), wd).agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().alias("gid"),
    )


ORACLE_CUBE_EVENTS = """
SELECT event_type, strftime(ts, '%A') AS weekday, COUNT(*) AS n,
       CAST(GROUPING(event_type, strftime(ts, '%A')) AS BIGINT) AS gid
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%A'))
"""


# ---------------------------------------------------------------------------
# fuzzy matching (levenshtein with length-band blocking)
# ---------------------------------------------------------------------------

_FUZZY_PREFIX = 48
_FUZZY_MAXDIST = 12
_FUZZY_SAMPLE_MOD = 20


def q_fuzzy_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-match document pairs by edit distance on a text prefix.

    Blocking: candidates must share the same source and sit within one
    4-char length band (an equi-join key plus a band residual), so the
    quadratic levenshtein only runs inside blocks — the standard fuzzy-join
    shape that survives scale, vs an all-pairs cross join that cannot.
    A deterministic 1-in-N id sample bounds the demo block sizes; each
    sampled doc gains a 2-character-mutated twin (id+3000000) so real
    near-matches exist in the synthetic word-soup corpus.

    Normalization contract: non-ASCII characters fold to '?' before banding
    and distance. The distance is thereby defined in CHARACTERS on every
    engine — DuckDB's levenshtein counts UTF-8 BYTES (a 2-byte char
    substitution scores 2, and byte-length bands would even diverge the
    candidate pair set), so an unfolded prefix is not engine-portable."""
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _FUZZY_SAMPLE_MOD == 0)
        .select(
            "doc_id",
            "source",
            F.regexp_replace(
                F.substring("text", 1, _FUZZY_PREFIX), "[^\\x00-\\x7F]", "?"
            ).alias("prefix"),
        )
    )
    mutated = base.select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        "source",
        F.concat(
            F.substring("prefix", 1, 9),
            F.lit("Z"),
            F.substring("prefix", 11, 15),
            F.lit("Q"),
            F.substring("prefix", 27, _FUZZY_PREFIX),
        ).alias("prefix"),
    )
    d = base.unionByName(mutated).withColumn(
        "band", (F.length("prefix") / 4).cast("int")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("source").alias("src_a"),
        F.col("prefix").alias("pfx_a"),
        F.col("band").alias("band_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("source").alias("src_b"),
        F.col("prefix").alias("pfx_b"),
        F.col("band").alias("band_b"),
    )
    pairs = a.join(
        b,
        (F.col("src_a") == F.col("src_b"))
        & (F.col("band_a") == F.col("band_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.levenshtein("pfx_a", "pfx_b").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= _FUZZY_MAXDIST)


ORACLE_FUZZY_DOC_PAIRS = f"""
WITH base AS (
  -- ASCII fold mirrors the query's normalization contract: DuckDB's
  -- levenshtein counts UTF-8 bytes, Spark's counts characters; folding
  -- non-ASCII to '?' makes chars == bytes so the distance (and the length
  -- band) is the same metric on both engines
  SELECT doc_id, source,
         regexp_replace(substr(text, 1, {_FUZZY_PREFIX}),
                        '[^\\x00-\\x7F]', '?', 'g') AS prefix
  FROM documents WHERE doc_id % {_FUZZY_SAMPLE_MOD} = 0
),
u AS (
  SELECT doc_id, source, prefix FROM base
  UNION ALL
  SELECT doc_id + 3000000, source,
         substr(prefix, 1, 9) || 'Z' || substr(prefix, 11, 15) || 'Q'
           || substr(prefix, 27, {_FUZZY_PREFIX})
  FROM base
),
d AS (
  -- length() = characters, matching Spark's F.length: a bytes-based band
  -- (strlen) would block unicode prefixes differently per engine and the
  -- candidate PAIR SETS would diverge, not just a value
  SELECT doc_id, source, prefix,
         CAST(floor(length(prefix) / 4) AS INT) AS band
  FROM u
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS INT) AS edit_dist
FROM d a JOIN d b
  ON a.source = b.source AND a.band = b.band AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= {_FUZZY_MAXDIST}
"""


# ---------------------------------------------------------------------------
# bigram language model
# ---------------------------------------------------------------------------

def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram log-probability: corpus MLE
    P(w2|w1) = c(w1,w2)/c(w1,·) over adjacent token pairs — the second-order
    companion to the unigram LM quality signal. Bigram counts are map-side
    combined; the count dimension joins back on the bigram key (AQE picks
    broadcast when the bigram table fits)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
        ).alias("toks"),
    )
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # a 1-token doc must produce zero bigrams
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
    w1_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    lm = bg_counts.join(w1_counts, "w1").select(
        "w1", "w2", (F.log("c12") - F.log("c1")).alias("logp")
    )
    scored = (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.avg("logp").alias("avg_logp"), F.count(F.lit(1)).alias("n_bigrams"))
    )
    return scored.select(
        "doc_id", quantize(F.col("avg_logp"), 4).alias("avg_logp"), "n_bigrams"
    )


ORACLE_BIGRAM_LM = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')
           AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY 1),
lm AS (SELECT w1, w2, ln(c12) - ln(c1) AS logp FROM c12 JOIN c1 USING (w1))
SELECT bg.doc_id, floor(AVG(l.logp) * 10000.0 + 0.5) / 10000.0 AS avg_logp,
       COUNT(*) AS n_bigrams
FROM bg JOIN lm l ON bg.w1 = l.w1 AND bg.w2 = l.w2
GROUP BY bg.doc_id
"""


def window_analytics_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "win_event_deltas": q_win_event_deltas,
        "win_ntile_quartiles": q_win_ntile_quartiles,
        "win_cume_dist": q_win_cume_dist,
        "win_running_sum": q_win_running_sum,
        "pivot_event_matrix": q_pivot_event_matrix,
        "unpivot_doc_stats": q_unpivot_doc_stats,
        "rollup_orders": q_rollup_orders,
        "cube_events": q_cube_events,
        "fuzzy_doc_pairs": q_fuzzy_doc_pairs,
        "bigram_lm": q_bigram_lm,
    }


def window_analytics_oracles() -> dict[str, str]:
    return {
        "win_event_deltas": ORACLE_WIN_EVENT_DELTAS,
        "win_ntile_quartiles": ORACLE_WIN_NTILE_QUARTILES,
        "win_cume_dist": ORACLE_WIN_CUME_DIST,
        "win_running_sum": ORACLE_WIN_RUNNING_SUM,
        "pivot_event_matrix": ORACLE_PIVOT_EVENT_MATRIX,
        "unpivot_doc_stats": ORACLE_UNPIVOT_DOC_STATS,
        "rollup_orders": ORACLE_ROLLUP_ORDERS,
        "cube_events": ORACLE_CUBE_EVENTS,
        "fuzzy_doc_pairs": ORACLE_FUZZY_DOC_PAIRS,
        "bigram_lm": ORACLE_BIGRAM_LM,
    }
