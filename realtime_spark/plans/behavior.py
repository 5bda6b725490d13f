"""Behavioral analytics + retrieval plans: Markov transition modeling, exact
OLS trends, CUSUM changepoints, histogram quantiles, positional phrase
search, feature-hashed embedding retrieval, real WAV PCM decode statistics,
and shingle-novelty scoring.

Every query here is oracle-checked: all aggregation-order-sensitive math is
integer-exact (cents scaling, scaled deviations, md5 hashes, micro-unit
iteration), with doubles only in final single-value steps mirrored
expression-for-expression in the DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_spark.operators.sketches import sql_stable_hash
from realtime_spark.sources.testdata import load_table

# DuckDB fragments shared with plans.training
SQL_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_TRANS_CTE = """
p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS cnt
  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# Markov transitions + stationary distribution
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.markov import transitions

    e = load_table(spark, sf_dir, "events")
    return transitions(e)


ORACLE_EVENT_TRANSITIONS = f"""
WITH {_TRANS_CTE.strip()}
SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
       floor(CAST(cnt AS DOUBLE)
             / CAST(SUM(cnt) OVER (PARTITION BY from_type) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS p
FROM c
"""

_MK_ITERS = 6


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run event-type share by exact-integer power iteration over the
    empirical transition matrix (same micro-unit floor-div scheme as
    graph.pagerank; the oracle unrolls the iterations as chained CTEs)."""
    from realtime_spark.operators.markov import stationary_distribution, transitions

    e = load_table(spark, sf_dir, "events")
    return stationary_distribution(transitions(e), iterations=_MK_ITERS)


def _oracle_markov() -> str:
    head = f"""
WITH {_TRANS_CTE.strip()},
tr AS (SELECT from_type AS s, to_type AS t, cnt FROM c),
outs AS (SELECT s, SUM(cnt) AS outc FROM tr GROUP BY s),
states AS (SELECT DISTINCT s AS state FROM tr
           UNION SELECT DISTINCT t AS state FROM tr),
x0 AS (SELECT state, CAST(1000000 AS BIGINT) AS mass FROM states)"""
    parts = [head]
    for i in range(_MK_ITERS):
        parts.append(f""",
f{i + 1} AS (
  SELECT tr.t AS state, SUM((x.mass * tr.cnt) // o.outc) AS m
  FROM tr JOIN outs o USING (s) JOIN x{i} x ON x.state = tr.s
  GROUP BY tr.t
),
k{i + 1} AS (
  SELECT x.state, x.mass FROM x{i} x
  WHERE x.state NOT IN (SELECT s FROM tr)
),
x{i + 1} AS (
  SELECT st.state,
         CAST(COALESCE(f.m, 0) + COALESCE(k.mass, 0) AS BIGINT) AS mass
  FROM states st LEFT JOIN f{i + 1} f USING (state)
  LEFT JOIN k{i + 1} k USING (state)
)""")
    return (
        "".join(parts)
        + f"\nSELECT state, mass AS mass_micro FROM x{_MK_ITERS}"
    )


# ---------------------------------------------------------------------------
# OLS trend per event type
# ---------------------------------------------------------------------------

_OLS_DIGITS = 8


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.stats import ols_trend

    e = load_table(spark, sf_dir, "events")
    return ols_trend(e, ["event_type"], round_digits=_OLS_DIGITS)


ORACLE_OLS_TREND = """
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM b GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)
             * 100000000.0 + 0.5) / 100000000.0 AS slope_cents_per_sec,
       floor(CAST(sxx * sy - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)
             * 100000000.0 + 0.5) / 100000000.0 AS intercept_cents
FROM s
"""


# ---------------------------------------------------------------------------
# CUSUM changepoints over hourly counts
# ---------------------------------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.stats import cusum_hours

    e = load_table(spark, sf_dir, "events")
    return cusum_hours(e, ["event_type"], threshold_hours=3)


ORACLE_CUSUM = """
WITH h AS (
  SELECT event_type,
         CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) / 3600)
              AS BIGINT) AS hour
  FROM events
),
hourly AS (SELECT event_type, hour, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
st AS (
  SELECT *, COUNT(*) OVER (PARTITION BY event_type) AS h_obs,
         SUM(cnt) OVER (PARTITION BY event_type) AS total
  FROM hourly
),
cum AS (
  SELECT event_type, hour, cnt, total,
         SUM(cnt * h_obs - total) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS UNBOUNDED PRECEDING) AS u
  FROM st
),
s AS (
  SELECT event_type, hour, cnt, total,
         u - MIN(u) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS UNBOUNDED PRECEDING) AS cusum
  FROM cum
)
SELECT event_type, hour, CAST(cnt AS BIGINT) AS cnt,
       CAST(cusum AS BIGINT) AS cusum_scaled,
       cusum > 3 * total AS flagged
FROM s
"""


# ---------------------------------------------------------------------------
# histogram quantiles
# ---------------------------------------------------------------------------

_HQ_LO, _HQ_HI, _HQ_BINS = 0.0, 500.0, 50
_HQ_QS = (0.5, 0.9, 0.99)


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.stats import histogram_quantiles

    e = load_table(spark, sf_dir, "events")
    return histogram_quantiles(
        e, "value", _HQ_LO, _HQ_HI, _HQ_BINS, _HQ_QS, keys=["event_type"]
    )


ORACLE_HIST_QUANTILES = f"""
WITH bins AS (
  SELECT event_type,
         CAST(least(greatest(floor((value - {_HQ_LO}) / 10.0), 0),
                    {_HQ_BINS - 1}) AS BIGINT) AS bin
  FROM events
),
counts AS (SELECT event_type, bin, COUNT(*) AS c FROM bins GROUP BY 1, 2),
cum AS (
  SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                         ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM counts
),
qrows AS (
  SELECT cum.*, q.q, CAST(ceil(q.q * cum.n) AS BIGINT) AS target
  FROM cum CROSS JOIN (VALUES {", ".join(f"({q})" for q in _HQ_QS)}) AS q(q)
),
hit AS (
  SELECT * FROM qrows WHERE cum >= target AND cum - c < target
)
SELECT event_type, q,
       floor(({_HQ_LO} + (CAST(bin AS DOUBLE)
              + CAST(target - (cum - c) AS DOUBLE) / CAST(c AS DOUBLE))
              * 10.0) * 10000.0 + 0.5) / 10000.0 AS est,
       CAST(n AS BIGINT) AS n
FROM hit
"""


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

_PHRASE = ("table", "hash")


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.search import phrase_hits, positional_postings

    d = load_table(spark, sf_dir, "documents")
    post = positional_postings(d, "doc_id", "text")
    return phrase_hits(post, _PHRASE)


ORACLE_PHRASE_SEARCH = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id AS doc, COUNT(*) AS n_hits
FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
WHERE toks[i] = '{_PHRASE[0]}' AND toks[i + 1] = '{_PHRASE[1]}'
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# feature-hashed embedding retrieval
# ---------------------------------------------------------------------------

_HE_DIM = 16
_HE_QUERIES = (0, 1, 2)
_HE_K = 10


def q_hash_embed_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.similarity import hash_embed_topk, hashed_embedding

    d = load_table(spark, sf_dir, "documents")
    vecs = hashed_embedding(d, "doc_id", "text", dim=_HE_DIM)
    return hash_embed_topk(vecs, _HE_QUERIES, k=_HE_K)


def _oracle_hash_embed() -> str:
    h0 = sql_stable_hash("tok", "0", _HE_DIM)
    h1 = sql_stable_hash("tok", "1", 2)
    qlist = ", ".join(str(q) for q in _HE_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id AS doc, t.tok
  FROM documents,
       LATERAL (SELECT unnest({SQL_TOKS}) AS tok) t
),
v AS (
  SELECT doc, {h0} AS bucket, SUM(({h1}) * 2 - 1) AS w
  FROM toks GROUP BY 1, 2 HAVING SUM(({h1}) * 2 - 1) <> 0
),
norms AS (SELECT doc, SUM(w * w) AS n2 FROM v GROUP BY doc),
q AS (SELECT doc AS qdoc, bucket, w AS qw FROM v WHERE doc IN ({qlist})),
dots AS (
  SELECT q.qdoc, v.doc, SUM(v.w * q.qw) AS dot
  FROM v JOIN q USING (bucket) WHERE v.doc <> q.qdoc
  GROUP BY 1, 2
),
scored AS (
  SELECT d.qdoc, d.doc,
         floor(CAST(d.dot AS DOUBLE)
               / sqrt(CAST(n.n2 AS DOUBLE) * CAST(qn.n2 AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS cos
  FROM dots d
  JOIN norms n ON n.doc = d.doc
  JOIN norms qn ON qn.doc = d.qdoc
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qdoc
                               ORDER BY cos DESC, doc ASC) AS rank
  FROM scored
)
SELECT qdoc AS query_doc, CAST(rank AS INTEGER) AS rank, doc, cos
FROM ranked WHERE rank <= {_HE_K}
"""


# ---------------------------------------------------------------------------
# WAV PCM decode statistics (real stdlib codec)
# ---------------------------------------------------------------------------


def q_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode deterministic 8-bit PCM WAV per embedding id, decode it back
    with the stdlib `wave` codec, and reduce to exact-integer sample stats.
    The oracle replays the synthesis formula in closed form — so the whole
    bytes-in/samples-out decode path is value-checked, not just smoked."""
    from realtime_spark.operators.multimodal import synth_wav, wav_pcm_stats

    ids = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("media_id")
    )
    return wav_pcm_stats(synth_wav(ids))


ORACLE_AUDIO_PCM = """
WITH ids AS (SELECT vec_id AS media_id, 800 + vec_id % 100 AS n FROM embeddings),
s AS (
  SELECT media_id, n, (media_id * 7 + i * 13) % 256 AS samp
  FROM ids, LATERAL (SELECT unnest(range(0, n)) AS i)
)
SELECT media_id, CAST(n AS BIGINT) AS n_samples,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(SUM(samp) AS BIGINT) AS sum_amp,
       CAST(SUM((samp - 128) * (samp - 128)) AS BIGINT) AS sum_sq_dev
FROM s GROUP BY media_id, n
"""


# ---------------------------------------------------------------------------
# shingle novelty
# ---------------------------------------------------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.dedup import shingle_novelty

    d = load_table(spark, sf_dir, "documents")
    return shingle_novelty(d, "doc_id", "text", k=3)


ORACLE_NGRAM_NOVELTY = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
t2 AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
         ELSE [] END AS sh
  FROM t
),
sx AS (
  SELECT doc_id AS doc,
         ('0x' || substr(md5(u.s), 1, 15))::BIGINT AS d
  FROM t2, LATERAL (SELECT unnest(sh) AS s) u
),
first AS (SELECT d, MIN(doc) AS first_doc FROM sx GROUP BY d),
c AS (
  SELECT doc, COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN first_doc = doc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM sx JOIN first USING (d) GROUP BY doc
)
SELECT doc, n_shingles, n_novel,
       floor(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS novelty
FROM c
"""


# ---------------------------------------------------------------------------
# first/last-touch attribution
# ---------------------------------------------------------------------------


def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: the user's first and most recent preceding
    non-purchase event types (first-touch / last-touch attribution) —
    ignore-nulls window functions over the strictly-prior frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    out = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.first(non_purchase, ignorenulls=True).over(w).alias("first_touch"),
        F.last(non_purchase, ignorenulls=True).over(w).alias("last_touch"),
    )
    return out.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "first_touch", "last_touch"
    )


ORACLE_ATTRIBUTION = """
WITH w AS (
  SELECT event_id, user_id, event_type,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS first_touch,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM events
)
SELECT event_id, user_id, first_touch, last_touch
FROM w WHERE event_type = 'purchase'
"""


def behavior_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "event_transitions": q_event_transitions,
        "markov_stationary": q_markov_stationary,
        "ols_trend": q_ols_trend,
        "cusum_changepoint": q_cusum_changepoint,
        "hist_quantiles": q_hist_quantiles,
        "phrase_search": q_phrase_search,
        "hash_embed_retrieval": q_hash_embed_retrieval,
        "audio_pcm_stats": q_audio_pcm_stats,
        "ngram_novelty": q_ngram_novelty,
        "attribution_touch": q_attribution_touch,
    }


def behavior_oracles() -> dict[str, str]:
    return {
        "event_transitions": ORACLE_EVENT_TRANSITIONS,
        "markov_stationary": _oracle_markov(),
        "ols_trend": ORACLE_OLS_TREND,
        "cusum_changepoint": ORACLE_CUSUM,
        "hist_quantiles": ORACLE_HIST_QUANTILES,
        "phrase_search": ORACLE_PHRASE_SEARCH,
        "hash_embed_retrieval": _oracle_hash_embed(),
        "audio_pcm_stats": ORACLE_AUDIO_PCM,
        "ngram_novelty": ORACLE_NGRAM_NOVELTY,
        "attribution_touch": ORACLE_ATTRIBUTION,
    }
