"""Activity analytics + CDC diff queries.

Five operator classes over the realtime event stream / change feed that a
monitoring or training-data pipeline layers on top of the fan-out engine:

- trailing 7-day distinct active users per day (sliding distinct)
- per-group heavy hitters (exact top-k by frequency, deterministic ties)
- windowed first-occurrence dedup (keep earliest event per key per hour)
- CDC changed-column diff for UPDATE events (record vs old_record), the
  relational form of the reference's UpdatedRecord old/new comparison
  (lib/realtime/adapters/changes.ex:15-64 carries both maps; the reference
  leaves the diff to clients — we surface it as an operator)
- unigram language-model score per document (corpus LM -> per-doc avg log
  prob), a standard quality-filter signal for pretraining corpora

Scale notes (100 TB):
- active_users_7d: the raw stream is collapsed to distinct (day, user)
  FIRST (map-side combine), then each pair fans out x7 via a generated
  offset array — a map-only explode, no range join, one final shuffle
  keyed by day. A window-function sliding distinct would need a per-day
  sort of user sets; this shape never materializes a set.
- heavy hitters: two-level agg (count per (group, key) -> top-k window per
  group). The window partitions by event_type only AFTER counts collapsed
  the cardinality, so the sort input is |groups x distinct keys|, not
  |events|.
- window_dedup: row_number over (key, hour) — the partition key includes
  the time bucket, so state per partition is bounded by the bucket, and
  at 100 TB the shuffle is spread over (key x hour), never hot-keyed.
- changed_columns: pure per-row map expressions (zero shuffle, codegen'd
  higher-order filter over map keys).
- unigram LM: vocabulary agg is map-side combined; the token->logprob dim
  is vocabulary-sized (<< corpus) and broadcast back; per-doc agg is one
  shuffle keyed by doc_id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import ORDERS_CHANGES_SQL_CTE, load_table


# ---------------------------------------------------------------------------
# Trailing 7-day active users
# ---------------------------------------------------------------------------

def q_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        F.to_date("ts").alias("day"), F.col("user_id").alias("user")
    ).distinct()
    days = pairs.select("day").distinct()
    fanned = pairs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user"
    ).select(F.date_add("day", F.col("off")).alias("day"), "user")
    # keep only days that actually occur (the tail fans past max(day))
    out = fanned.join(days, "day").groupBy("day").agg(
        F.countDistinct("user").alias("active_7d")
    )
    return out.select(F.col("day").cast("string").alias("day"), "active_7d")


ORACLE_ACTIVE_USERS_7D = """
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events
),
days AS (SELECT DISTINCT day FROM pairs),
fanned AS (
  SELECT p.day + CAST(o.off AS INTEGER) AS day, p.u
  FROM pairs p CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
)
SELECT CAST(f.day AS VARCHAR) AS day, COUNT(DISTINCT f.u) AS active_7d
FROM fanned f JOIN days d ON f.day = d.day
GROUP BY f.day
"""


# ---------------------------------------------------------------------------
# Heavy hitters: top-5 users per event_type by event count
# ---------------------------------------------------------------------------

def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "user_id", "cnt", "rn")
    )


ORACLE_HEAVY_HITTERS = """
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY cnt DESC, user_id ASC) AS rn
  FROM counts
)
SELECT event_type, user_id, cnt, rn FROM r WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# Windowed first-occurrence dedup
# ---------------------------------------------------------------------------

def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", "ts")
    ).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


ORACLE_WINDOW_DEDUP = """
WITH r AS (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
SELECT event_id, user_id, event_type FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# CDC changed-columns diff (UPDATE events)
# ---------------------------------------------------------------------------

def changed_columns(record, old_record):
    """Sorted list of keys whose value differs (NULL-safe) between the new
    and old record maps — generic over any relation's dynamic schema.

    The key set is the UNION of both maps' keys, so a column present only on
    one side (e.g. dropped or added by a DDL change mid-stream) counts as
    changed rather than being silently missed."""
    all_keys = F.array_distinct(
        F.concat(F.map_keys(record), F.map_keys(old_record))
    )
    return F.array_sort(
        F.filter(
            all_keys,
            lambda k: ~F.element_at(record, k).eqNullSafe(
                F.element_at(old_record, k)
            ),
        )
    )


def q_cdc_changed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE changes carry both record and old_record; emit the per-change
    set of modified columns. Old values are derived deterministically so
    the oracle can state the expected diff directly:
      o_orderkey%3=0 -> old o_totalprice differed (+1.5)
      o_orderkey%3=1 -> old o_orderstatus was 'X'
      old o_nullable NULL iff key%5=0 (new NULL iff key%7=0)
    """
    from realtime_spark.sources.testdata import changes_from_orders

    changes = changes_from_orders(spark, sf_dir).filter(F.col("action") == "UPDATE")
    key = F.col("change_id")
    old = F.col("old_record")
    old = F.when(
        key % 3 == 0,
        F.map_concat(
            F.map_filter(old, lambda k, v: k != "o_totalprice"),
            F.create_map(
                F.lit("o_totalprice"),
                (F.element_at(F.col("record"), "o_totalprice").cast("double") + 1.5)
                .cast("string"),
            ),
        ),
    ).when(
        key % 3 == 1,
        F.map_concat(
            F.map_filter(old, lambda k, v: k != "o_orderstatus"),
            F.create_map(F.lit("o_orderstatus"), F.lit("X")),
        ),
    ).otherwise(old)
    # rebuild o_nullable on the OLD side with its own null rule
    old_nullable = F.when(
        key % 5 == 0, F.lit(None).cast("string")
    ).otherwise(F.element_at(F.col("record"), "o_orderpriority"))
    old = F.map_concat(
        F.map_filter(old, lambda k, v: k != "o_nullable"),
        F.map_from_arrays(F.array(F.lit("o_nullable")), F.array(old_nullable)),
    )
    diff = changed_columns(F.col("record"), old)
    return changes.select(
        "change_id",
        F.array_join(diff, ",").alias("changed_cols"),
        F.size(diff).alias("n_changed"),
    )


# Oracle relies on two generator invariants to state the expected diff in
# closed form: o_orderstatus is never 'X' (TPC-H statuses are O/F/P), and
# o_totalprice is NOT NULL — so the %3=1 status swap and the %3=0 price bump
# are always real changes. If the generator ever changes either invariant,
# recompute the diff null-safely instead of hardcoding it.
ORACLE_CDC_CHANGED_COLUMNS = f"""
WITH {ORDERS_CHANGES_SQL_CTE.strip()}
SELECT change_id,
  concat_ws(',',
    CASE WHEN (change_id % 5 = 0) <> (change_id % 7 = 0) THEN 'o_nullable' END,
    CASE WHEN change_id % 3 = 1 THEN 'o_orderstatus' END,
    CASE WHEN change_id % 3 = 0 THEN 'o_totalprice' END) AS changed_cols,
  (CASE WHEN (change_id % 5 = 0) <> (change_id % 7 = 0) THEN 1 ELSE 0 END
   + CASE WHEN change_id % 3 IN (0, 1) THEN 1 ELSE 0 END) AS n_changed
FROM _orders_changes WHERE action = 'UPDATE'
"""


# ---------------------------------------------------------------------------
# Unigram LM quality score
# ---------------------------------------------------------------------------

def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (F.log(F.col("cnt")) - F.log(F.col("total"))).alias("logp")
    )
    # no explicit broadcast hint on lm: at test SF it is tiny, but a real
    # 100 TB corpus' distinct-token table (typos, numbers, hashes) can reach
    # hundreds of millions of rows and exceed broadcast limits — AQE picks
    # broadcast when the vocabulary actually fits, shuffle join otherwise
    scored = (
        toks.join(lm, "tok")
        .groupBy("doc_id")
        .agg(F.avg("logp").alias("avg_logp"), F.count(F.lit(1)).alias("n_tok"))
    )
    return scored.select(
        "doc_id", quantize(F.col("avg_logp"), 4).alias("avg_logp"), "n_tok"
    )


ORACLE_UNIGRAM_LM = """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok) t
  WHERE t.tok <> ''
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT SUM(cnt) AS total FROM vocab),
lm AS (SELECT tok, ln(cnt) - ln(total) AS logp FROM vocab CROSS JOIN total),
scored AS (
  SELECT t.doc_id, AVG(l.logp) AS avg_logp, COUNT(*) AS n_tok
  FROM toks t JOIN lm l USING (tok) GROUP BY t.doc_id
)
SELECT doc_id, floor(avg_logp * 10000.0 + 0.5) / 10000.0 AS avg_logp, n_tok
FROM scored
"""


def activity_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "active_users_7d": q_active_users_7d,
        "heavy_hitters": q_heavy_hitters,
        "window_dedup": q_window_dedup,
        "cdc_changed_columns": q_cdc_changed_columns,
        "unigram_lm": q_unigram_lm,
    }


def activity_oracles() -> dict[str, str]:
    return {
        "active_users_7d": ORACLE_ACTIVE_USERS_7D,
        "heavy_hitters": ORACLE_HEAVY_HITTERS,
        "window_dedup": ORACLE_WINDOW_DEDUP,
        "cdc_changed_columns": ORACLE_CDC_CHANGED_COLUMNS,
        "unigram_lm": ORACLE_UNIGRAM_LM,
    }
