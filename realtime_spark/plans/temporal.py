"""Temporal join queries: as-of join, broadcast band (range) join, and a
bucketed interval self-join — operator classes absent from the reference
(its only range predicate is the replay window, messages.ex:49-58) but
core to event analytics, re-expressed in scale-safe Spark shapes.

Scale notes (100 TB):
- as-of join: one shuffle per input on the join key; no range explosion
  (operators/asof.py).
- band join: the band dimension is tiny -> broadcast nested-loop with a
  between predicate, zero shuffle of the fact side beyond the final agg.
- interval self-join: candidate pairs come from an equi join on
  (user, hour-bucket) — the classic bucketing trick that turns an
  inequality join into an equi join plus residual filter, so Spark picks
  a hash join instead of a cartesian/BNLJ. Bucket width = interval width
  so each probe row explodes to exactly 2 buckets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.functions.timeutil import epoch_seconds
from realtime_spark.operators.asof import asof_join, hour_bucket
from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import load_table

_SQL_Q2 = "floor({expr} * 100.0 + 0.5) / 100.0"
_SQL_Q4 = "floor({expr} * 10000.0 + 0.5) / 10000.0"


# ---------------------------------------------------------------------------
# As-of join: each event sees the same user's most recent prior-or-equal
# purchase value. DuckDB oracle uses its native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------

def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        # dedupe per (user, ts) for deterministic tie handling
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max_by("value", "event_id").alias("last_purchase_value"))
    )
    out = asof_join(
        events,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        value_cols=["last_purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        quantize(F.col("last_purchase_value"), 4).alias("last_purchase_value"),
    )


ORACLE_ASOF_LAST_PURCHASE = f"""
WITH purchases AS (
  SELECT user_id, ts AS p_ts, arg_max(value, event_id) AS pv
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id,
       {_SQL_Q4.format(expr="p.pv")} AS last_purchase_value
FROM events e
ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND e.ts >= p.p_ts
"""


# ---------------------------------------------------------------------------
# Broadcast band join: lineitem priced into 10k-wide revenue bands via a
# non-equi join against a generated band dimension.
# ---------------------------------------------------------------------------

_N_BANDS = 11
_BAND_W = 10_000.0


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    bands = spark.range(_N_BANDS).select(
        F.col("id").cast("int").alias("band"),
        (F.col("id") * _BAND_W).alias("lo"),
        ((F.col("id") + 1) * _BAND_W).alias("hi"),
    )
    j = l.join(
        F.broadcast(bands),
        (l["l_extendedprice"] >= F.col("lo")) & (l["l_extendedprice"] < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_items"),
        quantize(F.sum("l_extendedprice"), 2).alias("band_revenue"),
    )


ORACLE_RANGE_BAND_JOIN = f"""
WITH bands AS (
  SELECT CAST(i AS INTEGER) AS band, i * {_BAND_W} AS lo, (i + 1) * {_BAND_W} AS hi
  FROM range({_N_BANDS}) t(i)
)
SELECT band, COUNT(*) AS n_items,
       {_SQL_Q2.format(expr="SUM(l_extendedprice)")} AS band_revenue
FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band
"""


# ---------------------------------------------------------------------------
# Bucketed interval self-join: per purchase, how many same-user events
# follow within 1 hour. Candidates from an equi join on (user, hour
# bucket) with the purchase side exploded to its 2 covering buckets, then
# the exact (ts, ts+1h] residual filter. Zero-follower purchases are kept
# via a left join back.
# ---------------------------------------------------------------------------

def q_interval_follow_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    p_exp = purchases.withColumn(
        "bucket", F.explode(F.array(hour_bucket(F.col("p_ts")), hour_bucket(F.col("p_ts")) + 1))
    )
    e = events.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    ).withColumn("bucket", hour_bucket(F.col("e_ts")))
    cand = p_exp.join(
        e,
        (F.col("p_user") == F.col("e_user")) & (p_exp["bucket"] == e["bucket"]),
        "inner",
    ).filter(
        (F.col("e_ts") > F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    counts = cand.groupBy(F.col("p_id").alias("c_id")).agg(
        F.count(F.lit(1)).alias("n_follow")
    )
    return purchases.join(
        counts, purchases["p_id"] == counts["c_id"], "left_outer"
    ).select(
        F.col("p_id").alias("event_id"),
        F.col("p_user").alias("user_id"),
        F.coalesce(F.col("n_follow"), F.lit(0)).alias("n_follow"),
    )


ORACLE_INTERVAL_FOLLOW_COUNT = """
SELECT p.event_id, p.user_id,
       (SELECT COUNT(*) FROM events e
        WHERE e.user_id = p.user_id
          AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR) AS n_follow
FROM events p WHERE p.event_type = 'purchase'
"""


def temporal_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_last_purchase": q_asof_last_purchase,
        "range_band_join": q_range_band_join,
        "interval_follow_count": q_interval_follow_count,
        "stream_interval_join": q_stream_interval_join,
        "delivery_latency": q_delivery_latency,
        "delivery_latency_pcts": q_delivery_latency_pcts,
    }


def temporal_oracles() -> dict[str, str]:
    return {
        "asof_last_purchase": ORACLE_ASOF_LAST_PURCHASE,
        "range_band_join": ORACLE_RANGE_BAND_JOIN,
        "interval_follow_count": ORACLE_INTERVAL_FOLLOW_COUNT,
        "stream_interval_join": ORACLE_STREAM_INTERVAL_JOIN,
        "delivery_latency": ORACLE_DELIVERY_LATENCY,
        "delivery_latency_pcts": _oracle_latency_pcts(),
    }


# ---------------------------------------------------------------------------
# Stream-stream interval join (streaming/joins.py): the SAME operator runs
# on batch inputs (this oracle-checked query) and on two watermarked streams
# (tests/test_streaming.py::test_interval_join_streaming) — batch is the
# oracle for the streaming run.
# ---------------------------------------------------------------------------

def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks followed by a purchase of the same user within 1 hour."""
    from realtime_spark.streaming.joins import interval_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    j = interval_join(
        clicks, purchases, key="user_id", horizon="3600 seconds"
    )
    return j.select(
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        "user_id",
        (epoch_seconds("r_ts") - epoch_seconds("l_ts")).alias("delay_s"),
    )


ORACLE_STREAM_INTERVAL_JOIN = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS delay_s
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 3600 SECOND
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def q_delivery_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-to-dispatch latency telemetry (replication_connection.ex:442-448)
    over a derived send/deliver pair of flows: sends are click events; the
    delivery of msg event_id arrives event_id%7 seconds later, and messages
    with event_id%3=0 are never delivered (they age out of join state)."""
    from realtime_spark.streaming.joins import delivery_latency

    events = load_table(spark, sf_dir, "events")
    sends = events.filter(F.col("event_type") == "click").select(
        (F.col("user_id") % 20).cast("string").alias("topic"),
        F.col("event_id").alias("msg_id"),
        "ts",
    )
    delivers = (
        events.filter((F.col("event_type") == "click") & (F.col("event_id") % 3 != 0))
        .select(
            (F.col("user_id") % 20).cast("string").alias("topic"),
            F.col("event_id").alias("msg_id"),
            (F.col("ts") + F.make_interval(secs=(F.col("event_id") % 7).cast("double"))).alias("ts"),
        )
    )
    out = delivery_latency(sends, delivers, horizon="60 seconds")
    return out.select(
        "topic",
        "msg_id",
        "latency_ms",
    )


ORACLE_DELIVERY_LATENCY = """
SELECT CAST(user_id % 20 AS VARCHAR) AS topic, event_id AS msg_id,
       (event_id % 7) * 1000 AS latency_ms
FROM events
WHERE event_type = 'click' AND event_id % 3 <> 0
"""


def q_delivery_latency_pcts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-topic latency percentiles over the commit-to-dispatch telemetry
    (the SLO view on top of q_delivery_latency): exact interpolated
    percentile of latency_ms per topic, quantized — the number the
    reference's telemetry dashboards aggregate from the per-message
    measurements (replication_connection.ex:442-448)."""
    from realtime_spark.operators.text import corpus_percentiles

    lat = q_delivery_latency(spark, sf_dir)
    return corpus_percentiles(lat, ["topic"], "latency_ms", (0.5, 0.95, 0.99))


def _oracle_latency_pcts() -> str:
    def q(p):
        return (
            f"floor(quantile_cont(latency_ms, {p}) * 10000.0 + 0.5) / 10000.0"
        )

    return f"""
WITH lat AS ({ORACLE_DELIVERY_LATENCY.strip()})
SELECT topic, COUNT(*) AS n_rows,
       {q(0.5)} AS p50_latency_ms,
       {q(0.95)} AS p95_latency_ms,
       {q(0.99)} AS p99_latency_ms
FROM lat GROUP BY topic
"""
