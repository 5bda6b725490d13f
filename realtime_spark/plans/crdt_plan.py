"""Replica-merge (CRDT) presence queries, derived deterministically from
the events table: topic=event_type, key=user_id, node=event_id%3,
seq=event_id, op=untrack on event_id%5==0 (the same presence fixture shape
realtime_extra uses), meta=props[0:16]."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.crdt import merge_diffs, merge_replicas
from realtime_spark.sources.testdata import load_table


def replica_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_type").alias("topic"),
        F.col("user_id").cast("string").alias("presence_key"),
        (F.col("event_id") % 3).cast("int").alias("node_id"),
        F.col("event_id").cast("long").alias("seq"),
        F.when(F.col("event_id") % 5 == 0, F.lit("untrack"))
        .otherwise(F.lit("track"))
        .alias("op"),
        F.substring("props", 1, 16).alias("meta"),
    )


_STATES_CTE = """
_states AS (
  SELECT event_type AS topic,
         CAST(user_id AS VARCHAR) AS presence_key,
         CAST(event_id % 3 AS INT) AS node_id,
         event_id AS seq,
         CASE WHEN event_id % 5 = 0 THEN 'untrack' ELSE 'track' END AS op,
         substr(props, 1, 16) AS meta
  FROM events
),
_per_node AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY topic, presence_key, node_id
                                 ORDER BY seq DESC) AS rn
    FROM _states) WHERE rn = 1
),
_merged AS (
  SELECT topic, presence_key, meta, node_id, seq FROM (
    SELECT *, row_number() OVER (PARTITION BY topic, presence_key
                                 ORDER BY seq DESC, node_id DESC) AS rn2
    FROM _per_node) WHERE rn2 = 1 AND op = 'track'
)
"""


def q_presence_replica_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged cluster-wide membership from all three node replicas."""
    return merge_replicas(replica_states(spark, sf_dir))


ORACLE_PRESENCE_REPLICA_MERGE = f"""
WITH {_STATES_CTE.strip()}
SELECT topic, presence_key, meta, node_id, seq FROM _merged
"""


def q_presence_merge_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The presence_diff node 0 must apply to converge: its own live view
    vs the merged membership."""
    states = replica_states(spark, sf_dir)
    local = (
        merge_replicas(states.filter(F.col("node_id") == 0))
        .select("topic", "presence_key", "meta")
    )
    merged = merge_replicas(states)
    return merge_diffs(local, merged)


ORACLE_PRESENCE_MERGE_DIFFS = f"""
WITH {_STATES_CTE.strip()},
_local AS (
  SELECT topic, presence_key, meta FROM (
    SELECT *, row_number() OVER (PARTITION BY topic, presence_key
                                 ORDER BY seq DESC) AS lrn
    FROM _states WHERE node_id = 0) WHERE lrn = 1 AND op = 'track'
)
SELECT COALESCE(l.topic, m.topic) AS topic,
       COALESCE(l.presence_key, m.presence_key) AS presence_key,
       CASE WHEN l.presence_key IS NULL THEN 'join'
            WHEN m.presence_key IS NULL THEN 'leave'
            WHEN l.meta IS DISTINCT FROM m.meta THEN 'update' END AS kind,
       COALESCE(m.meta, l.meta) AS meta
FROM _local l FULL OUTER JOIN _merged m
  ON l.topic = m.topic AND l.presence_key = m.presence_key
WHERE CASE WHEN l.presence_key IS NULL THEN 'join'
           WHEN m.presence_key IS NULL THEN 'leave'
           WHEN l.meta IS DISTINCT FROM m.meta THEN 'update' END IS NOT NULL
"""


def crdt_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "presence_replica_merge": q_presence_replica_merge,
        "presence_merge_diffs": q_presence_merge_diffs,
    }


def crdt_oracles() -> dict[str, str]:
    return {
        "presence_replica_merge": ORACLE_PRESENCE_REPLICA_MERGE,
        "presence_merge_diffs": ORACLE_PRESENCE_MERGE_DIFFS,
    }
