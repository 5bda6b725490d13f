"""Replica-state merge for presence — the batch analog of Phoenix.Tracker
replication (reference: lib/realtime_web/channels/presence.ex:1-12; state
replicates across nodes via pubsub and merges CRDT-style, SURVEY §3.3).

Model: each replica holds per-(topic, presence_key) entries stamped with
(node_id, seq) — node-local monotone sequence numbers, the per-replica
analog of Tracker's vector clock dots. Merge semantics (last-writer-wins
ORSWOT collapse, deterministic):

  1. per (topic, key, node): the node's LAST op wins (max seq) — a node
     can only advance its own history;
  2. across nodes: the entry with the greatest (seq, node_id) wins — the
     same total order Tracker uses to break concurrent-update ties
     deterministically;
  3. a winning `untrack` is a tombstone: the key is absent from the
     merged membership (observed-remove).

Both steps are `max_by` aggregations — map-side combinable, one shuffle
keyed by (topic, key); replica count multiplies rows, not shuffles. The
diff emission (`merge_diffs`) is a full-outer join of the local replica's
live view against the merged view on the same key — Catalyst reuses the
(topic, key) partitioning from the merge aggregation, so the join adds no
exchange on the merged side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ("topic", "presence_key")


def merge_replicas(states: DataFrame) -> DataFrame:
    """states: (topic, presence_key, node_id, seq, op ['track'|'untrack'],
    meta) rows pooled from any number of replicas (duplicates across
    replicas are fine — identical (node, seq) entries are idempotent).

    Returns the merged live membership: (topic, presence_key, meta,
    node_id, seq) of each key's winning track."""
    per_node = states.groupBy(*KEY, "node_id").agg(
        F.max_by(F.struct("op", "meta", "seq"), "seq").alias("last")
    )
    winner = per_node.groupBy(*KEY).agg(
        F.max_by(
            F.struct(
                F.col("last.op").alias("op"),
                F.col("last.meta").alias("meta"),
                F.col("node_id").alias("node_id"),
                F.col("last.seq").alias("seq"),
            ),
            F.struct(F.col("last.seq").alias("seq"), F.col("node_id").alias("node_id")),
        ).alias("w")
    )
    return winner.filter(F.col("w.op") == "track").select(
        *KEY,
        F.col("w.meta").alias("meta"),
        F.col("w.node_id").alias("node_id"),
        F.col("w.seq").alias("seq"),
    )


def merge_diffs(local_live: DataFrame, merged: DataFrame) -> DataFrame:
    """Join/leave/update diffs a replica must apply to converge on the
    merged state — what Tracker broadcasts as presence_diff after a
    replica sync (reference: presence_handler.ex:122-178).

    local_live: (topic, presence_key, meta); merged: merge_replicas output.
    Output: (topic, presence_key, kind ['join'|'leave'|'update'], meta)
    where meta is the post-merge meta for join/update, the departed meta
    for leave."""
    # explicit presence flags: meta is a legitimate NULL value, so testing
    # l_meta/m_meta nullness would classify a null-meta local entry as a
    # cluster-wide 'join' even when the merged state dropped it ('leave')
    l = local_live.select(
        *KEY, F.col("meta").alias("l_meta"), F.lit(True).alias("l_present")
    )
    m = merged.select(
        *KEY, F.col("meta").alias("m_meta"), F.lit(True).alias("m_present")
    )
    j = l.join(m, list(KEY), "full_outer")
    kind = (
        F.when(F.col("l_present").isNull(), F.lit("join"))
        .when(F.col("m_present").isNull(), F.lit("leave"))
        .when(~F.col("l_meta").eqNullSafe(F.col("m_meta")), F.lit("update"))
    )
    return (
        j.withColumn("kind", kind)
        .filter(F.col("kind").isNotNull())
        .select(
            *KEY,
            "kind",
            F.coalesce("m_meta", "l_meta").alias("meta"),
        )
    )
