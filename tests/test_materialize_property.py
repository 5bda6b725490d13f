"""Differential property test for change-feed materialization: hypothesis
drives random change sequences (inserts/updates/deletes, duplicate
versions, shuffled arrival order, cross-batch splits) through both

  1. materialize_latest (the distributed max_by fold), and
  2. a 10-line pure-Python reference fold,

and also checks the streaming decomposition law: folding two halves with
tombstones kept, then merge_snapshots, must equal folding the whole."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from realtime_spark.operators.materialize import materialize_latest, merge_snapshots

_SCHEMA = (
    "change_id bigint, seq bigint, action string, schema_name string, "
    "table_name string, commit_timestamp timestamp, "
    "record map<string,string>, old_record map<string,string>, "
    "pk array<string>"
)

# a change: (key 0-3, ts-hour 0-3, seq 0-5, action, value 0-9)
_change = st.tuples(
    st.integers(0, 3),
    st.integers(0, 3),
    st.integers(0, 5),
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.integers(0, 9),
)


def _df(spark, changes):
    rows = []
    for key, hour, seq, action, val in changes:
        rec = {"id": str(key), "v": str(val)}
        rows.append(
            {
                "change_id": key,
                "seq": seq,
                "action": action,
                "schema_name": "public",
                "table_name": "t",
                "commit_timestamp": dt.datetime(2026, 1, 1, hour),
                "record": None if action == "DELETE" else rec,
                "old_record": rec if action != "INSERT" else None,
                "pk": ["id"],
            }
        )
    return spark.createDataFrame(rows, _SCHEMA)


def _py_fold(changes):
    """Reference fold: winner per key by (ts, seq). Inputs are pre-deduped
    by _canon so (key, ts, seq) is unique and the winner is unambiguous."""
    best = {}
    for key, hour, seq, action, val in changes:
        cur = best.get(key)
        if cur is None or (hour, seq) > (cur[0], cur[1]):
            best[key] = (hour, seq, action, val)
    return {
        str(k): (v[2], str(v[3]))
        for k, v in best.items()
        if v[2] != "DELETE"
    }


def _canon(changes):
    """Collapse exact (key, ts, seq) version collisions to one winner so the
    distributed fold (arbitrary tie choice) and the Python fold agree."""
    seen = {}
    for c in changes:
        k = (c[0], c[1], c[2])
        if k not in seen or (c[3], c[4]) > (seen[k][3], seen[k][4]):
            seen[k] = c
    return list(seen.values())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_change, min_size=1, max_size=24))
def test_fold_matches_python_reference(spark, changes):
    changes = _canon(changes)
    out = materialize_latest(_df(spark, changes))
    got = {
        r["pk_text"]: (r["last_action"], r["record"]["v"]) for r in out.collect()
    }
    assert got == _py_fold(changes)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_change, min_size=2, max_size=24), st.integers(1, 23))
def test_split_fold_merge_equals_whole_fold(spark, changes, cut):
    changes = _canon(changes)
    cut = min(cut, len(changes) - 1) or 1
    a, b = changes[:cut], changes[cut:]
    if not a or not b:
        return
    whole = materialize_latest(_df(spark, changes), keep_tombstones=True)
    merged = merge_snapshots(
        materialize_latest(_df(spark, a), keep_tombstones=True),
        materialize_latest(_df(spark, b), keep_tombstones=True),
    )
    as_map = lambda df: {
        r["pk_text"]: (r["last_action"], r["last_ts"], r["last_seq"], r["n_versions"])
        for r in df.collect()
    }
    assert as_map(whole) == as_map(merged)
