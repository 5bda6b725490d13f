"""asof_join semantics: inclusive vs strict ties, no-prior NULL, per-key
isolation (operators/asof.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from realtime_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T00:00:30")),
            (2, "u1", _ts("2024-01-01T00:01:00")),  # ties a right row
            (3, "u1", _ts("2024-01-01T00:00:05")),  # before any right row
            (4, "u2", _ts("2024-01-01T09:00:00")),  # other key
        ],
        "event_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T00:00:10"), 10.0),
            ("u1", _ts("2024-01-01T00:01:00"), 20.0),
            ("u2", _ts("2024-01-01T08:00:00"), 99.0),
        ],
        "user_id string, r_ts timestamp, v double",
    )
    return left, right


def _run(spark, strict):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="r_ts",
        value_cols=["v"], strict=strict,
    )
    return {r["event_id"]: r["v"] for r in out.collect()}


def test_inclusive_ties_match(spark):
    got = _run(spark, strict=False)
    assert got == {1: 10.0, 2: 20.0, 3: None, 4: 99.0}


def test_strict_excludes_equal_ts(spark):
    got = _run(spark, strict=True)
    assert got == {1: 10.0, 2: 10.0, 3: None, 4: 99.0}


def test_left_columns_survive(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="r_ts",
        value_cols=["v"],
    )
    assert set(out.columns) == {"event_id", "user_id", "ts", "v"}
    assert out.count() == 4
    assert out.filter(F.col("ts").isNull()).count() == 0
