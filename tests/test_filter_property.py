"""Differential property test for the two filter-evaluation paths.

The engine evaluates the same PostgREST filter semantics (P2/P3) twice:
  1. the generic runtime interpreter (`filters_match_expr` over filter
     structs carried as data in the subscription dim), and
  2. the plan-time compiler (`compile_filters_on_record`, both the
     record-map form and the typed-column pushdown form).
They are maintained separately, so hypothesis drives randomized filters and
records through all three and requires bit-identical visibility decisions.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_spark.functions.filters import (
    FILTER_STRUCT_DDL,
    compile_filters_on_record,
    filters_match_expr,
    filters_to_rows,
    Filter,
)

# relation catalog: typed columns the record map is projected from
_TYPES = {
    "c_long": "int8",
    "c_double": "float8",
    "c_text": "text",
    "c_bool": "bool",
    "c_ts": "timestamp",
}

# deterministic record corpus exercising NULLs, signs, bools, ts, odd strings
_RECORDS = [
    (1, 1.5, "URGENT-1", True, "2020-01-01 00:00:00"),
    (-3, -0.5, "low", False, "1999-12-31 23:59:59"),
    (0, 0.0, "", None, None),
    (None, None, None, None, "2020-06-15 12:00:00"),
    (42, 3.5, "3.5", True, None),
    (100, float("inf"), "URGENT-2", False, "2020-01-01 00:00:00"),
    (7, -1.25, "Mixed Case", None, "2021-02-03 04:05:06"),
    (None, 2.0, "null", True, None),
]

_VALUES = [
    "", "0", "1", "-3", "3.5", "42", "abc", "URGENT-1", "low", "null",
    "true", "false", "unknown", "2020-01-01 00:00:00", "%URGENT%", "Mixed Case",
]
_REGEXES = ["^URG", "[0-9]+", "^$", "(?i)urgent", "a|b", "^-", "\\d\\.\\d"]
_LIKES = ["%URGENT%", "low", "%", "_", "3.5", "M%e"]
_IS_KW = ["null", "true", "false", "unknown"]

_COLS = list(_TYPES) + ["c_absent"]


@st.composite
def filter_strategy(draw):
    col = draw(st.sampled_from(_COLS))
    op = draw(st.sampled_from(
        ["eq", "neq", "lt", "lte", "gt", "gte", "in", "like", "ilike",
         "is", "isdistinct", "match", "imatch"]
    ))
    negate = draw(st.booleans())
    if op == "is":
        value, values = draw(st.sampled_from(_IS_KW)), ()
    elif op == "in":
        value, values = "", tuple(
            draw(st.lists(st.sampled_from(_VALUES), min_size=0, max_size=4))
        )
    elif op in ("like", "ilike"):
        value, values = draw(st.sampled_from(_LIKES)), ()
    elif op in ("match", "imatch"):
        value, values = draw(st.sampled_from(_REGEXES)), ()
    else:
        value, values = draw(st.sampled_from(_VALUES)), ()
    return Filter(col, op, value, values, negate)


@pytest.fixture(scope="module")
def record_df(spark):
    df = spark.createDataFrame(
        _RECORDS,
        "c_long long, c_double double, c_text string, c_bool boolean, c_ts_s string",
    ).withColumn("c_ts", F.col("c_ts_s").cast("timestamp")).drop("c_ts_s")
    typed = {name: F.col(name) for name in _TYPES}
    # NULL-valued keys stay PRESENT in the map (typed-source contract: the
    # record is a string projection of exactly the typed columns)
    record = F.map_from_arrays(
        F.array(*[F.lit(n) for n in _TYPES]),
        F.array(*[F.col(n).cast("string") for n in _TYPES]),
    )
    return df.withColumn("record", record).cache(), typed


def _lit_filters(rows):
    structs = [
        F.struct(
            F.lit(r["column_name"]).alias("column_name"),
            F.lit(r["op"]).alias("op"),
            F.lit(r["value"]).alias("value"),
            F.array(*[F.lit(v) for v in r["values"]]).cast("array<string>").alias("values"),
            F.lit(r["negate"]).alias("negate"),
            F.lit(r["fam"]).alias("fam"),
        )
        for r in rows
    ]
    return F.array(*structs).cast(FILTER_STRUCT_DDL)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filters=st.lists(filter_strategy(), min_size=1, max_size=3))
def test_interpreter_matches_compiled(record_df, filters):
    df, typed = record_df
    rows = filters_to_rows(list(filters), _TYPES)
    out = df.select(
        filters_match_expr(_lit_filters(rows), F.col("record")).alias("interp"),
        compile_filters_on_record(rows, F.col("record")).alias("compiled_map"),
        compile_filters_on_record(rows, F.col("record"), typed).alias("compiled_typed"),
    ).collect()
    for i, r in enumerate(out):
        assert bool(r["interp"]) == bool(r["compiled_map"]) == bool(r["compiled_typed"]), (
            f"row {i} ({_RECORDS[i]}): interp={r['interp']} "
            f"map={r['compiled_map']} typed={r['compiled_typed']} filters={filters}"
        )
