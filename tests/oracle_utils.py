"""Local replica of the driver's duckdb-oracle comparison so we catch
mismatches before the driver does: row-count + schema-width + column-name-
sorted, row-order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb

from realtime_spark.sources.testdata import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    # float vs int stay DISTINCT (the driver hashes "123.0" != "123"; DuckDB
    # SUM(BIGINT) -> HUGEINT reaches pandas as float64 — oracles must CAST)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # + 0.0 folds -0.0: engines may disagree on the SIGN of a zero
        # (summation-order noise rounded to zero), which is equal under ==
        # but sorts/reprs differently and would misalign the row zip
        return ("f", round(v, 9) + 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    sdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != oracle {len(odf)}"
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != oracle {o_cols}"
    s_rows = sorted(
        (tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)),
        key=repr,
    )
    o_rows = sorted(
        (tuple(_norm(v) for v in row) for row in odf[o_cols].itertuples(index=False)),
        key=repr,
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
