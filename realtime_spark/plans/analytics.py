"""Flagship relational analytics over the TPC-H-shaped testdata: classic
pricing-summary / shipping-priority / local-supplier-volume queries
(TPC-H Q1/Q3/Q5 adapted to the columns present).

These exercise the general analytics surface of the engine — multi-way
joins with dimension broadcast, map-side-combined aggregation, top-k — and
pin the plans Catalyst should pick at 100 TB: nation/region/customer
broadcast into the fact scan, one shuffle per groupBy, TakeOrderedAndProject
for LIMIT.

All money sums are quantized with the engine-agnostic floor(x*10^d + 0.5)
(see operators/text.py::quantize) so the DuckDB oracle hash-matches despite
cross-engine double-summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import load_table

_Q1_CUTOFF = "1998-09-02 00:00:00"
_SQL_Q = "floor({expr} * 100.0 + 0.5) / 100.0"


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    charge = disc_price * (1.0 + F.col("l_tax"))
    out = l.groupBy("l_returnflag", "l_linestatus").agg(
        quantize(F.sum("l_quantity"), 2).alias("sum_qty"),
        quantize(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        quantize(F.sum(disc_price), 2).alias("sum_disc_price"),
        quantize(F.sum(charge), 2).alias("sum_charge"),
        quantize(F.avg("l_quantity"), 2).alias("avg_qty"),
        quantize(F.avg("l_extendedprice"), 2).alias("avg_price"),
        quantize(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out


ORACLE_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {_SQL_Q.format(expr="SUM(l_quantity)")} AS sum_qty,
       {_SQL_Q.format(expr="SUM(l_extendedprice)")} AS sum_base_price,
       {_SQL_Q.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS sum_disc_price,
       {_SQL_Q.format(expr="SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))")} AS sum_charge,
       {_SQL_Q.format(expr="AVG(l_quantity)")} AS avg_qty,
       {_SQL_Q.format(expr="AVG(l_extendedprice)")} AS avg_price,
       floor(AVG(l_discount) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""

_Q3_DATE = "1996-03-15 00:00:00"


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    joined = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    out = joined.groupBy("l_orderkey", "o_orderdate").agg(
        quantize(F.sum(rev), 2).alias("revenue")
    )
    top = out.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
    return top.select(
        "l_orderkey",
        "revenue",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
    )


ORACLE_TPCH_Q3 = f"""
SELECT l_orderkey,
       {_SQL_Q.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

_Q5_LO = "1996-01-01 00:00:00"
_Q5_HI = "1997-01-01 00:00:00"


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: revenue per nation in ASIA where the supplier
    and customer share the nation. region->nation->(customer, supplier) are
    broadcast dims; the only large shuffle is orders |><| lineitem."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    joined = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
    )
    return joined.groupBy("n_name").agg(quantize(F.sum(rev), 2).alias("revenue"))


ORACLE_TPCH_Q5 = f"""
SELECT n_name,
       {_SQL_Q.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o_orderdate < TIMESTAMP '{_Q5_HI}'
GROUP BY n_name
"""


def analytics_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
    }


def analytics_oracles() -> dict[str, str]:
    return {
        "tpch_q1": ORACLE_TPCH_Q1,
        "tpch_q3": ORACLE_TPCH_Q3,
        "tpch_q5": ORACLE_TPCH_Q5,
    }
