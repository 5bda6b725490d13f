"""TPC-H suite adapted to the reduced testdata schema (no partsupp table,
no commit/receipt dates, no phone/address/comment columns).

Together with plans/analytics.py (Q1/Q3/Q5) this covers the full 22-query
shape catalog re-expressed over the available columns: semi/anti joins
(Q4/Q21/Q22), scalar subqueries (Q11/Q14/Q15/Q17/Q22), decorrelated
correlated subqueries (Q2/Q17 via window/agg-join), left-outer histogram
(Q13), disjunctive pushdown (Q19), and multi-dim broadcast chains
(Q7/Q8/Q9/Q10). Queries whose predicates referenced missing columns keep
the operator shape and swap in available columns; each docstring notes the
adaptation.

Scale notes (100 TB): every dimension (region/nation/customer/supplier/
part) is broadcast — lineitem and orders are the only shuffled relations,
and each query shuffles lineitem at most once before its aggregation.
Scalar aggregates (Q11/Q14/Q15/Q22 thresholds) are computed as 1-row
DataFrames and cross-broadcast, never collected through the driver.
Money sums are quantized engine-agnostically (operators/text.py::quantize)
so the DuckDB oracle hash-matches double summation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_spark.operators.text import quantize
from realtime_spark.sources.testdata import load_table

_SQL_Q2 = "floor({expr} * 100.0 + 0.5) / 100.0"
_SQL_Q4D = "floor({expr} * 10000.0 + 0.5) / 10000.0"


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q2 (adapted): min-price supplier per part. partsupp is absent, so the
# supplier<->part relation comes from lineitem: per (part, supplier) the
# min observed unit sell price; pick the cheapest supplier per part
# (deterministic tie-break on suppkey) among EUROPE suppliers for
# STANDARD-type parts of size 15. Keeps Q2's correlated-min shape,
# decorrelated as a row_number window over a pre-aggregated pair relation.
# ---------------------------------------------------------------------------

def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    l = _t(spark, sf_dir, "lineitem")
    unit = (F.col("l_extendedprice") / F.col("l_quantity"))
    pairs = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(quantize(F.min(unit), 2).alias("min_unit_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("min_unit_price"), F.asc("s_suppkey")
    )
    best = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.select(
        "p_partkey", "s_suppkey", "s_name", "n_name", "min_unit_price"
    )


ORACLE_TPCH_Q2 = f"""
WITH pairs AS (
  SELECT p_partkey, s_suppkey, s_name, n_name,
         {_SQL_Q2.format(expr="MIN(l_extendedprice / l_quantity)")} AS min_unit_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
  GROUP BY p_partkey, s_suppkey, s_name, n_name
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
            ORDER BY min_unit_price, s_suppkey) AS rn
  FROM pairs
)
SELECT p_partkey, s_suppkey, s_name, n_name, min_unit_price
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Q4 (adapted): order-priority checking. commit/receipt dates are absent;
# "late" = some lineitem shipped > 30 days after the order date. Same
# EXISTS semi-join shape.
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1996-07-01 00:00:00", "1996-10-01 00:00:00"


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


ORACLE_TPCH_Q4 = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}' AND o_orderdate < TIMESTAMP '{_Q4_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — verbatim (all columns exist). Pure
# scan-side filter + single agg row; the predicate fully pushes to parquet.
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        quantize(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_TPCH_Q6 = f"""
SELECT {_SQL_Q2.format(expr="SUM(l_extendedprice * l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}' AND l_shipdate < TIMESTAMP '{_Q6_HI}'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (supplier nation <-> customer
# nation, both directions), revenue per (supp_nation, cust_nation, year).
# ---------------------------------------------------------------------------

_Q7_A, _Q7_B = "NATION_1", "NATION_2"


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(
            ((F.col("supp_nation") == _Q7_A) & (F.col("cust_nation") == _Q7_B))
            | ((F.col("supp_nation") == _Q7_B) & (F.col("cust_nation") == _Q7_A))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(quantize(F.sum(rev), 2).alias("revenue"))


ORACLE_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {_SQL_Q2.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = '{_Q7_A}' AND n2.n_name = '{_Q7_B}')
    OR (n1.n_name = '{_Q7_B}' AND n2.n_name = '{_Q7_A}'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# ---------------------------------------------------------------------------
# Q8: national market share — share of supplier-nation NATION_1 in AMERICA
# customers' PROMO-part volume, per order year.
# ---------------------------------------------------------------------------

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n_cust), F.col("c_nationkey") == F.col("cnk")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n_supp), F.col("s_nationkey") == F.col("snk")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
    )
    per_year = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0)).alias(
            "nation_vol"
        ),
        F.sum(vol).alias("total_vol"),
    )
    return per_year.select(
        "o_year",
        quantize(F.col("nation_vol") / F.col("total_vol"), 4).alias("mkt_share"),
    )


ORACLE_TPCH_Q8 = f"""
WITH vols AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         SUM(CASE WHEN n2.n_name = 'NATION_1'
             THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) AS nation_vol,
         SUM(l_extendedprice * (1.0 - l_discount)) AS total_vol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
  GROUP BY year(o_orderdate)
)
SELECT o_year, {_SQL_Q4D.format(expr="nation_vol / total_vol")} AS mkt_share
FROM vols
"""


# ---------------------------------------------------------------------------
# Q9 (adapted): product-type profit. ps_supplycost is absent; cost proxy =
# 0.5 * p_retailprice * l_quantity. Profit per (supplier nation, year) for
# parts whose name contains 'red'.
# ---------------------------------------------------------------------------

def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    # Per-row profit is EXACTLY a 4-decimal value (2dp price x 2dp discount
    # = 4dp; 0.5 x 2dp retailprice x integer quantity = 3dp), so floor-
    # quantizing each row to integer 1e-4 units recovers the exact decimal
    # the double approximates — identically on both engines — and the SUM
    # becomes exact integer arithmetic, immune to summation-order noise.
    # (At sf1 the double-sum path flipped a cent boundary: ~34k terms per
    # group accumulate ~1e-3 of order-dependent noise, and quantize(,2)
    # amplifies any straddle into a value mismatch.) DECIMAL(38,0) gives
    # the sum overflow headroom past the BIGINT range at cluster scale.
    profit = (
        F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    profit_i = F.floor(profit * 10000.0 + F.lit(0.5)).cast("decimal(38,0)")
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(
        quantize(F.sum(profit_i).cast("double") / F.lit(10000.0), 2).alias(
            "sum_profit"
        )
    )


ORACLE_TPCH_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  {_SQL_Q2.format(expr="SUM(CAST(floor((l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity) * 10000.0 + 0.5) AS HUGEINT)) / 10000.0")} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue
# (l_returnflag = 'R') for a quarter of orders.
# ---------------------------------------------------------------------------

_Q10_LO, _Q10_HI = "1996-10-01 00:00:00", "1997-01-01 00:00:00"


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        quantize(F.sum(rev), 2).alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


ORACLE_TPCH_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_SQL_Q2.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{_Q10_LO}' AND o_orderdate < TIMESTAMP '{_Q10_HI}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 (adapted): important stock. partsupp value is absent; per-part
# "value" = sum of l_extendedprice shipped by NATION_3 suppliers; keep
# parts whose value exceeds 0.1% of the total (scalar-subquery HAVING).
# ---------------------------------------------------------------------------

def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    shipped = l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
    per_part = shipped.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("value_raw")
    )
    total = per_part.agg(F.sum("value_raw").alias("total_raw"))
    out = per_part.join(F.broadcast(total)).filter(
        F.col("value_raw") > 0.001 * F.col("total_raw")
    )
    return out.select(
        F.col("l_partkey").alias("p_partkey"),
        quantize(F.col("value_raw"), 2).alias("part_value"),
    )


ORACLE_TPCH_Q11 = f"""
WITH shipped AS (
  SELECT l_partkey, SUM(l_extendedprice) AS value_raw
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, {_SQL_Q2.format(expr="value_raw")} AS part_value
FROM shipped
WHERE value_raw > 0.001 * (SELECT SUM(value_raw) FROM shipped)
"""


# ---------------------------------------------------------------------------
# Q12 (adapted): shipping-mode priority classes. l_shipmode is absent; the
# grouping column becomes l_linestatus and "late" = shipped > 60 days
# after order date. Same CASE-sum high/low-priority split.
# ---------------------------------------------------------------------------

_Q12_LO, _Q12_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
    )
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(
        l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


ORACLE_TPCH_Q12 = f"""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{_Q12_LO}' AND l_shipdate < TIMESTAMP '{_Q12_HI}'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (left outer join + double groupBy).
# The comment NOT LIKE filter becomes o_orderpriority <> '5-LOW'.
# ---------------------------------------------------------------------------

def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_outer"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_TPCH_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14: promotion effect — % of revenue from PROMO-type parts in one month.
# ---------------------------------------------------------------------------

_Q14_LO, _Q14_HI = "1996-09-01 00:00:00", "1996-10-01 00:00:00"


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias("promo"),
        F.sum(rev).alias("total"),
    )
    return agg.select(
        quantize(100.0 * F.col("promo") / F.col("total"), 4).alias("promo_revenue_pct")
    )


ORACLE_TPCH_Q14 = f"""
WITH agg AS (
  SELECT SUM(CASE WHEN p_type = 'PROMO'
             THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) AS promo,
         SUM(l_extendedprice * (1.0 - l_discount)) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{_Q14_LO}' AND l_shipdate < TIMESTAMP '{_Q14_HI}'
)
SELECT {_SQL_Q4D.format(expr="100.0 * promo / total")} AS promo_revenue_pct FROM agg
"""


# ---------------------------------------------------------------------------
# Q15: top supplier — supplier(s) achieving max revenue over a quarter
# (view + scalar-max in the original; here agg + broadcast max join).
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1996-01-01 00:00:00", "1996-04-01 00:00:00"


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    revenue = l.groupBy("l_suppkey").agg(quantize(F.sum(rev), 2).alias("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    top = revenue.join(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    )
    return top.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


ORACLE_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_SQL_Q2.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}' AND l_shipdate < TIMESTAMP '{_Q15_HI}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16 (adapted): parts/supplier relationship. partsupp absent — the
# supplier set per (brand, type, size) comes from lineitem. Excludes
# Brand#15 and one size list, counts distinct suppliers.
# ---------------------------------------------------------------------------

_Q16_SIZES = [3, 7, 14, 19, 23, 36, 45, 49]


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15") & F.col("p_size").isin(_Q16_SIZES)
    )
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


ORACLE_TPCH_Q16 = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#15' AND p_size IN ({",".join(map(str, _Q16_SIZES))})
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — lineitems below half the part's
# average quantity, for one brand. Correlated avg subquery decorrelated as
# an aggregation join (quantities are integer-valued doubles, so the avg is
# bit-identical across engines regardless of summation order).
# ---------------------------------------------------------------------------

def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    avg_qty = lp.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    j = lp.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap")).filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return j.agg(
        quantize(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


ORACLE_TPCH_Q17 = f"""
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
),
a AS (SELECT l_partkey AS ap, AVG(l_quantity) AS avg_qty FROM lp GROUP BY l_partkey)
SELECT {_SQL_Q2.format(expr="SUM(l_extendedprice) / 7.0")} AS avg_yearly,
       COUNT(*) AS n_small
FROM lp JOIN a ON l_partkey = ap
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q18: large-volume customers — orders whose total quantity exceeds 250.
# ---------------------------------------------------------------------------

def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    j = big.join(o, F.col("l_orderkey") == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    out = j.select(
        "c_custkey", "c_name", "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        "o_totalprice",
        F.col("sum_qty"),
    )
    return out.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)


ORACLE_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19: discounted revenue — disjunction of brand/size/quantity clauses
# (l_shipmode/l_shipinstruct clauses dropped with the columns).
# ---------------------------------------------------------------------------

def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return j.filter(clause).agg(
        quantize(F.sum(rev), 2).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


ORACLE_TPCH_Q19 = f"""
SELECT {_SQL_Q2.format(expr="SUM(l_extendedprice * (1.0 - l_discount))")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20 (adapted): potential part promotion — suppliers who shipped more
# than 100 units of 'hot'-named parts during 1996 (availqty clause is
# partsupp-based and absent). Semi-join shape into supplier.
# ---------------------------------------------------------------------------

def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("hot"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    j = s.join(shipped, s["s_suppkey"] == F.col("l_suppkey"), "left_semi").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return j.select("s_suppkey", "s_name", "n_name")


ORACLE_TPCH_Q20 = """
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'hot%'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey HAVING SUM(l_quantity) > 100
)
"""


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting — sole late shipper
# (shipped > 60 days after order date) in a multi-supplier finished order.
# EXISTS(other supplier) + NOT EXISTS(other late supplier) shape.
# ---------------------------------------------------------------------------

def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    lo = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("supps"),
        F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supps"),
    )
    sole_late = per_order.filter(
        (F.size("supps") > 1) & (F.size("late_supps") == 1)
    ).select(F.element_at("late_supps", 1).alias("w_suppkey"))
    counts = sole_late.groupBy("w_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    return counts.join(
        F.broadcast(s), F.col("w_suppkey") == s["s_suppkey"]
    ).select("s_suppkey", "s_name", "numwait")


ORACLE_TPCH_Q21 = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
waiting AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lo l1
  WHERE l1.late
    AND EXISTS (SELECT 1 FROM lo l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lo l3
                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.late)
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM waiting JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


# ---------------------------------------------------------------------------
# Q22 (adapted): global sales opportunity. No phone country codes — group
# by nation instead; "inactive" = no orders on/after 1999-01-01 (every
# customer has some order in this corpus). Scalar avg subquery + anti-join.
# ---------------------------------------------------------------------------

_Q22_CUT = "1999-01-01 00:00:00"


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUT).cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    inactive = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    j = inactive.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("numcust"),
        quantize(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


ORACLE_TPCH_Q22 = f"""
SELECT n_name, COUNT(*) AS numcust,
       {_SQL_Q2.format(expr="SUM(c_acctbal)")} AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_CUT}')
GROUP BY n_name
"""


def tpch_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q2": q_tpch_q2,
        "tpch_q4": q_tpch_q4,
        "tpch_q6": q_tpch_q6,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q10": q_tpch_q10,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q13": q_tpch_q13,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_q22": q_tpch_q22,
    }


def tpch_oracles() -> dict[str, str]:
    return {
        "tpch_q2": ORACLE_TPCH_Q2,
        "tpch_q4": ORACLE_TPCH_Q4,
        "tpch_q6": ORACLE_TPCH_Q6,
        "tpch_q7": ORACLE_TPCH_Q7,
        "tpch_q8": ORACLE_TPCH_Q8,
        "tpch_q9": ORACLE_TPCH_Q9,
        "tpch_q10": ORACLE_TPCH_Q10,
        "tpch_q11": ORACLE_TPCH_Q11,
        "tpch_q12": ORACLE_TPCH_Q12,
        "tpch_q13": ORACLE_TPCH_Q13,
        "tpch_q14": ORACLE_TPCH_Q14,
        "tpch_q15": ORACLE_TPCH_Q15,
        "tpch_q16": ORACLE_TPCH_Q16,
        "tpch_q17": ORACLE_TPCH_Q17,
        "tpch_q18": ORACLE_TPCH_Q18,
        "tpch_q19": ORACLE_TPCH_Q19,
        "tpch_q20": ORACLE_TPCH_Q20,
        "tpch_q21": ORACLE_TPCH_Q21,
        "tpch_q22": ORACLE_TPCH_Q22,
    }
