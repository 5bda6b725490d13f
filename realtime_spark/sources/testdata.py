"""Loaders for the driver-generated synthetic testdata (TESTDATA.md) and a
deterministic change-event derivation used by correctness queries.

The duckdb oracle sees the same parquet tables as plain views, so every
derivation here is mirrored by plain ANSI SQL in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# pg typenames for the orders relation when treated as a CDC-watched user table
ORDERS_PG_TYPES = {
    "o_orderkey": "int8",
    "o_custkey": "int8",
    "o_orderstatus": "text",
    "o_totalprice": "float8",
    "o_orderdate": "timestamp",
    "o_orderpriority": "text",
    "o_nullable": "text",  # synthetic nullable col exercising is/isdistinct
}
ORDERS_PK = ["o_orderkey"]


# tables whose parquet carries TIMESTAMP(NANOS) (written by duckdb); Spark has
# no nanos timestamp type, so we read them as long and truncate to micros.
_NANOS_TS_COLS = {"events": ("ts",)}




def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # sentinel conf, not an id()-keyed set: a NEW session can reuse a
    # GC'd session object's address and would silently skip tuning,
    # leaving the session timezone unpinned vs the UTC-pinned oracle
    if spark.conf.get("spark.realtime_spark.tuned", None) != "1":
        from realtime_spark.session import tune_session

        tune_session(spark)
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            # integer div keeps full precision (double division would not)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    # Parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ under
    # Spark 4's inferTimestampNTZ; the engine (and the duckdb oracle, which
    # treats naive timestamps as UTC) works in session-UTC TIMESTAMP. The
    # cast keeps the wall-clock value because tune_session pins the session
    # timezone to UTC. Centralized here so no operator ever sees NTZ.
    ntz_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def changes_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic wal2json-shaped change stream derived from `orders`.

    Each order row becomes one change on entity public.orders:
      action: o_orderkey % 10 -> 0..6 INSERT, 7..8 UPDATE, 9 DELETE
      record: full row as text map (I/U); old_record: full row (U/D)
      o_nullable: NULL when o_orderkey % 7 = 0 else o_orderpriority
        (gives is.null / isdistinct filters real NULLs to chew on)

    Mirrored in SQL by the `_orders_changes` CTE in __spark_entry__.py.
    """
    o = load_table(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 10
    action = (
        F.when(mod <= 6, F.lit("INSERT"))
        .when(mod <= 8, F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
    )
    nullable = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.col("o_orderpriority")
    )
    record_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c in ORDERS_PG_TYPES]),
        F.array(
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus").cast("string"),
            # decimal render: Spark's double->string flips to scientific
            # notation at 1e7 ('9.9999999999E8') where DuckDB and wal2json
            # both print plain decimal — numeric columns render through
            # DECIMAL(18,2) so every engine prints the same text
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            F.col("o_orderdate").cast("string"),
            F.col("o_orderpriority").cast("string"),
            nullable,
        ),
    )
    type_map = F.map_from_arrays(
        F.array(*[F.lit(k) for k in ORDERS_PG_TYPES]),
        F.array(*[F.lit(v) for v in ORDERS_PG_TYPES.values()]),
    )
    change_exprs = {
        "change_id": F.col("o_orderkey"),
        "action": action,
        "schema_name": F.lit("public"),
        "table_name": F.lit("orders"),
        "commit_timestamp": F.col("o_orderdate"),
        "record": F.when(action != "DELETE", record_map),
        "old_record": F.when(action != "INSERT", record_map),
        "col_types": type_map,
        "col_names": F.array(*[F.lit(c) for c in ORDERS_PG_TYPES]),
        "pk": F.array(*[F.lit(c) for c in ORDERS_PK]),
        "record_bytes": F.lit(None).cast("bigint"),
    }
    out = o.select(*[c.alias(n) for n, c in change_exprs.items()])
    # typed-source contract for the compiled filter path (cdc.matched_pairs):
    # (base df, change-column exprs over the base, typed record columns over
    # the base). record AND old_record (when non-null) are string projections
    # of exactly the typed columns, all keys always present. Lets the match
    # compile filters straight onto the scan columns (parquet PushedFilters,
    # no per-lookup map rebuild) — the plan that matters at 100 TB.
    out._rs_typed_source = (
        o,
        change_exprs,
        {
            "o_orderkey": F.col("o_orderkey"),
            "o_custkey": F.col("o_custkey"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_totalprice": F.col("o_totalprice"),
            "o_orderdate": F.col("o_orderdate"),
            "o_orderpriority": F.col("o_orderpriority"),
            "o_nullable": nullable,
        },
    )
    return out


def messages_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic `realtime.messages`-shaped store derived from `events`:
    topic = event_type, id = event_id, inserted_at = ts, private when
    user_id is even. Mirrored by the `_messages` CTE below."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("event_type").alias("topic"),
        F.lit("broadcast").alias("extension"),
        F.create_map(F.lit("props"), F.col("props")).alias("payload"),
        F.lit("broadcast").alias("event"),
        (F.col("user_id") % 2 == 0).alias("private"),
        F.col("ts").alias("inserted_at"),
        F.col("ts").alias("updated_at"),
        F.to_date("ts").alias("day"),
    )


# SUBSET mirror of messages_from_events: the columns oracle queries read
# (id/topic/extension/event/private/inserted_at + raw props standing in
# for the payload map); updated_at and the day partition column have no
# SQL counterpart here — an oracle needing them must derive them (ts /
# CAST(ts AS DATE)) rather than reference this CTE blindly.
MESSAGES_SQL_CTE = """
_messages AS (
  SELECT CAST(event_id AS VARCHAR) AS id, event_type AS topic,
         'broadcast' AS extension, props, 'broadcast' AS event,
         (user_id % 2 = 0) AS private, ts AS inserted_at
  FROM events
)
"""


def versioned_changes_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-version change feed derived from `orders` (for materialization):

      seq 1: INSERT  (status, totalprice as-is)          at o_orderdate
      seq 2: UPDATE  (status 'U2', totalprice + 100)     at +1h, keys %3=0
      seq 3: DELETE                                      at +2h, keys %5=0
      seq 4: INSERT  (status 'R4', totalprice + 200)     at +3h, keys %15=0
             (re-insert after delete: the key must resurface)

    Mirrored by ORDERS_VERSIONS_SQL_CTE.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )

    def version(seq: int, action: str, status, price, hours: int, keep) -> DataFrame:
        rec = F.map_from_arrays(
            F.array(F.lit("o_orderkey"), F.lit("o_orderstatus"), F.lit("o_totalprice")),
            F.array(
                F.col("o_orderkey").cast("string"),
                status.cast("string"),
                price.cast("decimal(18,2)").cast("string"),
            ),
        )
        base = o.filter(keep) if keep is not None else o
        return base.select(
            F.col("o_orderkey").alias("change_id"),
            F.lit(seq).alias("seq"),
            F.lit(action).alias("action"),
            F.lit("public").alias("schema_name"),
            F.lit("orders").alias("table_name"),
            (F.col("o_orderdate") + F.expr(f"INTERVAL {hours} HOURS")).alias(
                "commit_timestamp"
            ),
            F.when(F.lit(action) != "DELETE", rec).alias("record"),
            F.when(F.lit(action) != "INSERT", rec).alias("old_record"),
            F.array(F.lit("o_orderkey")).alias("pk"),
        )

    price = F.col("o_totalprice")
    return (
        version(1, "INSERT", F.col("o_orderstatus"), price, 0, None)
        .unionByName(version(2, "UPDATE", F.lit("U2"), price + 100, 1,
                             F.col("o_orderkey") % 3 == 0))
        .unionByName(version(3, "DELETE", F.lit("U2"), price + 100, 2,
                             F.col("o_orderkey") % 5 == 0))
        .unionByName(version(4, "INSERT", F.lit("R4"), price + 200, 3,
                             F.col("o_orderkey") % 15 == 0))
    )


ORDERS_VERSIONS_SQL_CTE = """
_orders_versions AS (
  SELECT o_orderkey, 1 AS seq, 'INSERT' AS action,
         o_orderstatus AS status, o_totalprice AS price,
         o_orderdate AS commit_ts
  FROM orders
  UNION ALL
  SELECT o_orderkey, 2, 'UPDATE', 'U2', o_totalprice + 100,
         o_orderdate + INTERVAL 1 HOUR
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'DELETE', 'U2', o_totalprice + 100,
         o_orderdate + INTERVAL 2 HOUR
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 4, 'INSERT', 'R4', o_totalprice + 200,
         o_orderdate + INTERVAL 3 HOUR
  FROM orders WHERE o_orderkey % 15 = 0
)
"""


# SQL fragment (DuckDB + Spark compatible) mirroring changes_from_orders for
# the oracle side: action + the synthetic nullable column.
ORDERS_CHANGES_SQL_CTE = """
_orders_changes AS (
  SELECT
    o_orderkey AS change_id,
    CASE WHEN o_orderkey % 10 <= 6 THEN 'INSERT'
         WHEN o_orderkey % 10 <= 8 THEN 'UPDATE'
         ELSE 'DELETE' END AS action,
    o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    o_orderpriority,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS o_nullable
  FROM orders
)
"""
