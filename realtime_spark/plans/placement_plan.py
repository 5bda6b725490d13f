"""Placement plans: tenant→node assignment and the rebalance audit
(nodes.ex launch_node semantics + operations.ex rebalance counting gated by
rebalancer.ex cluster-stability).

Fixture: tenants derived from `customer` cycling through every region of
the reference's default mapping plus one unknown region; a 4-region node
topology with a multi-node region (hash pick), a single-node region, and a
nodeless region (default-node fallback); cluster membership unchanged
between observations so the global stability gate is open. The oracle
re-derives the expected node from the statically-known sorted node lists
and the same md5 placement hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.operators.placement import (
    PLACEMENT_SEED,
    REGION_MAPPING,
    rebalance_audit,
)
from realtime_spark.sources.testdata import load_table

_REGIONS = list(REGION_MAPPING) + ["mars-central-1"]  # 19: one untranslatable
_PLATFORMS = [REGION_MAPPING[r] for r in REGION_MAPPING]  # aligned, 18
_DEFAULT_NODE = "default@node"

_CUR_NODES = [
    ("ap-southeast-1", "n1"),
    ("ap-southeast-1", "n2"),
    ("ap-southeast-1", "n3"),
    ("ap-southeast-2", "n4"),
    ("ap-southeast-2", "n5"),
    ("us-east-1", "n6"),
    ("us-east-1", "n7"),
    ("eu-west-2", "n8"),
    # us-west-1: zero nodes -> default fallback
]
# cluster membership unchanged between observations: the global stability
# gate is open and misplacement verdicts are live (the suppressed case is
# pinned by tests/test_placement.py — a single changed node anywhere would
# blank EVERY verdict, which would make a degenerate fixture)
_PREV_NODES = list(_CUR_NODES)


def _pl_tenants(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    arr = F.array(*[F.lit(r) for r in _REGIONS])
    k = F.col("c_custkey")
    return c.select(
        F.concat(F.lit("c"), k).alias("tenant_id"),
        F.element_at(arr, (k % 19).cast("int") + F.lit(1)).alias("region"),
        F.concat(F.lit("n"), k % 9 + 1).alias("current_node"),
    )


def _nodes_df(spark: SparkSession, rows) -> DataFrame:
    return spark.createDataFrame(rows, schema="region string, node string")


def q_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rebalance_audit(
        _pl_tenants(spark, sf_dir),
        _nodes_df(spark, _PREV_NODES),
        _nodes_df(spark, _CUR_NODES),
        _DEFAULT_NODE,
    )


def _sql_list(xs) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


ORACLE_REBALANCE_AUDIT = f"""
WITH _plt AS (
  SELECT 'c' || c_custkey AS tenant_id,
         ({_sql_list(_REGIONS)})[CAST(c_custkey % 19 AS INT) + 1] AS region,
         'n' || (c_custkey % 9 + 1) AS current_node,
         ('0x' || substr(md5('{PLACEMENT_SEED}:c' || c_custkey), 1, 15))::BIGINT
           AS h
  FROM customer
),
_plp AS (
  SELECT tenant_id, current_node, h,
         ({_sql_list(_PLATFORMS)} || [NULL])
           [CAST(c2 % 19 AS INT) + 1] AS platform_region
  FROM (SELECT *, CAST(substr(tenant_id, 2) AS BIGINT) AS c2 FROM _plt)
),
_ple AS (
  SELECT tenant_id, platform_region, current_node,
    CASE platform_region
      WHEN 'ap-southeast-1' THEN (['n1', 'n2', 'n3'])[CAST(h % 3 AS INT) + 1]
      WHEN 'ap-southeast-2' THEN (['n4', 'n5'])[CAST(h % 2 AS INT) + 1]
      WHEN 'us-east-1' THEN (['n6', 'n7'])[CAST(h % 2 AS INT) + 1]
      WHEN 'eu-west-2' THEN 'n8'
      ELSE '{_DEFAULT_NODE}' END AS expected_node,
    TRUE AS stable
  FROM _plp
)
SELECT tenant_id, platform_region, current_node, expected_node, stable,
       (stable AND current_node <> expected_node) AS misplaced
FROM _ple
"""


def placement_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"rebalance_audit": q_rebalance_audit, "vacant_prune": q_vacant_prune}


def placement_oracles() -> dict[str, str]:
    return {"rebalance_audit": ORACLE_REBALANCE_AUDIT, "vacant_prune": ORACLE_VACANT_PRUNE}


# ---------------------------------------------------------------------------
# metrics vacancy sweep (lib/realtime/metrics_cleaner.ex)
# ---------------------------------------------------------------------------

# sweep instant: 600 s past a mid-final-day cutoff so both pruned and kept
# vacancies exist at every SF (events span 2024-01-01..01-30)
_VP_CUTOFF = 1706616000  # 2024-01-30T12:00:00Z
_VP_NOW = _VP_CUTOFF + 600


def q_vacant_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime_spark.operators.materialize import vacant_prune

    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        F.concat(F.lit("n"), F.col("user_id") % 50).alias("tenant_id"),
        F.when(F.col("event_id") % 3 == 0, F.lit("occupied"))
        .otherwise(F.lit("vacant"))
        .alias("kind"),
        "ts",
        F.col("event_id").alias("seq"),
    )
    return vacant_prune(ev, now_epoch_s=_VP_NOW, threshold_s=600)


ORACLE_VACANT_PRUNE = f"""
WITH _vpe AS (
  SELECT 'n' || (user_id % 50) AS tenant_id,
         CASE WHEN event_id % 3 = 0 THEN 'occupied' ELSE 'vacant' END AS kind,
         ts, event_id AS seq
  FROM events
),
_vpl AS (
  SELECT tenant_id, kind, ts,
         row_number() OVER (PARTITION BY tenant_id
                            ORDER BY ts DESC, seq DESC) AS rn
  FROM _vpe
)
SELECT tenant_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS vacant_since_sec,
       (floor(epoch(ts)) < {_VP_CUTOFF}) AS pruned
FROM _vpl WHERE rn = 1 AND kind = 'vacant'
"""
