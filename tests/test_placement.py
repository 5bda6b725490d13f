"""Unit tests for tenant→node placement (nodes.ex launch_node semantics)
and the rebalance audit (operations.ex + rebalancer.ex stability gate)."""

from __future__ import annotations

from realtime_spark.operators.placement import (
    expected_node,
    platform_region,
    rebalance_audit,
    region_topology,
)

TEN_DDL = "tenant_id string, region string, current_node string"
NODE_DDL = "region string, node string"


def _nodes(spark, rows):
    return spark.createDataFrame(rows, NODE_DDL)


def test_platform_region_mapping(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("eu-north-1",), ("us-east-2",), ("mars-central-1",), (None,)],
        "region string",
    ).select("region", platform_region(F.col("region")).alias("p"))
    got = {r["region"]: r["p"] for r in df.collect()}
    assert got["eu-north-1"] == "eu-west-2"
    assert got["us-east-2"] == "us-east-1"
    assert got["mars-central-1"] is None
    assert got[None] is None


def test_expected_node_fallbacks(spark):
    tenants = spark.createDataFrame(
        [
            ("t1", "eu-west-1", "x"),     # eu-west-2 has a single node
            ("t2", "us-west-2", "x"),     # us-west-1 has zero nodes -> default
            ("t3", "mars-central-1", "x"),  # untranslatable -> default
            ("t4", "us-east-1", "x"),     # 2 nodes -> hash pick
        ],
        TEN_DDL,
    )
    topo = region_topology(
        _nodes(spark, [("eu-west-2", "n8"), ("us-east-1", "n6"), ("us-east-1", "n7")])
    )
    got = {
        r["tenant_id"]: r["expected_node"]
        for r in expected_node(tenants, topo, "default@node").collect()
    }
    assert got["t1"] == "n8"
    assert got["t2"] == "default@node"
    assert got["t3"] == "default@node"
    assert got["t4"] in ("n6", "n7")


def test_expected_node_is_deterministic_and_spread(spark):
    tenants = spark.createDataFrame(
        [(f"t{i}", "ap-east-1", "x") for i in range(64)], TEN_DDL
    )
    topo = region_topology(
        _nodes(
            spark,
            [("ap-southeast-1", n) for n in ("n1", "n2", "n3")],
        )
    )
    a = expected_node(tenants, topo, "d").collect()
    b = expected_node(tenants, topo, "d").collect()
    assert {r["tenant_id"]: r["expected_node"] for r in a} == {
        r["tenant_id"]: r["expected_node"] for r in b
    }
    used = {r["expected_node"] for r in a}
    assert used == {"n1", "n2", "n3"}  # consistent hash spreads over all nodes


def test_rebalance_audit_stability_gate_is_cluster_wide(spark):
    # the reference snapshots Node.list() — the WHOLE cluster — so a node
    # joining eu-west-2 suppresses the verdict for a misplaced us-east-1
    # tenant too (connect.ex:366-369, rebalancer.ex:14-28)
    placements = spark.createDataFrame(
        [("t1", "us-east-1", "bad-node"), ("t2", "eu-west-1", "bad-node")],
        TEN_DDL,
    )
    prev = _nodes(spark, [("us-east-1", "n1"), ("eu-west-2", "n8")])
    cur = _nodes(
        spark, [("us-east-1", "n1"), ("eu-west-2", "n8"), ("eu-west-2", "n9")]
    )
    got = {
        r["tenant_id"]: (r["expected_node"], r["stable"], r["misplaced"])
        for r in rebalance_audit(placements, prev, cur, "d").collect()
    }
    assert got["t1"] == ("n1", False, False)
    assert got["t2"][1] is False and got["t2"][2] is False

    # same topology at both observations: verdicts are live
    got2 = {
        r["tenant_id"]: (r["stable"], r["misplaced"])
        for r in rebalance_audit(placements, cur, cur, "d").collect()
    }
    assert got2["t1"] == (True, True)


def test_rebalance_audit_correct_placement_not_flagged(spark):
    placements = spark.createDataFrame([("t1", "us-east-1", "n1")], TEN_DDL)
    nodes = _nodes(spark, [("us-east-1", "n1")])
    row = rebalance_audit(placements, nodes, nodes, "d").collect()[0]
    assert row["misplaced"] is False and row["stable"] is True


def test_vacant_prune_fold(spark):
    from realtime_spark.operators.materialize import vacant_prune

    rows = [
        # t1: vacant then occupied -> deleted from the set, absent
        ("t1", "vacant", "2024-01-01 00:00:00", 1),
        ("t1", "occupied", "2024-01-02 00:00:00", 2),
        # t2: occupied then vacant long ago -> present, pruned
        ("t2", "occupied", "2024-01-01 00:00:00", 3),
        ("t2", "vacant", "2024-01-02 00:00:00", 4),
        # t3: vacant recently -> present, kept
        ("t3", "vacant", "2024-01-10 00:00:00", 5),
        # t4: same-ts tie broken by seq (ets last write wins) -> occupied
        ("t4", "vacant", "2024-01-05 00:00:00", 6),
        ("t4", "occupied", "2024-01-05 00:00:00", 7),
    ]
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        rows, "tenant_id string, kind string, ts string, seq long"
    ).withColumn("ts", F.to_timestamp("ts"))
    now = 1704844800  # 2024-01-10T00:00:00Z
    out = {
        r["tenant_id"]: (r["vacant_since_sec"], r["pruned"])
        for r in vacant_prune(ev, now_epoch_s=now, threshold_s=600).collect()
    }
    assert set(out) == {"t2", "t3"}
    assert out["t2"][1] is True  # Jan 2 vacancy is far older than 600 s
    assert out["t3"][1] is False  # vacant exactly at the sweep instant: kept


def test_rebalance_audit_new_node_is_unstable(spark):
    # a node joining anywhere changes Node.list(): the verdict is
    # suppressed even though the tenant already sits on the wrong node
    placements = spark.createDataFrame([("t1", "us-east-1", "n9")], TEN_DDL)
    prev = _nodes(spark, [("eu-west-2", "n8")])
    cur = _nodes(spark, [("eu-west-2", "n8"), ("us-east-1", "n1")])
    row = rebalance_audit(placements, prev, cur, "d").collect()[0]
    assert row["stable"] is False and row["misplaced"] is False
    assert row["expected_node"] == "n1"


def test_placement_plan_broadcasts_no_smj(spark):
    """Topology/stability dims are broadcast; the tenant stream must not
    sort-merge-join at any point."""
    import io
    from contextlib import redirect_stdout

    from realtime_spark.plans.placement_plan import q_rebalance_audit
    from tests.conftest import SF_DIR

    buf = io.StringIO()
    with redirect_stdout(buf):
        q_rebalance_audit(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
