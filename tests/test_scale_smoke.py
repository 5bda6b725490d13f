"""Scale smoke: replicate the sf change stream N× (distinct change ids) and
drive the full compiled CDC match — row counts must scale exactly linearly
and the plan must stay shuffle-free regardless of input size.

Gated behind SPARK_GRAFT_SCALE_TEST=1 (adds ~1-2 min): run before claiming a
plan change is scale-safe.
"""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from realtime_spark.operators.cdc import match_changes
from realtime_spark.sources.testdata import changes_from_orders

REPLICAS = 20

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="set SPARK_GRAFT_SCALE_TEST=1 to run the scale smoke",
)


def _replicate(changes, n: int):
    """n copies with distinct change ids; every other column (and so every
    filter decision) is identical per copy."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    rep = changes.select("*", reps)
    return rep.withColumn(
        "change_id", F.col("change_id") + F.col("rep") * F.lit(10_000_000_000)
    ).drop("rep")


def test_match_scales_linearly_and_stays_shuffle_free(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf0.1")
    changes = changes_from_orders(spark, sf_dir)
    subs = em.subscriptions_df(spark, em._MULTI_SPECS)

    base = match_changes(changes, subs)
    base_rows = base.count()
    base_pairs = base.select(F.explode("subscription_ids")).count()

    big = _replicate(changes, REPLICAS)
    # replication strips the typed-source contract -> exercises the generic
    # (record-map) compiled path, the one a real wal2json stream uses
    out = match_changes(big, subs)
    plan = io.StringIO()
    with redirect_stdout(plan):
        out.explain("formatted")
    assert "Exchange" not in plan.getvalue(), "match must stay shuffle-free"

    assert out.count() == base_rows * REPLICAS
    assert (
        out.select(F.explode("subscription_ids")).count() == base_pairs * REPLICAS
    )


def test_behavior_family_scales_linearly(spark):
    """Replicate events 10x under shifted user ids: per-key operators must
    produce exactly 10x the transition counts and identical per-replica
    OLS slopes — per-key isolation means sharded replication changes
    nothing but the multiplicity."""
    from realtime_spark.operators.markov import transitions
    from realtime_spark.operators.stats import ols_trend
    from realtime_spark.sources.testdata import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    e = load_table(spark, sf, "events")
    n = 10
    rep = e.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    ).withColumn(
        "user_id", F.col("user_id") + F.col("rep") * F.lit(1_000_000)
    ).drop("rep")

    base_t = {
        (r["from_type"], r["to_type"]): r["cnt"]
        for r in transitions(e).collect()
    }
    rep_t = {
        (r["from_type"], r["to_type"]): r["cnt"]
        for r in transitions(rep).collect()
    }
    assert rep_t == {k: v * n for k, v in base_t.items()}

    # OLS per event_type: replicas add identical (x, y) multisets and the
    # normal equations scale-cancel up to the final double conversion
    # (100x-scaled integer sums can round differently in the last ulp)
    base_s = {r["event_type"]: r["slope_cents_per_sec"] for r in ols_trend(e, ["event_type"]).collect()}
    rep_s = {r["event_type"]: r["slope_cents_per_sec"] for r in ols_trend(rep, ["event_type"]).collect()}
    assert set(base_s) == set(rep_s)
    for k in base_s:
        assert abs(base_s[k] - rep_s[k]) <= 1e-6, (k, base_s[k], rep_s[k])


def test_fastlane_dispatch_scales_linearly(spark):
    """Replicate the message feed 20x under distinct msg_ids: every gate
    decision (sender skip, presence/broadcast_read, replay dedup, encode
    failure) is a pure function of (message fields, socket fields), so each
    replica reproduces the base decisions exactly — deliveries and summary
    rows must scale exactly linearly."""
    from pyspark.sql import functions as F

    from realtime_spark.operators.dispatch import fastlane_pairs, fastlane_summary
    from realtime_spark.plans.dispatch_plan import _fl_messages, _fl_subscribers

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    msgs = _fl_messages(spark, sf)
    subs = _fl_subscribers(spark)
    base = fastlane_summary(fastlane_pairs(msgs, subs))
    base_n = base.count()
    base_d = base.agg(F.sum("n_delivered")).collect()[0][0]

    rep = msgs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("rep")
    ).withColumn(
        "msg_id", F.col("msg_id") + F.col("rep") * F.lit(10_000_000_000)
    ).drop("rep")
    big = fastlane_summary(fastlane_pairs(rep, subs))
    assert big.count() == base_n * REPLICAS
    assert big.agg(F.sum("n_delivered")).collect()[0][0] == base_d * REPLICAS


def test_cdc_fanout_scales_linearly(spark):
    """Replicate the change feed 20x under distinct msg_ids: per-socket CDC
    visibility (topic join + id intersection + new-api gate) is decided per
    change row, so deliveries and encode-once counts scale exactly."""
    from pyspark.sql import functions as F

    from realtime_spark.operators.dispatch import cdc_fanout, cdc_fanout_summary
    from realtime_spark.plans.dispatch_plan import _cdc_changes, _cdc_subscribers

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    changes = _cdc_changes(spark, sf)
    subs = _cdc_subscribers(spark)
    base_deliv = cdc_fanout(changes, subs)
    base_n = base_deliv.count()
    base_enc = cdc_fanout_summary(base_deliv).agg(F.sum("n_encodes")).collect()[0][0]

    rep = changes.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("rep")
    ).withColumn(
        "msg_id", F.col("msg_id") + F.col("rep") * F.lit(10_000_000_000)
    ).drop("rep")
    big_deliv = cdc_fanout(rep, subs)
    assert big_deliv.count() == base_n * REPLICAS
    big_enc = cdc_fanout_summary(big_deliv).agg(F.sum("n_encodes")).collect()[0][0]
    assert big_enc == base_enc * REPLICAS


def test_placement_audit_scales_linearly(spark):
    """Replicate the tenant registry 20x under distinct tenant ids: the audit
    emits exactly one verdict row per tenant (20x rows), every expected_node
    stays inside the region's topology (placement is hash-of-tenant, so
    per-replica assignments differ — validity, not equality, is the
    invariant), and the tenant side of the plan stays shuffle-free (the only
    exchange is the broadcast of the 1-row stability aggregate + topology)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from realtime_spark.plans.placement_plan import (
        _CUR_NODES,
        _DEFAULT_NODE,
        _PREV_NODES,
        _nodes_df,
        _pl_tenants,
    )
    from realtime_spark.operators.placement import rebalance_audit

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    tenants = _pl_tenants(spark, sf)
    base_n = tenants.count()
    rep = tenants.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("rep")
    ).withColumn(
        "tenant_id", F.concat(F.col("tenant_id"), F.lit("#"), F.col("rep"))
    ).drop("rep")
    out = rebalance_audit(rep, _nodes_df(spark, _PREV_NODES), _nodes_df(spark, _CUR_NODES), _DEFAULT_NODE)
    assert out.count() == base_n * REPLICAS

    valid = {r: set() for r, _ in _CUR_NODES}
    for r, n in _CUR_NODES:
        valid[r].add(n)
    bad = out.filter(
        F.col("platform_region").isin(*valid.keys())
        & ~F.col("expected_node").isin(
            *{n for ns in valid.values() for n in ns}
        )
    ).count()
    assert bad == 0

    plan = io.StringIO()
    with redirect_stdout(plan):
        out.explain("formatted")
    # tenant-side shuffle-free: exchanges exist only under the broadcast
    # dims (topology groupBy, 1-row stability fold) — no Exchange node may
    # carry tenant rows. Formatted-plan node blocks list their Input
    # attributes, so any exchange whose input mentions tenant_id is a
    # tenant-row shuffle.
    for block in plan.getvalue().split("\n\n"):
        first = block.strip().splitlines()[0] if block.strip() else ""
        if ") Exchange" in first or ") BroadcastExchange" in first:
            assert "tenant_id" not in block, f"tenant rows shuffled:\n{block}"


def test_pgoutput_decode_scales_by_slot(spark):
    """Replicate the pgoutput frame feed N x under distinct slot names: the
    decode must produce exactly N x the change rows with identical per-slot
    content — slots are the unit of parallelism, so slot-sharded
    replication changes only the multiplicity, never the decode."""
    from realtime_spark.sources.pgoutput import (
        decode_pgoutput,
        pgoutput_frames_from_orders,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    n = 10
    frames = pgoutput_frames_from_orders(spark, sf)
    rep = frames.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    ).withColumn(
        "slot", F.concat_ws("#", F.col("slot"), F.col("rep").cast("string"))
    ).drop("rep")

    base = decode_pgoutput(frames)
    big = decode_pgoutput(rep)
    base_n = base.count()
    assert big.count() == base_n * n
    base_actions = {
        (r["action"], r["cnt"])
        for r in base.groupBy("action").agg(F.count("*").alias("cnt")).collect()
    }
    big_actions = {
        (r["action"], r["cnt"] // n)
        for r in big.groupBy("action").agg(F.count("*").alias("cnt")).collect()
    }
    assert base_actions == big_actions


def test_compaction_listing_cost_drops_with_epochs(spark, tmp_path):
    """The run-forever claim, as a repeatable measurement: an 80-epoch
    store must compact to a single-digit file count, read strictly faster,
    and return identical rows. (The absolute numbers live in SCALE.md;
    this smoke pins the DIRECTION so a regression in the fold or the
    manifest filter shows up as a failed ratio, not a stale doc.)"""
    import time

    from realtime_spark.streaming.compaction import compact_store, read_store

    store = str(tmp_path / "digests")
    n_epochs = 80
    for i in range(n_epochs):
        spark.range(i * 500, (i + 1) * 500).selectExpr(
            "md5(cast(id AS string)) AS digest"
        ).coalesce(2).write.mode("overwrite").parquet(
            f"{store}/ingest_epoch=e{i}"
        )

    def nfiles() -> int:
        return sum(len(fs) for _, _, fs in os.walk(store))

    def read_wall() -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            read_store(spark, store).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    rows_before = read_store(spark, store).count()
    files_before = nfiles()
    wall_before = read_wall()

    compact_store(spark, store, lambda df, p: df.coalesce(4).write.parquet(p))

    assert read_store(spark, store).count() == rows_before
    files_after = nfiles()
    assert files_after < files_before / 10, (files_before, files_after)
    wall_after = read_wall()
    assert wall_after < wall_before, (wall_before, wall_after)
