"""Unit tests for the dispatch layer: batch-broadcast outcome precedence
(super_user bypass, suspend/invalid/rate precedence), the channel fastlane
tri-state gates + encode-cache accounting, and CDC subscriber-id fanout.

Semantics under test mirror:
  - lib/realtime/tenants/batch_broadcast.ex:51-95,170-184
  - lib/realtime_web/channels/realtime_channel/message_dispatcher.ex:46-116
  - lib/extensions/postgres_cdc_rls/message_dispatcher.ex:11-57
"""

from __future__ import annotations

import pytest

from realtime_spark.operators.dispatch import (
    batch_broadcast_outcomes,
    cdc_fanout,
    cdc_fanout_summary,
    fastlane_pairs,
    fastlane_summary,
    presence_counter,
)

MSG_DDL = (
    "tenant_id string, id string, topic string, event string, "
    "payload_json string, private boolean, claims_role string, "
    "super_user boolean"
)
TEN_DDL = (
    "tenant_id string, suspended boolean, max_eps long, current_eps long, "
    "max_payload_kb int"
)
POL_DDL = "topic string, claims_role string, can_write boolean"


def _msg(tid, mid, topic="room", private=False, role="authenticated",
         super_user=False, payload="x", event="broadcast"):
    return (tid, mid, topic, event, payload, private, role, super_user)


def _bb(spark, msgs, tenants, policies=()):
    out = batch_broadcast_outcomes(
        spark.createDataFrame(msgs, MSG_DDL),
        spark.createDataFrame(tenants, TEN_DDL),
        spark.createDataFrame(list(policies) or [("_", "_", False)], POL_DDL),
    )
    return {r["id"]: (r["outcome"], r["sent"]) for r in out.collect()}


def test_super_user_bypasses_write_policy(spark):
    # same private topic, no write policy: the super_user batch sends, the
    # plain batch is silently unauthorized (batch_broadcast.ex:77-87)
    msgs = [
        _msg("a", "1", private=True, super_user=True),
        _msg("b", "2", private=True, super_user=False),
    ]
    tenants = [("a", False, 1000, 0, 1), ("b", False, 1000, 0, 1)]
    got = _bb(spark, msgs, tenants)
    assert got["1"] == ("sent_super_user", True)
    assert got["2"] == ("unauthorized", False)


def test_super_user_does_not_bypass_batch_gates(spark):
    # the bypass applies only to the per-topic policy lookup: suspended and
    # rate-limited tenants reject super_user batches identically
    msgs = [
        _msg("s", "1", private=True, super_user=True),
        _msg("r", "2", private=True, super_user=True),
    ]
    tenants = [("s", True, 1000, 0, 1), ("r", False, 10, 50, 1)]
    got = _bb(spark, msgs, tenants)
    assert got["1"] == ("tenant_suspended", False)
    assert got["2"] == ("rate_limited", False)


def test_one_oversized_payload_poisons_the_batch(spark):
    # cast_embed semantics: a single invalid embedded message invalidates
    # the whole changeset and nothing in the batch is dispatched
    msgs = [
        _msg("a", "1", payload="x" * 2000),
        _msg("a", "2", payload="ok"),
        _msg("b", "3", payload="ok"),
    ]
    tenants = [("a", False, 1000, 0, 1), ("b", False, 1000, 0, 1)]
    got = _bb(spark, msgs, tenants)
    assert got["1"] == ("invalid_batch", False)
    assert got["2"] == ("invalid_batch", False)
    assert got["3"] == ("sent_public", True)


def test_batch_size_precheck(spark):
    # batch_n + current_eps > max_eps fails even when current <= max
    msgs = [_msg("a", str(i)) for i in range(5)]
    tenants = [("a", False, 6, 3, 1)]
    got = _bb(spark, msgs, tenants)
    assert all(v == ("batch_too_large", False) for v in got.values())


def test_private_write_policy_gate(spark):
    msgs = [
        _msg("a", "1", topic="t1", private=True, role="authenticated"),
        _msg("a", "2", topic="t1", private=True, role="anon"),
        _msg("a", "3", topic="t2", private=True, role="authenticated"),
    ]
    tenants = [("a", False, 1000, 0, 1)]
    pols = [("t1", "authenticated", True), ("t2", "authenticated", False)]
    got = _bb(spark, msgs, tenants, pols)
    assert got["1"] == ("sent_private", True)
    assert got["2"] == ("unauthorized", False)
    assert got["3"] == ("unauthorized", False)


# ---------------------------------------------------------------------------
# single broadcast — the per-message HTTP path, contrasted with batch
# ---------------------------------------------------------------------------

SB_MSG_DDL = (
    "tenant_id string, id string, topic string, event string, payload string, "
    "content_type string, private boolean, claims_role string"
)


def _sb(spark, msgs, tenants, policies=()):
    from realtime_spark.operators.dispatch import single_broadcast_outcomes

    out = single_broadcast_outcomes(
        spark.createDataFrame(msgs, SB_MSG_DDL),
        spark.createDataFrame(tenants, TEN_DDL),
        spark.createDataFrame(list(policies) or [("_", "_", False)], POL_DDL),
    )
    return {r["id"]: (r["outcome"], r["status"], r["payload_encoding"])
            for r in out.collect()}


def test_single_broadcast_no_batch_poisoning_and_rate_gte(spark):
    # an oversized payload rejects only itself (no changeset poisoning),
    # and the rate compare is >= — current == max already limits here,
    # where the batch path's strict > would still accept
    msgs = [
        ("a", "1", "t", "e", "x" * 2000, "json", False, "anon"),
        ("a", "2", "t", "e", "ok", "json", False, "anon"),
        ("r", "3", "t", "e", "ok", "json", False, "anon"),
    ]
    tenants = [("a", False, 1000, 0, 1), ("r", False, 100, 100, 1)]
    got = _sb(spark, msgs, tenants)
    assert got["1"] == ("invalid", 422, None)
    assert got["2"] == ("ok_public", 202, "json")
    assert got["3"] == ("rate_limited", 429, None)


def test_single_broadcast_binary_allowance_and_null_payload(spark):
    # 1400 bytes: over the 1 KB json limit but inside binary's +500
    # external_size allowance; a missing payload is invalid either way
    msgs = [
        ("a", "1", "t", "e", "x" * 1400, "json", False, "anon"),
        ("a", "2", "t", "e", "x" * 1400, "binary", False, "anon"),
        ("a", "3", "t", "e", None, "binary", False, "anon"),
        ("a", "4", "t", "e", "ok", "octet", False, "anon"),  # bad content type
    ]
    tenants = [("a", False, 1000, 0, 1)]
    got = _sb(spark, msgs, tenants)
    assert got["1"] == ("invalid", 422, None)
    assert got["2"] == ("ok_public", 202, "binary")
    assert got["3"] == ("invalid", 422, None)
    assert got["4"] == ("invalid", 422, None)


def test_single_broadcast_unauthorized_is_explicit_403(spark):
    # the batch path silently drops unauthorized private messages; the
    # single path surfaces an explicit 403 — and has no super_user bypass
    msgs = [("a", "1", "t", "e", "ok", "json", True, "anon")]
    tenants = [("a", False, 1000, 0, 1)]
    got = _sb(spark, msgs, tenants)
    assert got["1"] == ("forbidden_unauthorized", 403, None)


# ---------------------------------------------------------------------------
# fastlane
# ---------------------------------------------------------------------------

FL_MSG_DDL = (
    "msg_id long, tenant_id string, topic string, event string, "
    "is_user_broadcast boolean, payload_encoding string, message_uid string, "
    "sender_socket string"
)
FL_SUB_DDL = (
    "socket_id string, tenant_id string, join_topic string, serializer string, "
    "presence_read boolean, broadcast_read boolean, replayed_ids array<string>"
)


def _fl(spark, msgs, subs):
    return fastlane_pairs(
        spark.createDataFrame(msgs, FL_MSG_DDL),
        spark.createDataFrame(subs, FL_SUB_DDL),
    )


def test_fastlane_presence_tristate_and_counter(spark):
    msgs = [(1, "t", "room", "presence_diff", False, None, None, "s9")]
    subs = [
        ("s1", "t", "room", "v1", True, True, []),
        ("s2", "t", "room", "v1", False, True, []),   # denied -> withheld
        ("s3", "t", "room", "v1", None, True, []),    # unknown -> deferred
        ("s9", "t", "room", "v1", True, True, []),    # sender -> skipped
    ]
    pairs = _fl(spark, msgs, subs)
    got = {r["socket_id"]: r["outcome"] for r in pairs.collect()}
    assert got == {"s1": "delivered", "s2": "withheld", "s3": "deferred"}
    pc = presence_counter(pairs).collect()
    assert [(r["tenant_id"], r["presence_events"]) for r in pc] == [("t", 1)]


def test_fastlane_broadcast_read_gate_and_replay(spark):
    msgs = [
        (1, "t", "room", "broadcast", False, None, "m1", "s0"),
        (2, "t", "room", "system", False, None, None, "s0"),
    ]
    subs = [
        ("s1", "t", "room", "v1", True, True, ["m1"]),   # replay dedup
        ("s2", "t", "room", "v2", True, False, []),      # broadcast denied
        ("s3", "t", "room", "v2", True, None, []),       # nil -> denied too
        ("s4", "t", "room", "v1", True, True, []),       # delivered
    ]
    pairs = _fl(spark, msgs, subs)
    got = {(r["msg_id"], r["socket_id"]): r["outcome"] for r in pairs.collect()}
    assert got[(1, "s1")] == "replayed"
    assert got[(1, "s2")] == "withheld"
    assert got[(1, "s3")] == "withheld"
    assert got[(1, "s4")] == "delivered"
    # a non-broadcast event ignores broadcast_read and replay ids
    assert got[(2, "s2")] == "delivered"
    assert got[(2, "s1")] == "delivered"


def test_fastlane_user_broadcast_flag_counts_as_broadcast(spark):
    msgs = [(1, "t", "room", "custom_evt", True, "json", None, "s0")]
    subs = [("s2", "t", "room", "v1", True, False, [])]
    pairs = _fl(spark, msgs, subs)
    assert pairs.collect()[0]["outcome"] == "withheld"


def test_fastlane_binary_user_broadcast_fails_encode_on_v1(spark):
    # convert_to_json_broadcast errors for binary payloads: V1 sockets get
    # nothing (cached failure), V2 sockets deliver; a json UserBroadcast
    # renders for both
    msgs = [
        (1, "t", "room", "ub", True, "binary", None, "s0"),
        (2, "t", "room", "ub", True, "json", None, "s0"),
    ]
    subs = [
        ("s1", "t", "room", "v1", True, True, []),
        ("s2", "t", "room", "v2", True, True, []),
    ]
    pairs = _fl(spark, msgs, subs)
    got = {(r["msg_id"], r["socket_id"]): r["outcome"] for r in pairs.collect()}
    assert got[(1, "s1")] == "encode_failed"
    assert got[(1, "s2")] == "delivered"
    assert got[(2, "s1")] == "delivered"
    assert got[(2, "s2")] == "delivered"
    rows = {r["msg_id"]: r for r in fastlane_summary(pairs).collect()}
    # the failed V1 render is still one cached fastlane! attempt
    assert rows[1]["n_encode_failed"] == 1
    assert rows[1]["n_encodes"] == 2
    assert rows[2]["n_encodes"] == 2


def test_fastlane_encode_cache_counts_distinct_serializers(spark):
    msgs = [(1, "t", "room", "system", False, None, None, "s0")]
    subs = [
        ("s1", "t", "room", "v1", True, True, []),
        ("s2", "t", "room", "v1", True, True, []),
        ("s3", "t", "room", "v2", True, True, []),
        ("s4", "t", "room", "v2", True, False, []),
    ]
    row = fastlane_summary(_fl(spark, msgs, subs)).collect()[0]
    assert row["n_delivered"] == 4  # system event: broadcast gate not applied
    assert row["n_encodes"] == 2  # one fastlane! per serializer, rest cached


# ---------------------------------------------------------------------------
# cdc fanout
# ---------------------------------------------------------------------------

CDC_MSG_DDL = "msg_id long, topic string, change_type string, sub_ids array<string>"
CDC_SUB_DDL = (
    "socket_id string, join_topic string, serializer string, is_new_api boolean, "
    "ids array<string>"
)


def test_cdc_fanout_intersection_and_api_shape(spark):
    msgs = [(1, "t0", "UPDATE", ["5", "7", "9"])]
    subs = [
        ("s1", "t0", "v1", True, ["7", "5", "99"]),
        ("s2", "t0", "v1", False, ["9"]),
        ("s3", "t0", "v1", True, ["42"]),  # disjoint -> no delivery
        ("s4", "t1", "v1", True, ["5"]),   # other topic
    ]
    out = cdc_fanout(
        spark.createDataFrame(msgs, CDC_MSG_DDL),
        spark.createDataFrame(subs, CDC_SUB_DDL),
    )
    got = {r["socket_id"]: (r["event"], r["valid_ids"]) for r in out.collect()}
    assert got == {
        "s1": ("postgres_changes", "5,7"),  # sorted intersection, new API
        "s2": ("UPDATE", "9"),  # old API keeps the change type as event
    }
    summ = cdc_fanout_summary(out).collect()[0]
    assert (summ["n_delivered"], summ["n_encodes"]) == (2, 2)


def test_cdc_fanout_encode_cache_shares_identical_renders(spark):
    msgs = [(1, "t0", "INSERT", ["5"])]
    subs = [
        ("s1", "t0", "v1", True, ["5"]),
        ("s2", "t0", "v1", True, ["5", "8"]),  # same render: ids -> ['5']
        ("s3", "t0", "v2", True, ["5"]),       # serializer differs
    ]
    out = cdc_fanout(
        spark.createDataFrame(msgs, CDC_MSG_DDL),
        spark.createDataFrame(subs, CDC_SUB_DDL),
    )
    summ = cdc_fanout_summary(out).collect()[0]
    assert (summ["n_delivered"], summ["n_encodes"]) == (3, 2)


def test_dispatch_plans_broadcast_no_smj(spark):
    """Plan shape: every dispatcher join must be a broadcast hash join —
    the subscriber/tenant side is dim-sized; an SMJ would shuffle the
    message stream at 100 TB."""
    import io
    from contextlib import redirect_stdout

    from realtime_spark.plans.dispatch_plan import (
        q_batch_broadcast_outcomes,
        q_cdc_fanout_deliveries,
        q_fastlane_dispatch,
    )
    from tests.conftest import SF_DIR

    for q in (q_batch_broadcast_outcomes, q_fastlane_dispatch, q_cdc_fanout_deliveries):
        buf = io.StringIO()
        with redirect_stdout(buf):
            q(spark, SF_DIR).explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" not in plan, f"{q.__name__}:\n{plan}"
        assert "BroadcastHashJoin" in plan, f"{q.__name__}:\n{plan}"


def test_unknown_tenant_is_not_found_on_both_paths(spark):
    # the reference resolves the tenant before either endpoint runs:
    # broadcast(_, nil, _, _) -> {:error, :tenant_not_found}; without the
    # guard the null gate comparisons would dispatch as if unlimited
    msgs = [_msg("ghost", "1")]
    got = _bb(spark, msgs, [("other", False, 10, 0, 1)])
    assert got["1"] == ("tenant_not_found", False)

    sb = _sb(
        spark,
        [("ghost", "1", "t", "e", "ok", "json", False, "anon")],
        [("other", False, 10, 0, 1)],
    )
    assert sb["1"] == ("tenant_not_found", 404, None)


def test_fastlane_null_sender_skips_nobody(spark):
    # HTTP-path broadcasts dispatch with from = :none — no subscriber is
    # the sender, so a null sender_socket must fan out to everyone
    msgs = [(1, "t", "room", "system", False, None, None, None)]
    subs = [
        ("s1", "t", "room", "v1", True, True, []),
        ("s2", "t", "room", "v2", True, True, []),
    ]
    pairs = _fl(spark, msgs, subs)
    assert {r["socket_id"] for r in pairs.collect()} == {"s1", "s2"}


def test_fanout_subscribers_pair_level_rules(spark):
    """Pair-level pin for fanout_subscribers (r10: the broadcast_fanout_self
    gate query now grades the per-message ROLLUP — linear in SF — so the
    raw-pair skip-sender/echo semantics are pinned here instead): the
    sender's own connection is skipped unless self_broadcast, and echo
    deliveries carry is_self=true."""
    from pyspark.sql import functions as F

    from realtime_spark.operators.routing import fanout_subscribers

    msgs = spark.createDataFrame(
        [(1, "t1", 10, False), (2, "t1", 10, True), (3, "t2", 20, False)],
        "id long, topic string, sender_id long, self_broadcast boolean",
    )
    subs = spark.createDataFrame(
        [("t1", 10), ("t1", 11), ("t2", 20)],
        "topic string, subscriber_id long",
    )
    got = {
        (r["id"], r["subscriber_id"], r["is_self"])
        for r in fanout_subscribers(msgs, subs).collect()
    }
    assert got == {
        (1, 11, False),        # sender 10 skipped (no self flag)
        (2, 10, True),         # self flag -> echo delivery, marked
        (2, 11, False),
        # msg 3: only subscriber IS the sender and no self flag -> nothing
    }
