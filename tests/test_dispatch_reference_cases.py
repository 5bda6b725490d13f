"""The reference's own dispatch test tables, ported case-for-case.

Each parametrized case transcribes one test from
/root/reference/test/realtime/tenants/batch_broadcast_test.exs or
/root/reference/test/realtime_web/channels/realtime_channel/
message_dispatcher_test.exs (file:line cited per case) and asserts the
same expectation against operators/dispatch.py. The hypothesis
differentials (test_dispatch_property.py) cover the space; this file pins
the reference's named scenarios one-to-one so a semantics drift is
reported by the scenario it breaks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_spark.operators.dispatch import (
    batch_broadcast_outcomes,
    fastlane_pairs,
    fastlane_summary,
    single_broadcast_outcomes,
)

_MSG_SCHEMA = (
    "tenant_id string, id string, topic string, event string, "
    "payload_json string, private boolean, claims_role string, "
    "super_user boolean"
)
_TEN_SCHEMA = (
    "tenant_id string, suspended boolean, max_eps long, current_eps long, "
    "max_payload_kb long"
)
_POL_SCHEMA = "topic string, claims_role string, can_write boolean"

_TENANT_OK = ("t1", False, 100, 0, 1)


def _batch(spark, msgs, tenant=_TENANT_OK, policies=()):
    m = spark.createDataFrame(msgs, _MSG_SCHEMA)
    t = spark.createDataFrame([tenant], _TEN_SCHEMA)
    p = spark.createDataFrame(list(policies) or [("_none", "_none", False)], _POL_SCHEMA)
    return {
        r["id"]: (r["outcome"], r["sent"])
        for r in batch_broadcast_outcomes(m, t, p).collect()
    }


def _msg(id="m1", topic="room1", event="event1", payload='{"data":"test"}',
         private=False, role="authenticated", super_user=False, tenant="t1"):
    return (tenant, id, topic, event, payload, private, role, super_user)


class TestBatchBroadcastReferenceCases:
    def test_broadcasts_multiple_public_messages(self, spark):
        """batch_broadcast_test.exs:26-43 — three public messages on two
        topics all dispatch (3 pubsub_broadcast calls expected there)."""
        out = _batch(spark, [
            _msg("m1", topic="topicA"),
            _msg("m2", topic="topicB"),
            _msg("m3", topic="topicA"),
        ])
        assert out == {k: ("sent_public", True) for k in ("m1", "m2", "m3")}

    def test_super_user_bypasses_authorization_for_private(self, spark):
        """batch_broadcast_test.exs:90-106 — super_user flag skips the
        write-policy check entirely for private messages."""
        out = _batch(spark, [_msg(private=True, super_user=True)])
        assert out["m1"] == ("sent_super_user", True)

    def test_private_with_valid_authorization(self, spark):
        """batch_broadcast_test.exs:127-154 — private + can_write policy
        dispatches."""
        out = _batch(
            spark,
            [_msg(private=True)],
            policies=[("room1", "authenticated", True)],
        )
        assert out["m1"] == ("sent_private", True)

    def test_skips_private_without_authorization(self, spark):
        """batch_broadcast_test.exs:156-185 — unauthorized private messages
        are silently dropped (no error, just not sent)."""
        out = _batch(spark, [_msg(private=True)])
        assert out["m1"] == ("unauthorized", False)

    def test_mixed_authorization_batch(self, spark):
        """batch_broadcast_test.exs:187-224 — in one batch, only the topics
        whose policy allows the write dispatch; the rest drop silently."""
        out = _batch(
            spark,
            [
                _msg("m1", topic="allowed", private=True),
                _msg("m2", topic="denied", private=True),
            ],
            policies=[
                ("allowed", "authenticated", True),
                ("denied", "authenticated", False),
            ],
        )
        assert out["m1"] == ("sent_private", True)
        assert out["m2"] == ("unauthorized", False)

    def test_missing_auth_params_for_private(self, spark):
        """batch_broadcast_test.exs:263-281 — no auth context (role matches
        no policy row) on a private message -> dropped."""
        out = _batch(spark, [_msg(private=True, role=None)])
        assert out["m1"] == ("unauthorized", False)

    def test_mixed_public_and_private(self, spark):
        """batch_broadcast_test.exs:289-346 — public and authorized-private
        messages in one batch both dispatch."""
        out = _batch(
            spark,
            [
                _msg("m1", private=False),
                _msg("m2", private=True),
            ],
            policies=[("room1", "authenticated", True)],
        )
        assert out["m1"] == ("sent_public", True)
        assert out["m2"] == ("sent_private", True)

    @pytest.mark.parametrize(
        "missing",
        ["topic", "payload", "event"],
        ids=["topic", "payload", "event"],
    )
    def test_changeset_error_when_field_missing(self, spark, missing):
        """batch_broadcast_test.exs:371-397 — a missing topic/payload/event
        fails validation; cast_embed poisons the whole batch, so the GOOD
        sibling message is rejected too (invalid_batch)."""
        bad = _msg(
            "m_bad",
            topic=None if missing == "topic" else "room1",
            payload=None if missing == "payload" else '{"d":1}',
            event=None if missing == "event" else "event1",
        )
        out = _batch(spark, [bad, _msg("m_good")])
        assert out["m_bad"] == ("invalid_batch", False)
        assert out["m_good"] == ("invalid_batch", False)

    def test_rejects_when_rate_limit_exceeded(self, spark):
        """batch_broadcast_test.exs:408-421 — RateCounter avg above
        max_events_per_second rejects the batch before any dispatch."""
        out = _batch(spark, [_msg()], tenant=("t1", False, 100, 101, 1))
        assert out["m1"] == ("rate_limited", False)

    def test_rejects_when_batch_would_exceed_rate_limit(self, spark):
        """batch_broadcast_test.exs:423-444 — avg = max-5 with a batch of 10
        rejects: batch_size + avg > max (too many messages)."""
        msgs = [_msg(f"m{i}", topic=f"topic{i}") for i in range(10)]
        out = _batch(spark, msgs, tenant=("t1", False, 100, 95, 1))
        assert all(v == ("batch_too_large", False) for v in out.values())

    def test_allows_broadcast_at_rate_limit_boundary(self, spark):
        """batch_broadcast_test.exs:446-468 — avg = max-2 with a batch of 2
        dispatches: batch_size + avg == max is NOT over the limit."""
        out = _batch(
            spark,
            [_msg("m1", topic="a"), _msg("m2", topic="b")],
            tenant=("t1", False, 100, 98, 1),
        )
        assert out == {"m1": ("sent_public", True), "m2": ("sent_public", True)}

    def test_rejects_oversized_payload(self, spark):
        """batch_broadcast_test.exs:470-491 — a payload over the tenant's
        max_payload_size_in_kb fails validation (poisons the batch)."""
        out = _batch(spark, [_msg(payload="x" * 1001)])
        assert out["m1"] == ("invalid_batch", False)

    def test_error_when_tenant_is_nil(self, spark):
        """batch_broadcast_test.exs:494-497 — broadcast(_, nil, _, _) is
        {:error, :tenant_not_found}: a message whose tenant has no row."""
        out = _batch(spark, [_msg(tenant="t_unknown")])
        assert out["m1"] == ("tenant_not_found", False)

    def test_no_broadcast_when_suspended(self, spark):
        """batch_broadcast_test.exs:499-507 — suspended tenants never
        dispatch."""
        out = _batch(spark, [_msg()], tenant=("t1", True, 100, 0, 1))
        assert out["m1"] == ("tenant_suspended", False)


_SB_SCHEMA = (
    "tenant_id string, id string, topic string, event string, "
    "payload string, content_type string, private boolean, claims_role string"
)


class TestSingleBroadcastReferenceContrasts:
    """single_broadcast.ex's four deliberate contrasts with the batch path
    (single_broadcast.ex:68-97,153-160,211-220), as one table."""

    @pytest.mark.parametrize(
        ("case", "row", "tenant", "policies", "expect"),
        [
            (
                "per-message validation: bad payload rejects only itself",
                ("t1", "m1", "room1", "e", "x" * 1001, "json", False, "r"),
                _TENANT_OK, [], ("invalid", 422),
            ),
            (
                "rate gate is >= (at the limit already rejects)",
                ("t1", "m1", "room1", "e", "p", "json", False, "r"),
                ("t1", False, 100, 100, 1), [], ("rate_limited", 429),
            ),
            (
                "unauthorized private is an explicit 403, not a silent drop",
                ("t1", "m1", "room1", "e", "p", "json", True, "r"),
                _TENANT_OK, [], ("forbidden_unauthorized", 403),
            ),
            (
                "binary payload gets the +500B external_size allowance",
                ("t1", "m1", "room1", "e", "x" * 1400, "binary", False, "r"),
                _TENANT_OK, [], ("ok_public", 202),
            ),
            (
                "json payload does NOT get the binary allowance",
                ("t1", "m1", "room1", "e", "x" * 1400, "json", False, "r"),
                _TENANT_OK, [], ("invalid", 422),
            ),
        ],
        ids=["self-reject", "rate-gte", "explicit-403", "binary-allowance",
             "json-no-allowance"],
    )
    def test_contrast(self, spark, case, row, tenant, policies, expect):
        m = spark.createDataFrame([row], _SB_SCHEMA)
        t = spark.createDataFrame([tenant], _TEN_SCHEMA)
        p = spark.createDataFrame(
            policies or [("_none", "_none", False)], _POL_SCHEMA
        )
        got = single_broadcast_outcomes(m, t, p).collect()[0]
        assert (got["outcome"], got["status"]) == expect, case


_FL_MSG_SCHEMA = (
    "msg_id long, tenant_id string, topic string, event string, "
    "is_user_broadcast boolean, payload_encoding string, "
    "message_uid string, sender_socket string"
)
_FL_SUB_SCHEMA = (
    "socket_id string, tenant_id string, join_topic string, "
    "serializer string, presence_read boolean, broadcast_read boolean, "
    "replayed_ids array<string>"
)


def _dispatch(spark, msg, subs):
    m = spark.createDataFrame([msg], _FL_MSG_SCHEMA)
    s = spark.createDataFrame(subs, _FL_SUB_SCHEMA)
    return {
        r["socket_id"]: r["outcome"] for r in fastlane_pairs(m, s).collect()
    }


def _sub(sid, serializer="v1", presence=True, bcast=True, replayed=()):
    return ("t1", sid, serializer, presence, bcast, list(replayed))


def _subrow(sid, serializer="v1", presence=True, bcast=True, replayed=()):
    return (sid, "t1", "room1", serializer, presence, bcast, list(replayed))


_BCAST = (1, "t1", "room1", "broadcast", False, None, None, None)


class TestMessageDispatcherReferenceCases:
    def test_dispatches_to_fastlane_subscribers(self, spark):
        """message_dispatcher_test.exs:81-124 — a broadcast reaches every
        subscribed socket with broadcast.read."""
        out = _dispatch(spark, _BCAST, [_subrow("s1"), _subrow("s2", "v2")])
        assert out == {"s1": "delivered", "s2": "delivered"}

    def test_broadcast_read_denied_withholds(self, spark):
        """message_dispatcher_test.exs:126-165 — subscribers denied
        broadcast.read do not receive broadcast messages."""
        out = _dispatch(
            spark, _BCAST, [_subrow("s1", bcast=False), _subrow("s2")]
        )
        assert out == {"s1": "withheld", "s2": "delivered"}

    def test_broadcast_read_nil_withholds(self, spark):
        """fastlane_metadata/8: broadcast_read? defaults true only when SET
        (message_dispatcher_test.exs:55-68); an unauthorized (nil) read on a
        private channel withholds."""
        out = _dispatch(spark, _BCAST, [_subrow("s1", bcast=None)])
        assert out == {"s1": "withheld"}

    def test_presence_diff_delivered(self, spark):
        """message_dispatcher_test.exs:225-267 — presence_diff reaches
        sockets with presence.read."""
        msg = (1, "t1", "room1", "presence_diff", False, None, None, None)
        out = _dispatch(spark, msg, [_subrow("s1")])
        assert out == {"s1": "delivered"}

    def test_presence_diff_denied_withheld(self, spark):
        """message_dispatcher_test.exs:269-316 — presence.read == false
        withholds the diff."""
        msg = (1, "t1", "room1", "presence_diff", False, None, None, None)
        out = _dispatch(spark, msg, [_subrow("s1", presence=False)])
        assert out == {"s1": "withheld"}

    def test_presence_diff_nil_defers_to_channel(self, spark):
        """message_dispatcher_test.exs:25-36 + dispatch/3 :63-66 — an
        not-yet-authorized (nil) presence_read defers the diff to the
        channel process instead of the fastlane."""
        msg = (1, "t1", "room1", "presence_diff", False, None, None, None)
        out = _dispatch(spark, msg, [_subrow("s1", presence=None)])
        assert out == {"s1": "deferred"}

    def test_replayed_message_not_redispatched(self, spark):
        """message_dispatcher_test.exs:318-356 — a message whose meta id is
        in the socket's replayed set is skipped for that socket only."""
        msg = (1, "t1", "room1", "broadcast", False, None, "uid9", None)
        out = _dispatch(
            spark, msg, [_subrow("s1", replayed=["uid9"]), _subrow("s2")]
        )
        assert out == {"s1": "replayed", "s2": "delivered"}

    def test_replayed_user_broadcast_not_redispatched(self, spark):
        """message_dispatcher_test.exs:358-398 — same replay skip for
        UserBroadcast structs (metadata id)."""
        msg = (1, "t1", "room1", "broadcast", True, "json", "uid9", None)
        out = _dispatch(spark, msg, [_subrow("s1", replayed=["uid9"])])
        assert out == {"s1": "replayed"}

    def test_binary_user_broadcast_fails_encode_on_v1(self, spark):
        """message_dispatcher_test.exs:679-763 + user_broadcast.ex:38 — a
        binary UserBroadcast cannot be converted for a V1 serializer; the
        V2 socket still gets it."""
        msg = (1, "t1", "room1", "broadcast", True, "binary", None, None)
        out = _dispatch(spark, msg, [_subrow("s1", "v1"), _subrow("s2", "v2")])
        assert out == {"s1": "encode_failed", "s2": "delivered"}

    def test_json_user_broadcast_reaches_both_serializers(self, spark):
        """message_dispatcher_test.exs:585-677 — a json UserBroadcast
        renders for V1 and V2 alike."""
        msg = (1, "t1", "room1", "broadcast", True, "json", None, None)
        out = _dispatch(spark, msg, [_subrow("s1", "v1"), _subrow("s2", "v2")])
        assert out == {"s1": "delivered", "s2": "delivered"}

    def test_sender_socket_is_skipped(self, spark):
        """message_dispatcher.ex:49,93 — the publishing socket never
        receives its own message."""
        msg = (1, "t1", "room1", "broadcast", False, None, None, "s1")
        out = _dispatch(spark, msg, [_subrow("s1"), _subrow("s2")])
        assert out == {"s2": "delivered"}

    def test_nil_sender_skips_nobody(self, spark):
        """dispatch with from = :none (HTTP-originated broadcast): every
        subscriber receives it — a NULL sender must not null-compare-skip
        every socket."""
        out = _dispatch(spark, _BCAST, [_subrow("s1"), _subrow("s2")])
        assert set(out) == {"s1", "s2"}

    def test_encodes_once_per_serializer_and_topic(self, spark):
        """message_dispatcher_test.exs:445-500 — the message is rendered
        once per unique {serializer, join_topic}, not once per socket."""
        m = spark.createDataFrame([_BCAST], _FL_MSG_SCHEMA)
        s = spark.createDataFrame(
            [_subrow("s1", "v1"), _subrow("s2", "v1"), _subrow("s3", "v2")],
            _FL_SUB_SCHEMA,
        )
        row = fastlane_summary(fastlane_pairs(m, s)).collect()[0]
        assert row["n_delivered"] == 3
        assert row["n_encodes"] == 2  # v1 once (shared by s1+s2), v2 once
