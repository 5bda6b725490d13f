"""Differential property tests for the dispatch layer: hypothesis drives
random batches/subscriber sets through the Spark operators and through
direct pure-Python transcriptions of the reference pipelines
(batch_broadcast.ex broadcast/4 and message_dispatcher.ex dispatch/3), and
the outcomes must agree row-for-row."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_spark.operators.dispatch import (
    batch_broadcast_outcomes,
    fastlane_pairs,
)

_TOPICS = ["t0", "t1"]
_ROLES = ["anon", "auth"]

# (topic_i, private, role_i, payload_len, super_user) per message
_bb_msg = st.tuples(
    st.integers(0, 1),
    st.booleans(),
    st.integers(0, 1),
    st.sampled_from([1, 900, 1001]),
    st.just(False),
)
# per-tenant config: (suspended, max_eps, current_eps, super_user)
_bb_tenant = st.tuples(
    st.booleans(),
    st.integers(0, 6),
    st.integers(0, 6),
    st.booleans(),
)
# policy grid: can_write per (topic, role)
_bb_policies = st.lists(st.booleans(), min_size=4, max_size=4)


def _py_batch(msgs, tenant, policies):
    """batch_broadcast.ex:51-95,170-184 transcribed."""
    suspended, max_eps, current_eps, super_user = tenant
    out = {}
    any_invalid = any(plen > 1000 for _, _, _, plen, _ in msgs)
    for i, (topic_i, private, role_i, plen, _) in enumerate(msgs):
        if suspended:
            out[i] = "tenant_suspended"
        elif any_invalid:
            out[i] = "invalid_batch"
        elif current_eps > max_eps:
            out[i] = "rate_limited"
        elif len(msgs) + current_eps > max_eps:
            out[i] = "batch_too_large"
        elif not private:
            out[i] = "sent_public"
        elif super_user:
            out[i] = "sent_super_user"
        elif policies[topic_i * 2 + role_i]:
            out[i] = "sent_private"
        else:
            out[i] = "unauthorized"
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_bb_msg, min_size=1, max_size=12),
    _bb_tenant,
    _bb_policies,
)
def test_batch_broadcast_matches_reference_fold(spark, msgs, tenant, policies):
    suspended, max_eps, current_eps, super_user = tenant
    mrows = [
        (
            "a",
            str(i),
            _TOPICS[t],
            "e",
            "x" * plen,
            priv,
            _ROLES[r],
            super_user,
        )
        for i, (t, priv, r, plen, _) in enumerate(msgs)
    ]
    mdf = spark.createDataFrame(
        mrows,
        "tenant_id string, id string, topic string, event string, "
        "payload_json string, private boolean, claims_role string, "
        "super_user boolean",
    )
    tdf = spark.createDataFrame(
        [("a", suspended, max_eps, current_eps, 1)],
        "tenant_id string, suspended boolean, max_eps long, current_eps long, "
        "max_payload_kb int",
    )
    pdf = spark.createDataFrame(
        [
            (_TOPICS[t], _ROLES[r], policies[t * 2 + r])
            for t in (0, 1)
            for r in (0, 1)
        ],
        "topic string, claims_role string, can_write boolean",
    )
    got = {
        int(r["id"]): r["outcome"]
        for r in batch_broadcast_outcomes(mdf, tdf, pdf).collect()
    }
    assert got == _py_batch(msgs, tenant, policies)


# fastlane: message (event_i, is_ub, enc_i, uid or None), subscriber
# (presence_i tri-state, bcast_i tri-state, serializer_i, replayed uid)
_EVENTS = ["presence_diff", "broadcast", "system"]
_fl_msg = st.tuples(
    st.integers(0, 2),
    st.booleans(),
    st.integers(0, 1),
    st.one_of(st.none(), st.integers(0, 3)),
)
_fl_sub = st.tuples(
    st.integers(0, 2),
    st.integers(0, 2),
    st.integers(0, 1),
    st.integers(0, 3),
)
_TRI = [True, False, None]


def _py_fastlane(msg, subs):
    """message_dispatcher.ex:46-116 + the V1 binary UserBroadcast encode
    failure (:163-168), transcribed per subscriber."""
    event_i, is_ub, enc_i, uid = msg
    event = _EVENTS[event_i]
    enc = ["json", "binary"][enc_i] if is_ub else None
    out = {}
    for j, (pres_i, bc_i, ser_i, replayed_uid) in enumerate(subs):
        pres, bc = _TRI[pres_i], _TRI[bc_i]
        ser = ["v1", "v2"][ser_i]
        if event == "presence_diff":
            if pres is False:
                out[j] = "withheld"
            elif pres is None:
                out[j] = "deferred"
            else:
                out[j] = "delivered"
        elif (is_ub or event == "broadcast") and bc is not True:
            out[j] = "withheld"
        elif uid is not None and uid == replayed_uid:
            out[j] = "replayed"
        elif is_ub and enc == "binary" and ser == "v1":
            out[j] = "encode_failed"
        else:
            out[j] = "delivered"
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_fl_msg, st.lists(_fl_sub, min_size=1, max_size=8))
def test_fastlane_matches_reference_dispatch(spark, msg, subs):
    event_i, is_ub, enc_i, uid = msg
    mdf = spark.createDataFrame(
        [
            (
                1,
                "t",
                "room",
                _EVENTS[event_i],
                is_ub,
                ["json", "binary"][enc_i] if is_ub else None,
                str(uid) if uid is not None else None,
                "sender",
            )
        ],
        "msg_id long, tenant_id string, topic string, event string, "
        "is_user_broadcast boolean, payload_encoding string, "
        "message_uid string, sender_socket string",
    )
    sdf = spark.createDataFrame(
        [
            (
                f"s{j}",
                "t",
                "room",
                ["v1", "v2"][ser_i],
                _TRI[pres_i],
                _TRI[bc_i],
                [str(ruid)],
            )
            for j, (pres_i, bc_i, ser_i, ruid) in enumerate(subs)
        ],
        "socket_id string, tenant_id string, join_topic string, "
        "serializer string, presence_read boolean, broadcast_read boolean, "
        "replayed_ids array<string>",
    )
    got = {
        int(r["socket_id"][1:]): r["outcome"]
        for r in fastlane_pairs(mdf, sdf).collect()
    }
    assert got == _py_fastlane(msg, subs)
