"""Broadcast event handling: the reference's broadcast_handler_test.exs
case table ported 1:1 against functions/broadcast_events.py (file:line
cited per case), plus the bridge from admitted sends into the engine's
fastlane dispatcher (sent_messages_df -> fastlane_pairs), closing the
WS-ingress trio: join (r5), presence (r6), broadcast (r6).
"""

from __future__ import annotations

import pytest

from realtime_spark.functions.broadcast_events import (
    NOREPLY,
    REPLY_OK,
    REPLY_PAYLOAD_SIZE_EXCEEDED,
    BroadcastSocket,
    handle_broadcast_event,
    sent_messages_df,
)
from realtime_spark.functions.presence_events import PolicyError

MAX = 3_000_000


def _handle(payload, sock, sent, authorize=None):
    return handle_broadcast_event(payload, sock, sent, MAX, authorize)


# -- handle/3 ------------------------------------------------------------------


def test_write_true_policy_sends():
    # broadcast_handler_test.exs:28
    s = BroadcastSocket(private=True, write_policy=True, ack_broadcast=True)
    sent = []
    out, s = _handle({"a": "b"}, s, sent)
    assert out == REPLY_OK and len(sent) == 1
    assert sent[0].event == "broadcast" and sent[0].payload == {"a": "b"}


def test_write_false_policy_does_not_send():
    # broadcast_handler_test.exs:50 — silent noreply, nothing sent
    s = BroadcastSocket(private=True, write_policy=False, ack_broadcast=True)
    sent = []
    out, s = _handle({"a": "b"}, s, sent)
    assert out == NOREPLY and sent == []


def test_nil_policy_valid_user_authorizes_and_sends():
    # broadcast_handler_test.exs:66, :88 (valid sub), :127 (valid role)
    s = BroadcastSocket(private=True, write_policy=None, ack_broadcast=True)
    sent = []
    out, s = _handle({"a": "b"}, s, sent, authorize=lambda: True)
    assert out == REPLY_OK and len(sent) == 1 and s.write_policy is True


def test_nil_policy_invalid_user_blocks():
    # broadcast_handler_test.exs:110 (invalid sub), :149 (invalid role),
    # :165 (nil policy, invalid user) — authorized to False, silent drop
    s = BroadcastSocket(private=True, write_policy=None, ack_broadcast=True)
    sent = []
    out, s = _handle({"a": "b"}, s, sent, authorize=lambda: False)
    assert out == NOREPLY and sent == [] and s.write_policy is False


def test_validation_runs_once_on_nil_and_valid():
    # broadcast_handler_test.exs:181
    calls = []

    def authorize():
        calls.append(1)
        return True

    s = BroadcastSocket(private=True, write_policy=None)
    sent = []
    for i in range(50):
        out, s = _handle({"i": i}, s, sent, authorize=authorize)
        assert out == NOREPLY  # no ack configured
    assert len(calls) == 1 and len(sent) == 50


def test_validation_runs_once_on_nil_and_blocking():
    # broadcast_handler_test.exs:204 — cached False: no re-auth, no sends,
    # and the rate counter is never bumped for a blocked socket
    calls = []

    def authorize():
        calls.append(1)
        return False

    s = BroadcastSocket(private=True, write_policy=None)
    sent = []
    for i in range(50):
        out, s = _handle({"i": i}, s, sent, authorize=authorize)
        assert out == NOREPLY
    assert len(calls) == 1 and sent == [] and s.rate_count == 0


def test_no_ack_still_sends():
    # broadcast_handler_test.exs:220
    s = BroadcastSocket(private=True, write_policy=True, ack_broadcast=False)
    sent = []
    out, s = _handle({"a": "b"}, s, sent)
    assert out == NOREPLY and len(sent) == 1


def test_public_channels_send():
    # broadcast_handler_test.exs:242 (noreply) and :263 (with ack)
    s = BroadcastSocket(private=False, ack_broadcast=False)
    sent = []
    out, s = _handle({"a": "b"}, s, sent)
    assert out == NOREPLY and len(sent) == 1
    s = BroadcastSocket(private=False, ack_broadcast=True)
    out, s = _handle({"a": "b"}, s, sent)
    assert out == REPLY_OK and len(sent) == 2


@pytest.mark.parametrize("encoding", ["json", "binary"])
def test_v2_user_broadcast_push(encoding):
    # broadcast_handler_test.exs:284 (json), :326 (binary) — the push
    # 4-tuple (event, encoding, payload, metadata) builds a UserBroadcast
    # carrying the user event and encoding; metadata is unused
    s = BroadcastSocket(private=False, ack_broadcast=True)
    sent = []
    body = b"\x01\x02" if encoding == "binary" else '{"x":1}'
    out, s = _handle(("my-event", encoding, body, {}), s, sent)
    assert out == REPLY_OK
    (m,) = sent
    assert m.is_user_broadcast and m.event == "my-event"
    assert m.payload_encoding == encoding and m.payload == body


def test_wrong_arity_tuple_is_a_plain_broadcast():
    # build_broadcast/2 pattern-matches the 4-tuple exactly; any other
    # tuple falls to the generic clause and is wrapped as a plain
    # %Phoenix.Socket.Broadcast{event: "broadcast"} (r7 review find: the
    # model previously treated EVERY tuple as a push)
    s = BroadcastSocket(private=False, ack_broadcast=True)
    sent = []
    out, s = _handle(("my-event", "json", '{"x":1}'), s, sent)
    assert out == REPLY_OK
    (m,) = sent
    assert not m.is_user_broadcast and m.event == "broadcast"
    assert m.payload == ("my-event", "json", '{"x":1}')


@pytest.mark.parametrize(
    "reason",
    ["increase_connection_pool", "rls_policy_error", "query_canceled",
     "missing_partition", "tenant_database_unavailable"],
)
def test_authorization_failures_are_silent_noreply(reason):
    # broadcast_handler_test.exs:360 (increase_connection_pool), :375
    # (failing rls policy) + the remaining error clauses: ALL log-only
    def authorize():
        raise PolicyError(reason)

    s = BroadcastSocket(private=True, write_policy=None, ack_broadcast=True)
    sent = []
    out, s = _handle({"a": "b"}, s, sent, authorize=authorize)
    assert out == NOREPLY and sent == [] and s.write_policy is None


@pytest.mark.parametrize("private", [True, False])
def test_payload_size_exceeded_without_ack_is_silent(private):
    # broadcast_handler_test.exs:391 (private), :408 (public)
    s = BroadcastSocket(private=private, write_policy=True, ack_broadcast=False)
    sent = []
    out, s = _handle({"content": "x" * (MAX + 10)}, s, sent)
    assert out == NOREPLY and sent == []


@pytest.mark.parametrize("private", [True, False])
def test_payload_size_exceeded_with_ack_replies_error(private):
    # broadcast_handler_test.exs:421 (private), :442 (public)
    s = BroadcastSocket(private=private, write_policy=True, ack_broadcast=True)
    sent = []
    out, s = _handle({"content": "x" * (MAX + 10)}, s, sent)
    assert out == REPLY_PAYLOAD_SIZE_EXCEEDED and sent == []


def test_push_size_scope_divergence_is_bounded():
    """r8 ask #7: the declared exclusive-vs-inclusive scope divergence on
    V2 pushes is asserted numerically, not just in prose. The inclusive
    view (event + encoding + payload + metadata + framing, the reference's
    whole-tuple :erlang.external_size scope) exceeds the exclusive view by
    EXACTLY json(event)+json(encoding)+json(metadata)+framing — and a push
    straddling the limit flips the verdict only inside that sliver."""
    from realtime_spark.functions.broadcast_events import (
        _PUSH_FRAMING_BYTES,
        _payload_bytes,
        push_size_bytes,
    )

    event, enc, meta = "my-event", "json", {"trace": "abc123"}
    for payload in ({"k": "v" * 100}, {"k": 1}, [1, 2, 3], "raw"):
        push = (event, enc, payload, meta)
        sliver = (
            _payload_bytes(event)
            + _payload_bytes(enc)
            + _payload_bytes(meta)
            + _PUSH_FRAMING_BYTES
        )
        assert push_size_bytes(push, True) - push_size_bytes(push, False) == sliver

    # boundary: inner payload exactly at the limit — admitted exclusive,
    # rejected inclusive; shrink past the sliver and both admit
    limit = 200
    inner = {"content": "x" * (limit - _payload_bytes({"content": ""}))}
    assert push_size_bytes((event, enc, inner, meta), False) == limit
    push = (event, enc, inner, meta)

    def verdict(inclusive):
        s = BroadcastSocket(private=False, ack_broadcast=True)
        sent = []
        out, _ = handle_broadcast_event(
            push, s, sent, limit, inclusive_push_size=inclusive
        )
        return out

    assert verdict(False) == REPLY_OK
    assert verdict(True) == REPLY_PAYLOAD_SIZE_EXCEEDED
    # non-push payloads measure identically under both scopes
    assert push_size_bytes({"a": 1}, True) == push_size_bytes({"a": 1}, False)


def test_rate_counter_increments_on_admitted_paths():
    # increment_rate_counter/1: bumps for sends AND oversized attempts,
    # skips only an explicit write=False policy
    s = BroadcastSocket(private=False)
    sent = []
    _handle({"a": 1}, s, sent)
    _handle({"content": "x" * (MAX + 10)}, s, sent)  # oversized still bumps
    assert s.rate_count == 2 and len(sent) == 1


def test_self_broadcast_controls_sender_exclusion():
    # send_message/4: self_broadcast -> pubsub_broadcast (no from socket);
    # otherwise pubsub_broadcast_from(self()) — sender excluded downstream
    sent = []
    s = BroadcastSocket(private=False, self_broadcast=True, socket_id="me")
    _handle({"a": 1}, s, sent)
    s = BroadcastSocket(private=False, self_broadcast=False, socket_id="me")
    _handle({"a": 1}, s, sent)
    assert sent[0].sender_socket is None and sent[1].sender_socket == "me"


# -- bridge into the fastlane dispatcher ---------------------------------------


@pytest.fixture(scope="module")
def spark():
    from realtime_spark.session import get_spark

    return get_spark("test_broadcast_events", cpus=4)


def test_admitted_sends_drive_fastlane_dispatch(spark):
    """handler -> sent log -> fastlane_pairs: the publishing socket is
    skipped exactly when self_broadcast was off, and read-gating applies
    to every admitted broadcast."""
    from realtime_spark.operators.dispatch import fastlane_pairs

    sent = []
    pub = BroadcastSocket(
        private=False, socket_id="sender", tenant_topic="t1:room:1",
        self_broadcast=False,
    )
    selfb = BroadcastSocket(
        private=False, socket_id="sender", tenant_topic="t1:room:1",
        self_broadcast=True,
    )
    out, _ = _handle({"a": 1}, pub, sent)
    out, _ = _handle({"a": 2}, selfb, sent)
    msgs = sent_messages_df(spark, sent)

    subscribers = spark.createDataFrame(
        [
            ("sender", "t1", "t1:room:1", "v2", True, True, []),
            ("other", "t1", "t1:room:1", "v2", True, True, []),
            ("gated", "t1", "t1:room:1", "v2", True, False, []),
        ],
        "socket_id string, tenant_id string, join_topic string, "
        "serializer string, presence_read boolean, broadcast_read boolean, "
        "replayed_ids array<string>",
    )
    got = {
        (r["msg_id"], r["socket_id"], r["outcome"])
        for r in fastlane_pairs(msgs, subscribers).collect()
    }
    # msg 0 (from 'sender'): sender skipped entirely; msg 1 (self): included
    assert (0, "other", "delivered") in got and (1, "other", "delivered") in got
    assert not any(m == 0 and sock == "sender" for m, sock, _ in got)
    assert (1, "sender", "delivered") in got
    assert (0, "gated", "withheld") in got and (1, "gated", "withheld") in got
