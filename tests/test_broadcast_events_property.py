"""Property test: the broadcast handler against a pure-Python model of
broadcast_handler.ex — random event sequences over every payload kind
(plain map, oversized map, V2 4-tuple push, wrong-arity tuple) and every
socket configuration (private x ack x self_broadcast) with every
authorize behavior (allow / deny / raise), checking the reply, the
rate-counter trajectory (bumps on sends AND oversized attempts, never on
a blocked or unauthorized socket), the policy cache (evaluated at most
once; the blocking outcome IS cached — unlike presence, the broadcast
noreply carries the socket), and the sent-message log (event name,
user-broadcast flag, sender exclusion).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_spark.functions.broadcast_events import (
    NOREPLY,
    REPLY_OK,
    REPLY_PAYLOAD_SIZE_EXCEEDED,
    BroadcastSocket,
    handle_broadcast_event,
)
from realtime_spark.functions.presence_events import PolicyError, _payload_bytes

MAX = 200  # small cap so ordinary payloads can exceed it


class _Model:
    def __init__(self, private, ack, selfb, auth_mode):
        self.private = private
        self.ack = ack
        self.selfb = selfb
        self.auth_mode = auth_mode  # 'allow' | 'deny' | 'raise' | None
        self.write = None
        self.rate = 0
        self.auth_calls = 0
        self.sent = []

    def step(self, payload):
        if self.private:
            if self.write is None:
                if self.auth_mode is None:
                    return NOREPLY  # unable_to_set_policies
                self.auth_calls += 1
                if self.auth_mode == "raise":
                    return NOREPLY  # log-only, nothing cached
                self.write = self.auth_mode == "allow"
            if self.write is not True:
                return NOREPLY  # cached blocking policy, no bump
        if self.write is not False:
            self.rate += 1
        view = payload[2] if isinstance(payload, tuple) and len(payload) == 4 else payload
        if _payload_bytes(view) > MAX:
            return REPLY_PAYLOAD_SIZE_EXCEEDED if self.ack else NOREPLY
        if isinstance(payload, tuple) and len(payload) == 4:
            self.sent.append((payload[0], True, None if self.selfb else "me"))
        else:
            self.sent.append(("broadcast", False, None if self.selfb else "me"))
        return REPLY_OK if self.ack else NOREPLY


_payloads = st.one_of(
    st.fixed_dictionaries({"v": st.integers(0, 9)}),
    st.just({"big": "x" * (MAX + 5)}),
    st.tuples(st.sampled_from(["ev1", "ev2"]), st.just("json"),
              st.sampled_from(['{"a":1}', "y" * (MAX + 5)]), st.just({})),
    st.tuples(st.just("ev3"), st.just("json"), st.just('{"a":1}')),  # arity 3
)


@settings(max_examples=150, deadline=None)
@given(
    private=st.booleans(),
    ack=st.booleans(),
    selfb=st.booleans(),
    auth_mode=st.sampled_from(["allow", "deny", "raise", None]),
    payloads=st.lists(_payloads, min_size=1, max_size=12),
)
def test_broadcast_handler_matches_reference_model(private, ack, selfb, auth_mode, payloads):
    sock = BroadcastSocket(
        socket_id="me", private=private, ack_broadcast=ack, self_broadcast=selfb
    )
    model = _Model(private, ack, selfb, auth_mode)
    sent = []
    calls = []

    def authorize():
        calls.append(1)
        if auth_mode == "raise":
            raise PolicyError("rls_policy_error")
        return auth_mode == "allow"

    auth = None if auth_mode is None else authorize
    for p in payloads:
        want = model.step(p)
        got, sock = handle_broadcast_event(p, sock, sent, MAX, auth)
        assert got == want, (p, private, ack, auth_mode)
        assert sock.rate_count == model.rate
        assert len(calls) == model.auth_calls
        if auth_mode != "raise":
            # allow/deny cache on first evaluation ("validation only runs
            # once"); a raising evaluator caches nothing and re-runs
            assert model.auth_calls <= 1
        assert sock.write_policy == model.write

    assert [(m.event, m.is_user_broadcast, m.sender_socket) for m in sent] == model.sent
