"""Property test: the presence handler's client rate window composed with
the error-discard socket semantics (r7 fix) against a pure-Python model of
the REFERENCE's behavior.

The model mirrors the Elixir channel exactly: limit_client_presence_event
runs first (window reset on now > reset_at, reject at counter >= max,
else increment — presence_handler.ex:215-237), the event dispatches, and
the caller adopts the handler's socket ONLY on {:ok, socket}
(realtime_channel.ex:476-500 keeps the pre-handle socket in every else
clause) — so errored events must not persist counter increments, policy
caches, or any other socket mutation.

Random event sequences (track with random payloads including non-maps and
repeats, untrack, unknown events, jumping clocks) must produce the same
(result, counter, reset_at, tracked-payload) trajectory in the engine's
handler and the model.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_spark.functions.presence_events import (
    CLIENT_RATE_LIMIT_EXCEEDED,
    INVALID_PAYLOAD,
    UNKNOWN_PRESENCE_EVENT,
    ClientRateLimit,
    PresencePolicies,
    PresenceSocket,
    PresenceTracker,
    TenantLimits,
    handle_presence_event,
)

MAX_CALLS = 3
WINDOW_MS = 100


class _Model:
    """Pure-Python reimplementation of the reference trajectory."""

    def __init__(self) -> None:
        self.counter = 0
        self.reset_at: int | None = None
        self.tracked = None  # presence_track_payload
        self.state: dict[str, object] = {}

    def step(self, msg: dict, now: int) -> str:
        if "event" not in msg:
            return "ok"
        # snapshot: error paths discard all mutations
        counter, reset_at = self.counter, self.reset_at
        if reset_at is None or now > reset_at:
            self.counter, self.reset_at = 1, now + WINDOW_MS
        elif counter >= MAX_CALLS:
            return CLIENT_RATE_LIMIT_EXCEEDED
        else:
            self.counter += 1

        event = "".join(
            c.lower() if "A" <= c <= "Z" else c for c in str(msg["event"])
        )
        result = self._dispatch(event, msg)
        if result != "ok":
            self.counter, self.reset_at = counter, reset_at  # discard
        return result

    def _dispatch(self, event: str, msg: dict) -> str:
        if event == "track":
            payload = msg.get("payload", {})
            if not isinstance(payload, dict):
                return INVALID_PAYLOAD
            if payload == self.tracked:
                return "ok"  # no_payload_change: counter bump persists
            self.state["k"] = payload
            self.tracked = payload
            return "ok"
        if event == "untrack":
            self.state.pop("k", None)
            self.tracked = None
            return "ok"
        return UNKNOWN_PRESENCE_EVENT


_payloads = st.one_of(
    st.fixed_dictionaries({"v": st.integers(0, 3)}),
    st.just({}),
    st.just("not-a-map"),
    st.just(["also", "not"]),
)

_events = st.one_of(
    st.sampled_from(["track", "TRACK", "untrack", "UNTRACK", "nope", "TRKCK"]),
    st.just(None),  # message without an "event" key
)


@st.composite
def _sequences(draw):
    n = draw(st.integers(1, 25))
    seq = []
    now = 0
    for _ in range(n):
        now += draw(st.sampled_from([0, 1, 10, WINDOW_MS, WINDOW_MS + 1]))
        ev = draw(_events)
        msg = {} if ev is None else {"event": ev}
        if ev is not None and "tr" in str(ev).lower():
            msg["payload"] = draw(_payloads)
        seq.append((msg, now))
    return seq


@settings(max_examples=120, deadline=None)
@given(_sequences())
def test_error_paths_leave_original_socket_structurally_unchanged(seq):
    """r8 verdict ask #4: the shallow-copy boundary in handle_presence_event
    (replace only policies + client_rate_limit) is correct ONLY while
    dispatch mutates nothing else in place. Enforce that structurally: after
    every non-'ok' dispatch the ORIGINAL socket must deep-equal its pre-call
    snapshot — any future dispatch path mutating a third (uncopied) nested
    field fails here, not as a silent caller-visible leak. The sibling
    test below proves the property has teeth."""
    import copy

    sock = PresenceSocket(
        private=False,
        presence_key="k",
        policies=PresencePolicies(read=True, write=True),
        client_rate_limit=ClientRateLimit(max_calls=MAX_CALLS, window_ms=WINDOW_MS),
    )
    tracker = PresenceTracker()
    tenant = TenantLimits()

    for msg, now in seq:
        snap = copy.deepcopy(sock)
        got, out = handle_presence_event(msg, sock, tracker, tenant, now)
        if got != "ok":
            assert out is sock, "error tuples must return the pre-handle socket"
            assert sock == snap, (
                f"dispatch leaked an in-place mutation through the shallow-copy "
                f"boundary on {got!r}: {sock} != {snap}"
            )
        sock = out


def test_boundary_property_catches_third_field_mutation(monkeypatch):
    """Teeth check for the structural property above: a dispatch path that
    mutates a nested structure OUTSIDE the two replace()-isolated ones (here
    the tracked-payload dict, which the shallow copy deliberately shares)
    must be visible on the original socket — exactly the violation the
    property asserts never happens with the real dispatch."""
    import copy

    import realtime_spark.functions.presence_events as pe

    def evil_dispatch(message, socket, tracker, tenant, now_ms,
                      tenant_rate_avg, authorize):
        # in-place mutation of an uncopied nested field
        socket.presence_track_payload["evil"] = True
        return UNKNOWN_PRESENCE_EVENT, socket

    monkeypatch.setattr(pe, "_dispatch_event", evil_dispatch)
    sock = PresenceSocket(
        presence_key="k",
        presence_track_payload={"v": 1},
        policies=PresencePolicies(read=True, write=True),
        client_rate_limit=ClientRateLimit(max_calls=MAX_CALLS, window_ms=WINDOW_MS),
    )
    snap = copy.deepcopy(sock)
    got, out = pe.handle_presence_event(
        {"event": "track", "payload": {"v": 2}}, sock, PresenceTracker(),
        TenantLimits(), 0,
    )
    assert got == UNKNOWN_PRESENCE_EVENT and out is sock
    # the violation IS caught by the structural compare the property runs
    assert sock != snap and sock.presence_track_payload == {"v": 1, "evil": True}


@settings(max_examples=120, deadline=None)
@given(_sequences())
def test_rate_window_and_error_discard_match_reference_model(seq):
    sock = PresenceSocket(
        private=False,
        presence_key="k",
        policies=PresencePolicies(read=True, write=True),
        client_rate_limit=ClientRateLimit(max_calls=MAX_CALLS, window_ms=WINDOW_MS),
    )
    tracker = PresenceTracker()
    tenant = TenantLimits()
    model = _Model()

    for msg, now in seq:
        want = model.step(msg, now)
        got, sock = handle_presence_event(msg, sock, tracker, tenant, now)
        assert got == want, (msg, now)
        assert sock.client_rate_limit.counter == model.counter
        assert sock.client_rate_limit.reset_at == model.reset_at
        assert sock.presence_track_payload == model.tracked
        assert tracker.state == model.state
