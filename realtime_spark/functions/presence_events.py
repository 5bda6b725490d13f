"""Presence event handling — the WS-ingress decision machine that turns a
raw `presence` channel message into tracker mutations and socket state.

Reference: lib/realtime_web/channels/realtime_channel/presence_handler.ex
(handle/3, sync/1, track/2, limit_presence_event/1,
limit_client_presence_event/1, check_track_payload/2,
maybe_authorize_presence_read/3) with its test table in
test/realtime_web/channels/realtime_channel/presence_handler_test.exs.
Semantics ported, not the framework:

  - events are ASCII-lowercased; a payload without an "event" key is a
    silent no-op (handle/3 final clause).
  - the CLIENT window rate limit runs before any event dispatch
    (limit_client_presence_event — fixed window of max_calls per
    window_ms); the TENANT average rate limit runs inside track/sync
    (limit_presence_event — avg > max_presence_events_per_second).
  - "track": public sockets track immediately; private sockets with an
    unevaluated write policy authorize presence.read (only if unevaluated
    — the join skips it while presence is disabled) then presence.write
    ONCE and cache both on the socket ("only checks write policies once");
    private sockets with write=False are :unauthorized.
  - track payload: `payload["payload"]` defaulting to {}; non-map is
    :invalid_payload; identical to the last tracked payload is a NO-OP
    ("tracking the same payload does nothing"); oversized is
    :payload_size_exceeded; an already-tracked key UPDATES its metadata.
  - a successful track ENABLES presence on the socket; "untrack" and
    unknown events never do. "untrack" clears the tracked payload and is
    not policy-gated; unknown events are :unknown_presence_event.
  - sync: disabled-presence sockets no-op; public sockets push the state
    (rate-limited); private sockets push only when presence.read is True.

The tracker itself is the engine's presence machinery
(streaming/presence.py) — `PresenceTracker` here is the single-channel
model of it, and `track_events_df` bridges a sequence of handled events
into the frame `presence_diffs_batch` consumes, making this the front
door of the presence path rather than parity decoration.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


# -- error atoms (presence_handler.ex @spec) ---------------------------------

INVALID_PAYLOAD = "invalid_payload"
RLS_POLICY_ERROR = "rls_policy_error"
UNAUTHORIZED = "unauthorized"
RATE_LIMIT_EXCEEDED = "rate_limit_exceeded"
CLIENT_RATE_LIMIT_EXCEEDED = "client_rate_limit_exceeded"
UNABLE_TO_TRACK_PRESENCE = "unable_to_track_presence"
PAYLOAD_SIZE_EXCEEDED = "payload_size_exceeded"
UNKNOWN_PRESENCE_EVENT = "unknown_presence_event"
UNABLE_TO_SET_POLICIES = "unable_to_set_policies"


@dataclass
class ClientRateLimit:
    """limit_client_presence_event/1: fixed window counter."""

    max_calls: int = 10
    window_ms: int = 1000
    counter: int = 0
    reset_at: int | None = None


@dataclass
class PresencePolicies:
    read: bool | None = None
    write: bool | None = None


@dataclass
class PresenceSocket:
    """The socket-assigns subset the handler reads/writes."""

    private: bool = False
    presence_enabled: bool = True
    presence_key: str = "key"
    policies: PresencePolicies = field(default_factory=PresencePolicies)
    presence_track_payload: Any = None
    client_rate_limit: ClientRateLimit = field(default_factory=ClientRateLimit)


@dataclass
class TenantLimits:
    max_payload_size_bytes: int = 3_000_000
    max_presence_events_per_second: float = 10_000.0


class PresenceTracker:
    """Single-channel model of the Phoenix tracker the engine's presence
    diff machinery maintains: key -> payload, with the RAW admitted
    track/untrack events recorded in arrival order so `track_events_df`
    can replay them set-at-a-time (the diff operator derives
    join/update/leave itself)."""

    def __init__(self) -> None:
        self.state: dict[str, Any] = {}
        self.log: list[tuple[str, str, Any]] = []  # (action, key, payload)

    def track(self, key: str, payload: Any) -> str:
        already = key in self.state
        self.state[key] = payload
        self.log.append(("track", key, payload))
        return "updated" if already else "tracked"

    def untrack(self, key: str) -> None:
        self.state.pop(key, None)
        self.log.append(("untrack", key, None))


def _payload_bytes(payload: Any) -> int:
    """Serialized payload size in BYTES — the same JSON-octet convention
    scalar.payload_size_ok (F8) uses; the reference measures
    :erlang.external_size + a fixed 500-byte padding
    (lib/realtime/tenants.ex:532-536), a documented representation delta."""
    import json

    return len(json.dumps(payload, separators=(",", ":"), default=str).encode("utf-8"))


def handle_presence_event(
    message: dict,
    socket: PresenceSocket,
    tracker: PresenceTracker,
    tenant: TenantLimits,
    now_ms: int,
    tenant_rate_avg: float = 0.0,
    authorize: Callable[[], tuple[bool | None, bool | None]] | None = None,
) -> tuple[str, PresenceSocket]:
    """handle/3. Returns ('ok' | error-atom, socket). `authorize` is the
    read/write policy evaluator (the RLS probe the engine runs through
    apply_rls_* — injected, like the reference's db_conn); it may raise
    PolicyError(reason) to surface an RLS failure.

    Socket mutations take effect ONLY on 'ok': the reference's error
    tuples carry no socket, and the channel's else-clauses keep the
    PRE-handle socket (realtime_channel.ex handle_in("presence", ...)
    :476-500) — so an errored event does not consume client-rate budget,
    and an unauthorized track does NOT cache its just-evaluated policies
    (the next track re-authorizes). Tracker mutations only happen on
    paths that return 'ok', so they need no rollback."""
    if not isinstance(message, dict) or "event" not in message:
        return "ok", socket  # handle(_, _, socket) -> {:ok, socket}
    from dataclasses import replace

    # keep-pre-handle-socket without a full deep copy: the dispatch only
    # mutates the two flat nested dataclasses in place (rate-limit counter,
    # cached policies) and REBINDS presence_enabled/presence_track_payload
    # — so shallow replaces of exactly those two isolate the original,
    # while the (arbitrarily large) track payload is never copied.
    work = replace(
        socket,
        policies=replace(socket.policies),
        client_rate_limit=replace(socket.client_rate_limit),
    )
    result, work = _dispatch_event(
        message, work, tracker, tenant, now_ms, tenant_rate_avg, authorize
    )
    return result, (work if result == "ok" else socket)


def _dispatch_event(
    message: dict,
    socket: PresenceSocket,
    tracker: PresenceTracker,
    tenant: TenantLimits,
    now_ms: int,
    tenant_rate_avg: float,
    authorize: Callable[[], tuple[bool | None, bool | None]] | None,
) -> tuple[str, PresenceSocket]:
    # String.downcase(event, :ascii): ASCII-only — Python's .lower() would
    # also fold unicode (the Kelvin-sign K aliases 'track' under full
    # casefolding, which the reference treats as an unknown event)
    event = "".join(
        c.lower() if "A" <= c <= "Z" else c for c in str(message["event"])
    )

    # client window limit FIRST — applies to every event kind
    rl = socket.client_rate_limit
    if rl.reset_at is None or now_ms > rl.reset_at:
        rl.counter, rl.reset_at = 1, now_ms + rl.window_ms
    elif rl.counter >= rl.max_calls:
        return CLIENT_RATE_LIMIT_EXCEEDED, socket
    else:
        rl.counter += 1

    if event == "track":
        if socket.private and socket.policies.write is None:
            # presence being enabled by this track: evaluate read (only if
            # the join left it unevaluated) + write ONCE, cache on socket
            if authorize is None:
                return UNABLE_TO_SET_POLICIES, socket
            try:
                read, write = authorize()
            except PolicyError as e:
                return e.reason, socket
            if socket.policies.read is None:
                socket.policies.read = read
            socket.policies.write = write
        if socket.private and not socket.policies.write:
            return UNAUTHORIZED, socket
        return _track(message, socket, tracker, tenant, tenant_rate_avg)

    if event == "untrack":
        tracker.untrack(socket.presence_key)
        socket.presence_track_payload = None
        return "ok", socket

    return UNKNOWN_PRESENCE_EVENT, socket


class PolicyError(Exception):
    def __init__(self, reason: str) -> None:
        super().__init__(reason)
        self.reason = reason


def _track(
    message: dict,
    socket: PresenceSocket,
    tracker: PresenceTracker,
    tenant: TenantLimits,
    tenant_rate_avg: float,
) -> tuple[str, PresenceSocket]:
    payload = message.get("payload", {})
    if not isinstance(payload, dict):
        return INVALID_PAYLOAD, socket
    if payload == socket.presence_track_payload:
        return "ok", socket  # no_payload_change -> no-op
    if _payload_bytes(payload) > tenant.max_payload_size_bytes:
        return PAYLOAD_SIZE_EXCEEDED, socket
    if tenant_rate_avg > tenant.max_presence_events_per_second:
        return RATE_LIMIT_EXCEEDED, socket
    tracker.track(socket.presence_key, payload)
    socket.presence_enabled = True
    socket.presence_track_payload = payload
    return "ok", socket


def sync_presence(
    socket: PresenceSocket,
    tracker: PresenceTracker,
    tenant: TenantLimits,
    tenant_rate_avg: float = 0.0,
) -> tuple[str, dict | None]:
    """sync/1: ('ok', state-to-push | None) or (error, None)."""
    if not socket.presence_enabled:
        return "ok", None
    if socket.private and not socket.policies.read:
        return "ok", None
    if tenant_rate_avg > tenant.max_presence_events_per_second:
        return RATE_LIMIT_EXCEEDED, None
    return "ok", dict(tracker.state)


def track_events_df(spark, tracker: PresenceTracker, topic: str = "room:1"):
    """Bridge the tracker's admitted raw event log into the frame
    streaming/presence.py's diff machinery consumes — (topic,
    presence_key, action, meta, ts[, seq]) in arrival order. The handled
    events ARE the presence stream, closing handler -> tracker -> diffs
    end-to-end (the diff operator derives join/update/leave)."""
    import json

    rows = []
    for i, (action, key, payload) in enumerate(tracker.log):
        meta = None if payload is None else json.dumps(payload, sort_keys=True)
        rows.append((topic, key, action, meta, i, i))
    return spark.createDataFrame(
        rows,
        "topic string, presence_key string, action string, meta string, "
        "ts bigint, seq bigint",
    )
