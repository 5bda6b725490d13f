"""Presence event handling: the reference's presence_handler_test.exs case
table ported 1:1 against functions/presence_events.py (file:line cited per
case), plus the bridge from handled events into the engine's presence diff
machinery (track_events_df -> presence_diffs_batch / presence_state_batch).
"""

from __future__ import annotations

import pytest

from realtime_spark.functions.presence_events import (
    CLIENT_RATE_LIMIT_EXCEEDED,
    INVALID_PAYLOAD,
    PAYLOAD_SIZE_EXCEEDED,
    RATE_LIMIT_EXCEEDED,
    RLS_POLICY_ERROR,
    UNAUTHORIZED,
    UNKNOWN_PRESENCE_EVENT,
    ClientRateLimit,
    PolicyError,
    PresencePolicies,
    PresenceSocket,
    PresenceTracker,
    TenantLimits,
    handle_presence_event,
    sync_presence,
    track_events_df,
)

TEN = TenantLimits(max_payload_size_bytes=3_000_000)
BIG_RL = ClientRateLimit(max_calls=1000, window_ms=60_000)


def _sock(**kw):
    kw.setdefault("client_rate_limit", ClientRateLimit(max_calls=1000, window_ms=60_000))
    return PresenceSocket(**kw)


def _handle(msg, sock, tracker, now=0, avg=0.0, authorize=None):
    return handle_presence_event(msg, sock, tracker, TEN, now, avg, authorize)


# -- handle/3 ----------------------------------------------------------------


def test_private_true_policy_tracks_and_changes():
    # presence_handler_test.exs:116
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "track", "payload": {"A": "b", "c": "b"}}, s, t)
    assert out == "ok" and t.state == {"k": {"A": "b", "c": "b"}}


def test_tracking_existing_user_updates_metadata():
    # presence_handler_test.exs:138 — first track has no payload key ({})
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "track"}, s, t)
    assert out == "ok" and t.state == {"k": {}}
    out, s = _handle({"event": "track", "payload": {"content": "x"}}, s, t)
    assert out == "ok" and t.state == {"k": {"content": "x"}}
    assert len(t.log) == 2  # both admitted (update, not no-op)


def test_tracking_same_payload_does_nothing():
    # presence_handler_test.exs:165
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "track", "payload": {"a": "b"}}, s, t)
    assert out == "ok" and len(t.log) == 1
    out, s = _handle({"event": "track", "payload": {"a": "b"}}, s, t)
    assert out == "ok" and len(t.log) == 1  # no-op: nothing re-admitted


def test_track_untrack_track_same_payload_emits_events():
    # presence_handler_test.exs:186
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "track", "payload": {"a": "b"}}, s, t)
    assert out == "ok" and s.presence_track_payload == {"a": "b"}
    out, s = _handle({"event": "untrack"}, s, t)
    assert out == "ok" and s.presence_track_payload is None and t.state == {}
    out, s = _handle({"event": "track", "payload": {"a": "b"}}, s, t)
    assert out == "ok" and s.presence_track_payload == {"a": "b"}
    assert [a for a, _, _ in t.log] == ["track", "untrack", "track"]


def test_public_false_policies_can_still_track():
    # presence_handler_test.exs:222 — policies don't matter on public
    s = _sock(private=False, presence_key="k",
              policies=PresencePolicies(read=False, write=False))
    t = PresenceTracker()
    out, s = _handle({"event": "track"}, s, t)
    assert out == "ok" and "k" in t.state


def test_user_can_untrack():
    # presence_handler_test.exs:238
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    _handle({"event": "track"}, s, t)
    out, s = _handle({"event": "untrack"}, s, t)
    assert out == "ok" and t.state == {}


def test_write_policies_checked_once_on_private():
    # presence_handler_test.exs:255 — authorize runs exactly once, cached
    calls = []

    def authorize():
        calls.append(1)
        return True, True

    s = _sock(private=True, presence_key="k", policies=PresencePolicies())
    t = PresenceTracker()
    for i in range(300):
        out, s = _handle(
            {"event": "track", "payload": {"metadata": f"m{i}"}}, s, t,
            authorize=authorize,
        )
        assert out == "ok"
    assert len(calls) == 1


def test_authorize_error_atoms_pass_through():
    # presence_handler_test.exs:282 (increase_connection_pool) and :303
    # (rls_policy_error): the evaluator's failure reason IS the result
    for reason in ("increase_connection_pool", RLS_POLICY_ERROR):
        def authorize():
            raise PolicyError(reason)

        s = _sock(private=True, presence_key="k", policies=PresencePolicies())
        t = PresenceTracker()
        out, s = _handle(
            {"event": "track", "payload": {"metadata": "x"}}, s, t,
            authorize=authorize,
        )
        assert out == reason and t.state == {}


def test_public_never_authorizes():
    # presence_handler_test.exs:327 — no evaluator available, still fine
    s = _sock(private=False, presence_key="k", policies=PresencePolicies())
    t = PresenceTracker()
    for i in range(300):
        out, s = _handle({"event": "track", "payload": {"m": f"{i}"}}, s, t)
        assert out == "ok"


def test_unknown_event_errors():
    # presence_handler_test.exs:354
    s = _sock(private=False)
    out, s = _handle({"event": "unknown"}, s, PresenceTracker())
    assert out == UNKNOWN_PRESENCE_EVENT


@pytest.mark.parametrize("private", [False, True])
def test_presence_disabled_ignores_untrack(private):
    # presence_handler_test.exs:371, :384
    s = _sock(private=private, presence_enabled=False, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "untrack"}, s, t)
    assert out == "ok" and s.presence_enabled is False and t.state == {}


@pytest.mark.parametrize("private", [False, True])
def test_presence_disabled_enables_on_track(private):
    # presence_handler_test.exs:398, :416
    s = _sock(private=private, presence_enabled=False, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "track"}, s, t)
    assert out == "ok" and s.presence_enabled is True and "k" in t.state


def test_untrack_and_unknown_do_not_enable():
    # presence_handler_test.exs:435, :453
    s = _sock(private=True, presence_enabled=False, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "untrack"}, s, t)
    assert out == "ok" and s.presence_enabled is False
    out, s = _handle({"event": "unknown"}, s, t)
    assert out == UNKNOWN_PRESENCE_EVENT and s.presence_enabled is False


@pytest.mark.parametrize("private", [True, False])
def test_tenant_rate_limit_checked(private):
    # presence_handler_test.exs:468, :485 — tenant average over the max
    s = _sock(private=private, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    out, s = _handle({"event": "track"}, s, t, avg=TEN.max_presence_events_per_second + 1)
    assert out == RATE_LIMIT_EXCEEDED and t.state == {}


def test_track_payload_not_a_map_errors():
    # presence_handler_test.exs:501
    s = _sock(private=False, presence_key="k")
    t = PresenceTracker()
    out, s = _handle({"event": "track", "payload": "1111"}, s, t)
    assert out == INVALID_PAYLOAD and t.state == {}


def test_high_payload_size_fails():
    # presence_handler_test.exs:513
    s = _sock(private=False, presence_key="k")
    t = PresenceTracker()
    payload = {"content": "x" * (TEN.max_payload_size_bytes + 10)}
    out, s = _handle({"event": "track", "payload": payload}, s, t)
    assert out == PAYLOAD_SIZE_EXCEEDED and t.state == {}


def test_message_without_event_is_silent_noop():
    # presence_handler.ex handle(_, _, socket) final clause
    s = _sock(private=True, policies=PresencePolicies())
    t = PresenceTracker()
    out, s = _handle({"payload": {"a": 1}}, s, t)
    assert out == "ok" and t.state == {} and t.log == []


def test_event_name_is_ascii_lowercased():
    # handle/3: String.downcase(event, :ascii)
    s = _sock(private=False, presence_key="k")
    t = PresenceTracker()
    out, s = _handle({"event": "TRACK", "payload": {"a": 1}}, s, t)
    assert out == "ok" and "k" in t.state


def test_client_window_rate_limit():
    # limit_client_presence_event/1: fixed window, applies to EVERY event
    s = _sock(private=False, presence_key="k",
              client_rate_limit=ClientRateLimit(max_calls=3, window_ms=1000))
    t = PresenceTracker()
    for i in range(3):
        out, s = _handle({"event": "track", "payload": {"i": i}}, s, t, now=100)
        assert out == "ok"
    out, s = _handle({"event": "track", "payload": {"i": 9}}, s, t, now=200)
    assert out == CLIENT_RATE_LIMIT_EXCEEDED
    # unknown events consume/hit the same window
    out, s = _handle({"event": "unknown"}, s, t, now=300)
    assert out == CLIENT_RATE_LIMIT_EXCEEDED
    # the window expires -> counter resets
    out, s = _handle({"event": "track", "payload": {"i": 10}}, s, t, now=1200)
    assert out == "ok"


def test_errored_events_do_not_consume_client_rate_budget():
    # r7 review find: the reference's error tuples carry no socket and the
    # channel's else-clauses keep the PRE-handle socket
    # (realtime_channel.ex:476-500) — an errored event must not persist the
    # client-window counter increment
    s = _sock(private=False, presence_key="k",
              client_rate_limit=ClientRateLimit(max_calls=3, window_ms=1000))
    t = PresenceTracker()
    out, s = _handle({"event": "track", "payload": {"i": 0}}, s, t, now=100)
    assert out == "ok" and s.client_rate_limit.counter == 1
    # unknown events error -> increment discarded, budget intact
    for _ in range(10):
        out, s = _handle({"event": "nope"}, s, t, now=150)
        assert out == UNKNOWN_PRESENCE_EVENT
    assert s.client_rate_limit.counter == 1
    # ...so two more OK tracks still fit in the window
    out, s = _handle({"event": "track", "payload": {"i": 1}}, s, t, now=200)
    assert out == "ok"
    out, s = _handle({"event": "track", "payload": {"i": 2}}, s, t, now=250)
    assert out == "ok" and s.client_rate_limit.counter == 3
    # a no-op same-payload track returns ok -> its increment DOES persist
    out, s = _handle({"event": "track", "payload": {"i": 2}}, s, t, now=260)
    assert out == CLIENT_RATE_LIMIT_EXCEEDED


def test_unauthorized_track_does_not_cache_policies():
    # r7 review find: on {:error, :unauthorized} the reference channel keeps
    # the pre-handle socket, so the just-evaluated write=false policy is NOT
    # cached — every subsequent track re-authorizes (handler_test.exs's
    # "only checks write policies once" covers only the SUCCESS path)
    calls = []

    def authorize():
        calls.append(1)
        return True, False  # read ok, write denied

    s = _sock(private=True, presence_key="k", policies=PresencePolicies())
    t = PresenceTracker()
    for i in range(3):
        out, s = _handle(
            {"event": "track", "payload": {"i": i}}, s, t, authorize=authorize
        )
        assert out == UNAUTHORIZED and t.state == {}
        assert s.policies.write is None and s.policies.read is None
    assert len(calls) == 3


# -- sync/1 -------------------------------------------------------------------


def test_sync_public_pushes_state():
    # presence_handler_test.exs:526
    s = _sock(private=False, presence_key="k",
              policies=PresencePolicies(read=False, write=False))
    t = PresenceTracker()
    _handle({"event": "track", "payload": {"a": 1}}, s, t)
    out, state = sync_presence(s, t, TEN)
    assert out == "ok" and state == {"k": {"a": 1}}


def test_sync_private_read_true_pushes():
    # presence_handler_test.exs:537
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=True, write=True))
    t = PresenceTracker()
    _handle({"event": "track", "payload": {"a": 1}}, s, t)
    out, state = sync_presence(s, t, TEN)
    assert out == "ok" and state == {"k": {"a": 1}}


def test_sync_private_read_false_ignored():
    # presence_handler_test.exs:548
    s = _sock(private=True, presence_key="k",
              policies=PresencePolicies(read=False, write=True))
    t = PresenceTracker()
    t.track("other", {"x": 1})
    out, state = sync_presence(s, t, TEN)
    assert out == "ok" and state is None


def test_sync_ignored_when_presence_disabled():
    # presence_handler_test.exs:557
    s = _sock(private=False, presence_enabled=False)
    out, state = sync_presence(s, PresenceTracker(), TEN)
    assert out == "ok" and state is None


@pytest.mark.parametrize("private,read", [(False, None), (True, True)])
def test_sync_respects_rate_limits(private, read):
    # presence_handler_test.exs:566, :583
    s = _sock(private=private, policies=PresencePolicies(read=read, write=read))
    t = PresenceTracker()
    t.track("k", {"a": 1})
    out, state = sync_presence(
        s, t, TEN, tenant_rate_avg=TEN.max_presence_events_per_second + 1
    )
    assert out == RATE_LIMIT_EXCEEDED and state is None


# -- bridge into the engine's diff machinery ----------------------------------


@pytest.fixture(scope="module")
def spark():
    from realtime_spark.session import get_spark

    return get_spark("test_presence_events", cpus=4)


def test_handled_events_drive_presence_diffs(spark):
    """handler -> tracker -> presence_diffs_batch: the admitted raw events
    replay into the same join/update/leave decisions the tracker made, and
    presence_state_batch reproduces the tracker's final state."""
    from realtime_spark.streaming.presence import (
        presence_diffs_batch,
        presence_state_batch,
    )

    pol = PresencePolicies(read=True, write=True)
    t = PresenceTracker()
    socks = {u: _sock(private=True, presence_key=u, policies=pol) for u in ("u1", "u2")}
    seq = [
        ("u1", {"event": "track", "payload": {"a": 1}}),   # join u1
        ("u2", {"event": "track", "payload": {"b": 1}}),   # join u2
        ("u1", {"event": "track", "payload": {"a": 1}}),   # no-op (same payload)
        ("u1", {"event": "track", "payload": {"a": 2}}),   # update u1
        ("u2", {"event": "untrack"}),                      # leave u2
        ("u2", {"event": "untrack"}),                      # no-op untrack
        ("u2", {"event": "track", "payload": {"b": 2}}),   # re-join u2
    ]
    for u, msg in seq:
        out, socks[u] = _handle(msg, socks[u], t)
        assert out == "ok"

    events = track_events_df(spark, t, topic="room:1")
    kinds = [
        (r["presence_key"], r["kind"])
        for r in presence_diffs_batch(events).orderBy("ts").collect()
    ]
    assert kinds == [
        ("u1", "join"), ("u2", "join"), ("u1", "update"),
        ("u2", "leave"), ("u2", "join"),
    ]
    state = {
        r["presence_key"]: r["meta"]
        for r in presence_state_batch(events).collect()
    }
    import json

    assert state.keys() == t.state.keys()
    for k, meta in state.items():
        assert json.loads(meta) == t.state[k]


def test_event_downcase_is_ascii_only():
    # String.downcase(event, :ascii): a unicode uppercase that case-folds
    # to 'track' (Kelvin-sign K) must stay an UNKNOWN event
    s = _sock(private=False, presence_key="k")
    t = PresenceTracker()
    kelvin_track = "TRAC\u212a"  # uppercase TRACK with Kelvin-sign K
    assert kelvin_track.lower() == "track"  # the trap the port must avoid
    out, s = _handle({"event": kelvin_track}, s, t)
    assert out == UNKNOWN_PRESENCE_EVENT and t.state == {}
