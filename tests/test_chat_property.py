"""Differential property test for SFT chat prep: hypothesis drives random
event logs (multiple users, gap boundaries exactly at/under/over the
threshold, role runs, zero/negative/hostile token payloads) through

  1. chat_turns -> thread_stats / fit_context_budget (the distributed
     single-exchange pipeline), and
  2. a pure-Python reference fold of the same contracts,

so the session-boundary, alternation, and suffix-truncation semantics are
pinned independently of the DuckDB oracle (which shares SQL window
machinery with the implementation and could in principle share a blind
spot)."""

from __future__ import annotations

import datetime as dt
import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_spark.operators.chat import (
    USER_EVENT_TYPES,
    chat_turns,
    fit_context_budget,
    thread_stats,
)

_GAP = 600  # seconds
_BUDGET = 40
_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

# an event: (user 0-2, gap-to-previous seconds from the boundary-heavy set,
# event type, k payload or a hostile string)
_event = st.tuples(
    st.integers(0, 2),
    st.sampled_from([0, 1, 599, 600, 601, 3600]),
    st.sampled_from(["click", "view", "signup", "error", "purchase"]),
    st.one_of(st.integers(-3, 70), st.sampled_from(["3.5", "+5", "x", None])),
)


def _tokens(k):
    if isinstance(k, int):
        return (k % 64) + 1
    return 1  # non-integer-literal payloads cost the 1-token floor


def _rows(events):
    """Materialize (user, gap, type, k) tuples into event rows with
    per-user monotone timestamps; event_id follows input order so ts ties
    cannot occur (per-user gaps accumulate strictly when gap > 0; equal
    gaps of 0 produce ties broken by event_id, also covered)."""
    clocks: dict[int, dt.datetime] = {}
    rows = []
    for i, (u, gap, et, k) in enumerate(events):
        ts = clocks.get(u, _T0) + dt.timedelta(seconds=gap)
        clocks[u] = ts
        props = json.dumps({"k": k}) if k is not None else "{}"
        rows.append((i, ts, u, et, 0.0, props))
    return rows


def _reference(rows):
    """Pure-Python fold: threads as lists of (role, tokens) per user."""
    by_user: dict[int, list] = {}
    for event_id, ts, u, et, _v, props in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        k = json.loads(props).get("k")
        toks = _tokens(k) if k is not None else 1
        role = "user" if et in USER_EVENT_TYPES else "assistant"
        sessions = by_user.setdefault(u, [])
        if not sessions or (ts - sessions[-1]["last_ts"]).total_seconds() >= _GAP:
            sessions.append({"turns": [], "last_ts": ts})
        sessions[-1]["turns"].append((role, toks))
        sessions[-1]["last_ts"] = ts
    out = {}
    for u, sessions in by_user.items():
        for sid, s in enumerate(sessions):
            out[(u, sid)] = s["turns"]
    return out


def _ref_stats(turns):
    roles = [r for r, _ in turns]
    breaks = sum(1 for a, b in zip(roles, roles[1:]) if a == b)
    return {
        "n_turns": len(turns),
        "first_role": roles[0],
        "last_role": roles[-1],
        "alternation_breaks": breaks,
        "total_tokens": sum(t for _, t in turns),
        "valid": roles[0] == "user"
        and roles[-1] == "assistant"
        and len(turns) >= 2
        and breaks == 0,
    }


def _ref_fit(turns, budget):
    kept = 0
    tok = 0
    for role, t in reversed(turns):
        if tok + t > budget:
            break
        tok += t
        kept += 1
    return {
        "kept_turns": kept,
        "dropped_turns": len(turns) - kept,
        "kept_tokens": tok,
        "first_kept_role": turns[len(turns) - kept][0] if kept else None,
    }


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_event, min_size=1, max_size=40))
def test_chat_prep_matches_reference_fold(spark, events):
    rows = _rows(events)
    ref = _reference(rows)
    turns_df = chat_turns(_events_df(spark, rows), gap_seconds=_GAP)

    got_stats = {
        (r["user_id"], r["session_id"]): r
        for r in thread_stats(turns_df).collect()
    }
    assert set(got_stats) == set(ref)
    for key, turns in ref.items():
        want = _ref_stats(turns)
        got = got_stats[key]
        for field, expect in want.items():
            assert got[field] == expect, (key, field, turns)

    got_fit = {
        (r["user_id"], r["session_id"]): r
        for r in fit_context_budget(turns_df, _BUDGET).collect()
    }
    assert set(got_fit) == set(ref)
    for key, turns in ref.items():
        want = _ref_fit(turns, _BUDGET)
        got = got_fit[key]
        for field, expect in want.items():
            assert got[field] == expect, (key, field, turns)
