"""Property-based round-trip fuzzing of the pgoutput frame codec: any
relation schema and any tuple of NULL / unchanged-TOAST / text / typed
binary values must decode back to exactly what was encoded (the parser is
byte-offset arithmetic — the classic place off-by-ones hide).
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_spark.sources.pgoutput import (
    UNCHANGED_TOAST,
    _pg_text_timestamp,
    decode_frame,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_truncate,
    encode_update,
    fold_slot_frames,
)

_ident = st.text(
    alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12
)
_text_val = st.text(
    # exercise multi-byte utf-8 but exclude NUL (not valid in pg text)
    alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0x2FFF),
    max_size=40,
)

_col = st.fixed_dictionaries(
    {
        "name": _ident,
        "type": st.sampled_from(
            ["text", "int8", "int4", "bool", "bytea", "timestamp", "jsonb",
             "uuid", "float8"]
        ),
        "key": st.booleans(),
    }
)


def _value_for(col, draw):
    t = col["type"]
    kind = draw(st.sampled_from(["null", "toast", "text", "binary"]))
    if kind == "null":
        return None, None
    if kind == "toast":
        return UNCHANGED_TOAST, UNCHANGED_TOAST
    if kind == "text" or t == "text":
        v = draw(_text_val)
        return v, v
    # typed binary: (encoded input, expected decoded text)
    if t == "bool":
        b = draw(st.booleans())
        return ("bool", b), ("t" if b else "f")
    if t in ("int8", "int4"):
        lim = 2**62 if t == "int8" else 2**31 - 1
        n = draw(st.integers(min_value=-lim, max_value=lim))
        return (t, n), str(n)
    if t == "float8":
        from realtime_spark.sources.pgoutput import _pg_float_text

        x = draw(st.floats(allow_nan=False, allow_infinity=False, width=64))
        return (t, x), _pg_float_text(x, single=False)
    if t == "timestamp":
        us = draw(st.integers(min_value=0, max_value=10**15))
        return (t, us), _pg_text_timestamp(us)
    if t == "jsonb":
        v = draw(_text_val)
        return (t, v), v
    if t == "uuid":
        h = draw(st.binary(min_size=16, max_size=16)).hex()
        u = f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        return (t, u), u
    if t == "bytea":
        b = draw(st.binary(max_size=24))
        return (t, b), "\\x" + b.hex()
    raise AssertionError(t)


@st.composite
def _relation_and_tuples(draw):
    cols = draw(st.lists(_col, min_size=1, max_size=6))
    # unique column names (pg requires them)
    seen = set()
    for i, c in enumerate(cols):
        while c["name"] in seen:
            c["name"] += str(i)
        seen.add(c["name"])
    pairs = [tuple(_value_for(c, draw) for c in cols) for _ in range(
        draw(st.integers(min_value=1, max_value=4))
    )]
    return cols, pairs


@settings(max_examples=60, deadline=None)
@given(data=_relation_and_tuples(), rel_id=st.integers(1, 2**31 - 1))
def test_insert_roundtrip_any_schema(data, rel_id):
    cols, pairs = data
    relations: dict = {}
    decode_frame(encode_relation(rel_id, "public", "t", cols), relations)
    assert [c["name"] for c in relations[rel_id]["columns"]] == [
        c["name"] for c in cols
    ]
    for pair in pairs:
        encoded = [enc for enc, _ in pair]
        expected = [exp for _, exp in pair]
        msg = decode_frame(encode_insert(rel_id, encoded), relations)
        assert msg["kind"] == "insert"
        got = [
            UNCHANGED_TOAST if v is UNCHANGED_TOAST else v
            for v in msg["tuple_data"]
        ]
        assert got == expected


@settings(max_examples=40, deadline=None)
@given(data=_relation_and_tuples())
def test_update_delete_roundtrip(data):
    cols, pairs = data
    relations: dict = {}
    decode_frame(encode_relation(7, "s", "t", cols), relations)
    enc = [e for e, _ in pairs[0]]
    exp = [x for _, x in pairs[0]]
    u = decode_frame(encode_update(7, enc, old_values=enc), relations)
    assert u["tuple_data"] == exp and u["old_tuple_data"] == exp
    d = decode_frame(encode_delete(7, old_values=enc), relations)
    assert d["old_tuple_data"] == exp


@settings(max_examples=30, deadline=None)
@given(
    lsn=st.integers(0, 2**64 - 1),
    ts=st.integers(-(2**62), 2**62),
    xid=st.integers(0, 2**32 - 1),
    rel_ids=st.lists(st.integers(1, 2**31 - 1), min_size=1, max_size=5),
)
def test_control_frames_roundtrip(lsn, ts, xid, rel_ids):
    r: dict = {}
    b = decode_frame(encode_begin(lsn, ts, xid), r)
    assert (b["final_lsn"], b["commit_ts_us"], b["xid"]) == (lsn, ts, xid)
    c = decode_frame(encode_commit(lsn, lsn + 1 if lsn < 2**64 - 1 else lsn, ts), r)
    assert c["lsn"] == lsn and c["commit_ts_us"] == ts
    t = decode_frame(encode_truncate(rel_ids), r)
    assert t["truncated_relations"] == rel_ids


@settings(max_examples=25, deadline=None)
@given(data=_relation_and_tuples(), xid=st.integers(0, 2**32 - 1))
def test_fold_stamps_begin_onto_rows(data, xid):
    cols, pairs = data
    frames = [(0, encode_relation(3, "public", "t", cols)),
              (1, encode_begin(5, 1_000_000, xid))]
    for i, pair in enumerate(pairs):
        frames.append((2 + i, encode_insert(3, [e for e, _ in pair])))
    rows, begin = fold_slot_frames("s", frames, {})
    assert len(rows) == len(pairs)
    for row in rows:
        assert row[2] == "INSERT" and row[6] == xid and row[7] == 5
        assert row[12] == [c["name"] for c in cols if c["key"]]
