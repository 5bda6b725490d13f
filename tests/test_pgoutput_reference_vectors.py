"""The reference's own pgoutput decoder test vectors, byte-for-byte
(/root/reference/test/realtime/postgres_decoder_test.exs) — every literal
frame that suite feeds Decoder.decode_message/2, decoded by
sources/pgoutput.py::decode_frame and asserted against the same facts.

Two documented representation differences from the reference's structs
(same information, different carrier):
  - type_modifier is unpacked as a SIGNED int32 (-1) where Elixir reads the
    same bytes unsigned (4_294_967_295);
  - binary bytea values render to pg hex TEXT ('\\xdeadbeef…') rather than
    raw bytes, because the engine's record maps are text-carried
    (wal2json's own rendering).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

from realtime_spark.sources.pgoutput import UNCHANGED_TOAST, decode_frame

_PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)


def _us(dt: datetime) -> int:
    return (dt - _PG_EPOCH) // __import__("datetime").timedelta(microseconds=1)


# the suite's shared commit timestamp: 2019-07-18T17:02:35Z + 726_322 µs
_TS_US = _us(datetime(2019, 7, 18, 17, 2, 35, 726322, tzinfo=timezone.utc))
_LSN = (2 << 32) | 2_817_828_992  # {2, 2_817_828_992}


def test_begin_vector():
    buf = bytes(
        [66, 0, 0, 0, 2, 167, 244, 168, 128,
         0, 2, 48, 246, 88, 88, 213, 242, 0, 0, 2, 107]
    )
    got = decode_frame(buf, {})
    assert got["kind"] == "begin"
    assert got["final_lsn"] == _LSN
    assert got["commit_ts_us"] == _TS_US
    assert got["xid"] == 619


def test_commit_vector():
    buf = bytes(
        [67, 0, 0, 0, 0, 2, 167, 244, 168, 128,
         0, 0, 0, 2, 167, 244, 168, 176,
         0, 2, 48, 246, 88, 88, 213, 242]
    )
    got = decode_frame(buf, {})
    assert got["kind"] == "commit"
    assert got["lsn"] == _LSN
    assert got["end_lsn"] == (2 << 32) | 2_817_829_040
    assert got["commit_ts_us"] == _TS_US


def test_origin_vector():
    buf = bytes([79, 0, 0, 0, 2, 167, 244, 168, 128]) + b"Elmer Fud"
    got = decode_frame(buf, {})
    assert got["kind"] == "origin"
    assert got["origin_commit_lsn"] == _LSN
    assert got["name"] == "Elmer Fud"


def test_relation_vector():
    buf = bytes(
        [82, 0, 0, 96, 0, 112, 117, 98, 108, 105, 99, 0, 102, 111, 111, 0,
         100, 0, 2, 0, 98, 97, 114, 0, 0, 0, 0, 25, 255, 255, 255, 255, 1,
         105, 100, 0, 0, 0, 0, 23, 255, 255, 255, 255]
    )
    rels: dict = {}
    got = decode_frame(buf, rels)
    assert got["kind"] == "relation"
    assert got["id"] == 24_576
    assert got["namespace"] == "public"
    assert got["name"] == "foo"
    assert got["replica_identity"] == "default"
    bar, idc = got["columns"]
    assert (bar["name"], bar["type"], bar["key"]) == ("bar", "text", False)
    assert (idc["name"], idc["type"], idc["key"]) == ("id", "int4", True)
    # same bytes as the reference's 4_294_967_295, read signed
    assert bar["type_modifier"] == -1 and idc["type_modifier"] == -1
    assert rels[24_576] is not None  # registered for subsequent tuples


def test_type_vector():
    buf = bytes(
        [89, 0, 0, 128, 52, 112, 117, 98, 108, 105, 99, 0, 101, 120, 97,
         109, 112, 108, 101, 95, 116, 121, 112, 101, 0]
    )
    got = decode_frame(buf, {})
    assert got == {
        "kind": "type", "id": 32_820,
        "namespace": "public", "name": "example_type",
    }


_REL = {
    24_576: {
        "id": 24_576, "namespace": "public", "name": "foo",
        "columns": [{"name": "id", "type": "uuid"},
                    {"name": "bar", "type": "text"}],
    }
}
_UUID_BYTES = bytes(range(16))
_UUID_TEXT = "00010203-0405-0607-0809-0a0b0c0d0e0f"
_STR = b"some random string"


def _insert(rel_id: int, markers: bytes) -> bytes:
    return b"I" + struct.pack(">i", rel_id) + b"N" + markers


def test_insert_vector_binary_uuid_and_text():
    markers = (
        struct.pack(">h", 2)
        + b"b" + struct.pack(">i", 16) + _UUID_BYTES
        + b"b" + struct.pack(">i", len(_STR)) + _STR
    )
    got = decode_frame(_insert(24_576, markers), dict(_REL))
    assert got["kind"] == "insert" and got["relation_id"] == 24_576
    assert got["tuple_data"] == [_UUID_TEXT, _STR.decode()]


def test_insert_unknown_relation_is_unsupported():
    markers = (
        struct.pack(">h", 2)
        + b"b" + struct.pack(">i", 16) + _UUID_BYTES
        + b"b" + struct.pack(">i", len(_STR)) + _STR
    )
    got = decode_frame(_insert(679, markers), dict(_REL))
    assert got["kind"] == "unsupported"


def test_insert_vector_null_value():
    markers = (
        struct.pack(">h", 2)
        + b"n"
        + b"b" + struct.pack(">i", len(_STR)) + _STR
    )
    got = decode_frame(_insert(24_576, markers), dict(_REL))
    assert got["tuple_data"] == [None, _STR.decode()]


def test_insert_vector_bytea_renders_pg_hex_text():
    rel = {
        24_576: {
            "id": 24_576, "namespace": "realtime", "name": "messages",
            "columns": [{"name": "id", "type": "uuid"},
                        {"name": "binary_payload", "type": "bytea"}],
        }
    }
    payload = bytes([0xDE, 0xAD, 0xBE, 0xEF, 0x00, 0xFF, 0x01])
    markers = (
        struct.pack(">h", 2)
        + b"b" + struct.pack(">i", 16) + _UUID_BYTES
        + b"b" + struct.pack(">i", len(payload)) + payload
    )
    got = decode_frame(_insert(24_576, markers), rel)
    assert got["tuple_data"] == [_UUID_TEXT, "\\xdeadbeef00ff01"]


def test_insert_vector_unchanged_toast():
    markers = (
        struct.pack(">h", 2)
        + b"u"
        + b"b" + struct.pack(">i", len(_STR)) + _STR
    )
    got = decode_frame(_insert(24_576, markers), dict(_REL))
    assert got["tuple_data"] == [UNCHANGED_TOAST, _STR.decode()]
