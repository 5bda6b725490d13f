"""Unit tests for the PostgREST filter grammar (P1) and validation (P4) —
mirrors the reference's parser doctest matrix
(reference: lib/extensions/postgres_cdc_rls/subscriptions.ex:256-313)."""

import pytest

from realtime_spark.functions.filters import (
    Filter,
    FilterValidationError,
    parse_filter_string,
)


def test_empty_and_none():
    assert parse_filter_string(None) == []
    assert parse_filter_string("") == []
    assert parse_filter_string("   ") == []


def test_simple_eq():
    assert parse_filter_string("details=eq.hello") == [
        Filter("details", "eq", "hello")
    ]


def test_all_ops_parse():
    cases = {
        "id=eq.1": ("id", "eq", "1"),
        "id=neq.1": ("id", "neq", "1"),
        "id=lt.10": ("id", "lt", "10"),
        "id=lte.10": ("id", "lte", "10"),
        "id=gt.10": ("id", "gt", "10"),
        "id=gte.10": ("id", "gte", "10"),
        "details=like.%x%": ("details", "like", "%x%"),
        "details=ilike.%X%": ("details", "ilike", "%X%"),
        "details=is.null": ("details", "is", "null"),
        "details=match.^a": ("details", "match", "^a"),
        "details=imatch.^A": ("details", "imatch", "^A"),
        "details=isdistinct.v": ("details", "isdistinct", "v"),
    }
    for s, (col, op, val) in cases.items():
        (f,) = parse_filter_string(s)
        assert (f.column_name, f.op, f.value) == (col, op, val), s


def test_in_list():
    (f,) = parse_filter_string("id=in.(1,2,3)")
    assert f.op == "in" and f.values == ("1", "2", "3")


def test_in_list_quoted():
    (f,) = parse_filter_string('details=in.(a,"b,c","d\\"e")')
    assert f.values == ("a", "b,c", 'd"e')


def test_in_cap_100():
    vals = ",".join(str(i) for i in range(101))
    with pytest.raises(FilterValidationError):
        parse_filter_string(f"id=in.({vals})")


def test_negate_prefix():
    (f,) = parse_filter_string("details=not.eq.hello")
    assert f.negate and f.op == "eq" and f.value == "hello"


def test_and_composition_splits_toplevel_only():
    fs = parse_filter_string("details=eq.match,id=gt.0")
    assert {f.column_name for f in fs} == {"details", "id"}
    fs2 = parse_filter_string("id=in.(1,2),details=eq.x")
    assert len(fs2) == 2


def test_canonical_sort():
    fs = parse_filter_string("id=gt.0,details=eq.x")
    assert [f.column_name for f in fs] == ["details", "id"]
    # (column_name, op, value, negate) ordering — reference W3
    fs2 = parse_filter_string("a=neq.1,a=eq.2,a=eq.1")
    assert [(f.op, f.value) for f in fs2] == [("eq", "1"), ("eq", "2"), ("neq", "1")]


def test_is_keyword_whitelist():
    for kw in ("null", "true", "false", "unknown", "NULL"):
        parse_filter_string(f"flag=is.{kw}")
    with pytest.raises(FilterValidationError):
        parse_filter_string("flag=is.banana")


def test_invalid_regex_rejected():
    with pytest.raises(FilterValidationError):
        parse_filter_string("details=match.[unclosed")


def test_unknown_op_rejected():
    with pytest.raises(FilterValidationError):
        parse_filter_string("details=contains.x")


def test_unparsable_rejected():
    with pytest.raises(FilterValidationError):
        parse_filter_string("details")
