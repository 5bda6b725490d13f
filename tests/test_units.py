"""Unit tests for non-oracle paths: JWT verification, multimodal stubs,
replay clamps, filter validation errors."""

from __future__ import annotations

import pytest

from realtime_spark.functions.filters import (
    FilterValidationError,
    parse_filter_string,
)
from realtime_spark.operators.auth import sign_jwt, verify_jwt

SECRET = "s3cret"


class TestJwt:
    def test_roundtrip(self):
        claims = {"role": "authenticated", "exp": 2000000000, "sub": "u1"}
        tok = sign_jwt(claims, SECRET)
        assert verify_jwt(tok, SECRET, now_epoch=1999999999) == claims

    def test_bad_signature(self):
        tok = sign_jwt({"role": "anon", "exp": 2000000000}, SECRET)
        assert verify_jwt(tok[:-2] + "xx", SECRET) is None

    def test_wrong_secret(self):
        tok = sign_jwt({"role": "anon", "exp": 2000000000}, SECRET)
        assert verify_jwt(tok, "other") is None

    def test_expired(self):
        tok = sign_jwt({"role": "anon", "exp": 100}, SECRET)
        assert verify_jwt(tok, SECRET, now_epoch=101) is None

    def test_missing_role(self):
        tok = sign_jwt({"exp": 2000000000}, SECRET)
        assert verify_jwt(tok, SECRET) is None

    def test_missing_exp(self):
        tok = sign_jwt({"role": "anon"}, SECRET)
        assert verify_jwt(tok, SECRET) is None

    def test_garbage(self):
        assert verify_jwt("not.a.jwt", SECRET) is None
        assert verify_jwt("", SECRET) is None


class TestFilterValidation:
    def test_in_cap_100(self):
        vals = ",".join(str(i) for i in range(101))
        with pytest.raises(FilterValidationError):
            parse_filter_string(f"c=in.({vals})")

    def test_is_keyword_whitelist(self):
        with pytest.raises(FilterValidationError):
            parse_filter_string("c=is.banana")

    def test_bad_regex_eager(self):
        with pytest.raises(FilterValidationError):
            parse_filter_string("c=match.[unclosed")

    def test_canonical_sort(self):
        fs = parse_filter_string("b=eq.2,a=eq.1")
        assert [f.column_name for f in fs] == ["a", "b"]

    def test_quoted_in_values(self):
        fs = parse_filter_string('c=in.(a,"b,c",d)')
        assert fs[0].values == ("a", "b,c", "d")


class TestMultimodalStub:
    def test_decode_raises(self):
        from realtime_spark.operators.multimodal import decode_media

        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG", "png")

    def test_fake_decode_deterministic(self):
        from realtime_spark.operators.multimodal import _fake_decode

        a = _fake_decode(b"payload", dim=8)
        b = _fake_decode(b"payload", dim=8)
        assert a == b and len(a) == 8
        assert all(0.0 <= x < 1.0 for x in a)

    def test_feature_extraction_plumbing(self, spark):
        from realtime_spark.operators.multimodal import (
            extract_features,
            media_from_documents,
        )

        docs = spark.createDataFrame(
            [(1, "hello world", 11), (2, "bye", 3)],
            "doc_id long, text string, n_chars long",
        )
        out = extract_features(media_from_documents(docs)).collect()
        assert {r["media_id"] for r in out} == {1, 2}
        r1 = next(r for r in out if r["media_id"] == 1)
        assert r1["n_bytes"] == 11 and len(r1["features"]) == 8


class TestReplayClamp:
    def test_hard_limit_25(self, spark):
        from realtime_spark.operators.replay import replay_topk

        from pyspark.sql import functions as F

        rows = [(str(i), "t", "broadcast", True, float(i)) for i in range(40)]
        msgs = spark.createDataFrame(
            rows, "id string, topic string, extension string, private boolean, sec double"
        ).withColumn("inserted_at", F.col("sec").cast("timestamp"))
        out = replay_topk(msgs, since="1970-01-01", limit=100)
        assert out.count() == 25  # clamped to the reference hard limit
