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

    def test_non_numeric_exp_rejected(self):
        # Joken's exp validator requires is_number: a string "9999999999"
        # must NOT be int()-coerced into a live token (r8 parity fix —
        # verify_jwt now matches verify_jwt_jwks/authorize_conn).
        for bad in ("9999999999", [2000000000], {"t": 1}, True, None):
            tok = sign_jwt({"role": "anon", "exp": bad}, SECRET)
            assert verify_jwt(tok, SECRET, now_epoch=100) is None, bad
            # even with no clock supplied the claim shape is invalid
            assert verify_jwt(tok, SECRET) is None, bad

    def test_float_exp_rounds_half_away_from_zero(self):
        # exp=100.5 at now=100: Elixir round/1 -> 101, token still live;
        # int() truncation would have expired it.
        tok = sign_jwt({"role": "anon", "exp": 100.5}, SECRET)
        claims = verify_jwt(tok, SECRET, now_epoch=100)
        assert claims is not None and claims["exp"] == 101
        assert verify_jwt(tok, SECRET, now_epoch=101) is None


class TestAuthorizeConn:
    """channels_authorization.ex authorize/3 + authorize_conn/3 (r7):
    clean_token percent-decodes and strips whitespace; the three outcome
    shapes (ok / expired with message / error reason) are pinned."""

    def test_clean_token_strips_and_decodes(self):
        from realtime_spark.operators.auth import authorize_conn, clean_token, sign_jwt

        claims = {"role": "authenticated", "exp": 2000000000, "sub": "u1"}
        tok = sign_jwt(claims, SECRET)
        # pasted with line breaks, spaces, and percent-encoded dots
        mangled = tok.replace(".", "%2E")[:20] + "\n " + tok.replace(".", "%2E")[20:]
        assert clean_token(mangled) == tok
        out, got, err = authorize_conn(mangled, SECRET, now_epoch=1999999999)
        assert out == "ok" and got == claims and err is None

    def test_expired_message_shape(self):
        from realtime_spark.operators.auth import authorize_conn, sign_jwt

        tok = sign_jwt({"role": "anon", "exp": 100}, SECRET)
        out, claims, msg = authorize_conn(tok, SECRET, now_epoch=130)
        assert out == "expired_token" and claims is None
        assert msg == "Token has expired 30 seconds ago"

    def test_missing_claims_distinct_from_bad_signature(self):
        from realtime_spark.operators.auth import authorize_conn, sign_jwt

        no_exp = sign_jwt({"role": "anon"}, SECRET)
        assert authorize_conn(no_exp, SECRET) == ("error", None, "missing_claims")
        no_role = sign_jwt({"exp": 2000000000}, SECRET)
        assert authorize_conn(no_role, SECRET) == ("error", None, "missing_claims")
        bad_sig = sign_jwt({"role": "anon", "exp": 2000000000}, SECRET)[:-2] + "xx"
        assert authorize_conn(bad_sig, SECRET) == ("error", None, "invalid_token")

    def test_non_string_token(self):
        from realtime_spark.operators.auth import authorize_conn

        assert authorize_conn(None, SECRET) == ("error", None, "invalid_token")
        assert authorize_conn(123, SECRET) == ("error", None, "invalid_token")

    def test_non_numeric_exp_is_error_not_crash(self):
        """Joken's exp validator requires is_number — a signature-valid
        token with exp='abc'/None/[]/true must yield an error tuple, not
        raise, and not return ok even when now_epoch is None (r8 ADVICE)."""
        from realtime_spark.operators.auth import authorize_conn, sign_jwt

        for bad in ("abc", None, [], {}, True, "123"):
            tok = sign_jwt({"role": "anon", "exp": bad}, SECRET)
            for now in (None, 130):
                out = authorize_conn(tok, SECRET, now_epoch=now)
                assert out == ("error", None, "invalid_token"), (bad, now, out)

    def test_expired_wins_over_missing_role(self):
        """Reference validates exp inside Joken verify BEFORE the
        required-claims check: expired + missing 'role' -> expired_token."""
        from realtime_spark.operators.auth import authorize_conn, sign_jwt

        tok = sign_jwt({"exp": 100}, SECRET)  # no role
        out, claims, msg = authorize_conn(tok, SECRET, now_epoch=130)
        assert out == "expired_token" and claims is None
        assert msg == "Token has expired 30 seconds ago"
        # but a MISSING exp never enters the expiry comparison
        no_exp = sign_jwt({"sub": "u"}, SECRET)
        assert authorize_conn(no_exp, SECRET, now_epoch=130) == (
            "error",
            None,
            "missing_claims",
        )

    def test_clean_token_ascii_whitespace_only(self):
        """~r/\\s|\\n/ without the unicode flag is ASCII-only: NBSP and
        LINE SEPARATOR survive cleaning (and so fail verification), while
        all six ASCII whitespace chars are stripped."""
        from realtime_spark.operators.auth import authorize_conn, clean_token, sign_jwt

        tok = sign_jwt({"role": "anon", "exp": 2000000000}, SECRET)
        mangled = " \t" + tok[:10] + "\v\f\r\n" + tok[10:] + " "
        assert clean_token(mangled) == tok
        for uws in (" ", " ", "　"):
            assert clean_token(tok + uws) == tok + uws
            assert authorize_conn(tok + uws, SECRET, now_epoch=100) == (
                "error",
                None,
                "invalid_token",
            )

    def test_decimal_exp_rounds_half_away_from_zero(self):
        """Elixir round/1 on exp=100.5 -> 101 (NOT banker's 100): a token
        with exp=100.5 at now=100 is still live by one second."""
        from realtime_spark.operators.auth import authorize_conn, sign_jwt

        tok = sign_jwt({"role": "anon", "exp": 100.5}, SECRET)
        out, claims, _ = authorize_conn(tok, SECRET, now_epoch=100)
        assert out == "ok" and claims["exp"] == 101
        out2, _, msg2 = authorize_conn(tok, SECRET, now_epoch=101)
        assert out2 == "expired_token" and msg2 == "Token has expired 0 seconds ago"


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


class TestJwtJwks:
    """Signer resolution parity with jwt_verification.ex:63-150: RS* via RSA
    JWK by kid, HS* via oct JWK by kid with tenant-secret fallback, decimal
    exp rounding, fail-closed on unknown kid/alg."""

    @staticmethod
    def _rsa_testkey():
        # deterministic 512-bit test-only RSA key (stdlib Miller-Rabin)
        import random

        rnd = random.Random(20260814)

        def is_prime(n):
            if n % 2 == 0:
                return False
            d, r = n - 1, 0
            while d % 2 == 0:
                d //= 2
                r += 1
            for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
                x = pow(a, d, n)
                if x in (1, n - 1):
                    continue
                for _ in range(r - 1):
                    x = x * x % n
                    if x == n - 1:
                        break
                else:
                    return False
            return True

        def gen_prime(bits):
            while True:
                p = rnd.getrandbits(bits) | (1 << (bits - 1)) | 1
                if is_prime(p):
                    return p

        p, q = gen_prime(256), gen_prime(256)
        n, e = p * q, 65537
        d = pow(e, -1, (p - 1) * (q - 1))
        return n, e, d

    @classmethod
    def _sign_rs256(cls, claims, n, d, kid):
        import hashlib
        import json as _json

        from realtime_spark.operators.auth import _RS_ALGS, _b64url_encode

        header = _b64url_encode(
            _json.dumps({"alg": "RS256", "typ": "JWT", "kid": kid}).encode()
        )
        body = _b64url_encode(_json.dumps(claims, sort_keys=True).encode())
        msg = f"{header}.{body}".encode()
        _, prefix = _RS_ALGS["RS256"]
        t = prefix + hashlib.sha256(msg).digest()
        k = (n.bit_length() + 7) // 8
        em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
        sig = pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")
        return f"{header}.{body}." + _b64url_encode(sig)

    def _jwks(self, n, kid):
        from realtime_spark.operators.auth import _b64url_encode

        nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
        eb = (65537).to_bytes(3, "big")
        return {
            "keys": [
                {"kty": "RSA", "kid": kid, "n": _b64url_encode(nb), "e": _b64url_encode(eb)}
            ]
        }

    def test_rs256_roundtrip_and_tamper(self):
        from realtime_spark.operators.auth import verify_jwt_jwks

        n, e, d = self._rsa_testkey()
        claims = {"role": "authenticated", "exp": 2000000000}
        tok = self._sign_rs256(claims, n, d, "key1")
        jwks = self._jwks(n, "key1")
        got = verify_jwt_jwks(tok, None, jwks, now_epoch=1700000000)
        assert got and got["role"] == "authenticated"
        # expired
        assert verify_jwt_jwks(tok, None, jwks, now_epoch=2100000000) is None
        # tampered payload
        h, b, s = tok.split(".")
        bad = f"{h}.{b[:-2]}aa.{s}"
        assert verify_jwt_jwks(bad, None, jwks, now_epoch=1) is None
        # unknown kid -> fail closed (no secret fallback for RS*)
        assert verify_jwt_jwks(tok, "sec", self._jwks(n, "other"), 1) is None

    def test_hs_oct_jwk_and_secret_fallback(self):
        import hashlib
        import hmac as _hmac
        import json as _json

        from realtime_spark.operators.auth import _b64url_encode, verify_jwt_jwks

        secret = b"supersecretsupersecret"
        header = _b64url_encode(
            _json.dumps({"alg": "HS256", "typ": "JWT", "kid": "k9"}).encode()
        )
        body = _b64url_encode(
            _json.dumps({"role": "anon", "exp": 2000000000.7}).encode()
        )
        msg = f"{header}.{body}".encode()
        sig = _b64url_encode(_hmac.new(secret, msg, hashlib.sha256).digest())
        tok = f"{header}.{body}.{sig}"
        jwks = {"keys": [{"kty": "oct", "kid": "k9", "k": _b64url_encode(secret)}]}
        got = verify_jwt_jwks(tok, None, jwks, now_epoch=1700000000)
        assert got and got["exp"] == 2000000001  # decimal exp rounded
        # no matching oct key -> falls back to jwt_secret (the Supabase case)
        got2 = verify_jwt_jwks(
            tok, secret.decode(), {"keys": []}, now_epoch=1700000000
        )
        assert got2 and got2["role"] == "anon"
        # wrong fallback secret -> None
        assert verify_jwt_jwks(tok, "wrong", {"keys": []}, 1) is None

    def test_unsupported_alg_fails_closed(self):
        from realtime_spark.operators.auth import _b64url_encode, verify_jwt_jwks
        import json as _json

        header = _b64url_encode(_json.dumps({"alg": "ES256", "kid": "x"}).encode())
        body = _b64url_encode(_json.dumps({"role": "r", "exp": 2}).encode())
        assert verify_jwt_jwks(f"{header}.{body}.AAAA", "s", None, 1) is None


class TestMediaSniff:
    """sniff_media_header: real byte-level container parsing, fail-closed on
    truncation/corruption."""

    def test_truncated_and_corrupt(self):
        from realtime_spark.operators.multimodal import sniff_media_header

        assert sniff_media_header(b"") is None
        assert sniff_media_header(b"\x89PNG\r\n\x1a\n") is None  # no IHDR
        assert sniff_media_header(b"GIF89a\x01") is None  # truncated dims
        assert sniff_media_header(b"\xff\xd8\x00\x00") is None  # bad marker
        assert sniff_media_header(b"RIFF\x04\x00\x00\x00WAVE") is None  # no fmt

    def test_png_parse(self):
        import struct

        from realtime_spark.operators.multimodal import sniff_media_header

        p = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
             + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
        m = sniff_media_header(p)
        assert m == {"format": "png", "width": 640, "height": 480,
                     "sample_rate": None, "channels": None}

    def test_jpeg_skips_app_segments(self):
        import struct

        from realtime_spark.operators.multimodal import sniff_media_header

        app1 = b"\xff\xe1" + struct.pack(">H", 10) + b"\x00" * 8
        sof2 = (b"\xff\xc2" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", 99, 77) + b"\x03" + b"\x00" * 9)
        m = sniff_media_header(b"\xff\xd8" + app1 + sof2)
        assert m and m["format"] == "jpeg" and (m["width"], m["height"]) == (77, 99)

    @staticmethod
    def _box(typ: bytes, body: bytes) -> bytes:
        import struct

        return struct.pack(">I", 8 + len(body)) + typ + body

    def test_mp4_tkhd_dimensions(self):
        import struct

        from realtime_spark.operators.multimodal import sniff_media_header

        # tkhd v0 body: ver+flags(4) + ctime/mtime/id/rsvd/dur(20) +
        # rsvd(8)+layer/group/vol/rsvd(8)+matrix(36) + width/height 16.16
        tkhd = (b"\x00\x00\x00\x00" + b"\x00" * 72
                + struct.pack(">II", 1280 << 16, 720 << 16))
        trak = self._box(b"trak", self._box(b"tkhd", tkhd))
        moov = self._box(b"moov", trak)
        ftyp = self._box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        m = sniff_media_header(ftyp + moov)
        assert m == {"format": "mp4", "width": 1280, "height": 720,
                     "sample_rate": None, "channels": None}

    def test_mp4_ftyp_only(self):
        ftyp = self._box(b"ftyp", b"isom\x00\x00\x02\x00")
        m = sniff_media_header_mp4 = __import__(
            "realtime_spark.operators.multimodal", fromlist=["sniff_media_header"]
        ).sniff_media_header(ftyp)
        assert m and m["format"] == "mp4" and m["width"] is None

    def test_mp3_id3v2(self):
        from realtime_spark.operators.multimodal import sniff_media_header

        # ID3v2 header with 10-byte syncsafe tag body, then an MPEG1 Layer3
        # frame header: 0xFFFB -> MPEG1; sr bits 00 -> 44100; joint stereo
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
        frame = bytes([0xFF, 0xFB, 0x90, 0x40])  # sr=44100, ch mode 01
        m = sniff_media_header(tag + frame)
        assert m == {"format": "mp3", "width": None, "height": None,
                     "sample_rate": 44100, "channels": 2}

    def test_mp3_mono_22050(self):
        from realtime_spark.operators.multimodal import sniff_media_header

        # 0xFFF3 -> MPEG2 Layer3; sr bits 00 -> 22050; mode 11 -> mono
        frame = bytes([0xFF, 0xF3, 0x90, 0xC0])
        m = sniff_media_header(frame)
        assert m == {"format": "mp3", "width": None, "height": None,
                     "sample_rate": 22050, "channels": 1}

    def test_mp3_bad_tag_fail_closed(self):
        from realtime_spark.operators.multimodal import sniff_media_header

        # tag size points past the payload -> no frame header -> None
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100])
        assert sniff_media_header(tag + b"\x00" * 4) is None


class TestJwtEcdsa:
    """ES256/ES384 verification: pure-stdlib ECDSA over NIST P-256/P-384
    with on-curve key validation; ES512/EdDSA stay fail-closed."""

    D = 0x1E7F3C9A55D2B8410F6E9C27AB34D0125F8A6B3C4D5E6F708192A3B4C5D6E7F8
    K = 0x0B1C2D3E4F5A69788796A5B4C3D2E1F00FEDCBA987654321123456789ABCDEF0

    def _mint(self, alg, kid, claims, d=None, k=None):
        import json as _json

        from realtime_spark.operators.auth import _b64url_encode, ecdsa_sign

        h = _b64url_encode(
            _json.dumps({"alg": alg, "typ": "JWT", "kid": kid}).encode()
        )
        b = _b64url_encode(_json.dumps(claims).encode())
        sig = ecdsa_sign(d or self.D, f"{h}.{b}".encode(), alg, k or self.K)
        from realtime_spark.operators.auth import _b64url_encode as enc

        return f"{h}.{b}.{enc(sig)}"

    def test_es256_roundtrip_and_tamper(self):
        from realtime_spark.operators.auth import ec_public_jwk, verify_jwt_jwks

        jwks = {"keys": [ec_public_jwk(self.D, "ES256", "kid-ec")]}
        claims = {"role": "authenticated", "exp": 2_000_000_000}
        tok = self._mint("ES256", "kid-ec", claims)
        out = verify_jwt_jwks(tok, jwks=jwks, now_epoch=1_700_000_000)
        assert out and out["role"] == "authenticated"
        # tampered payload fails
        h, b, s = tok.split(".")
        assert verify_jwt_jwks(f"{h}.{b[:-2]}aa.{s}", jwks=jwks) is None
        # unknown kid fails closed
        tok2 = self._mint("ES256", "other-kid", claims)
        assert verify_jwt_jwks(tok2, jwks=jwks) is None
        # expired fails
        old = self._mint("ES256", "kid-ec", {"role": "r", "exp": 100})
        assert verify_jwt_jwks(old, jwks=jwks, now_epoch=1_700_000_000) is None

    def test_es384_roundtrip(self):
        from realtime_spark.operators.auth import ec_public_jwk, verify_jwt_jwks

        jwks = {"keys": [ec_public_jwk(self.D, "ES384", "k384")]}
        tok = self._mint("ES384", "k384", {"role": "svc", "exp": 2_000_000_000})
        out = verify_jwt_jwks(tok, jwks=jwks, now_epoch=1_700_000_000)
        assert out and out["role"] == "svc"

    def test_wrong_curve_key_rejected(self):
        # an off-curve public point must be rejected (invalid-curve guard)
        from realtime_spark.operators.auth import (
            _b64url_encode,
            ec_public_jwk,
            verify_jwt_jwks,
        )

        jwk = ec_public_jwk(self.D, "ES256", "kid-ec")
        bad_y = bytearray(
            __import__("base64").urlsafe_b64decode(jwk["y"] + "==")
        )
        bad_y[-1] ^= 1
        jwk["y"] = _b64url_encode(bytes(bad_y))
        tok = self._mint("ES256", "kid-ec", {"role": "r", "exp": 2_000_000_000})
        assert verify_jwt_jwks(tok, jwks={"keys": [jwk]}) is None

    def test_es512_roundtrip_and_tamper(self):
        """P-521 (full JOSE coverage — jwt_verification.ex alg list)."""
        from realtime_spark.operators.auth import ec_public_jwk, verify_jwt_jwks

        jwks = {"keys": [ec_public_jwk(self.D, "ES512", "k521")]}
        tok = self._mint("ES512", "k521", {"role": "svc", "exp": 2_000_000_000})
        out = verify_jwt_jwks(tok, jwks=jwks, now_epoch=1_700_000_000)
        assert out and out["role"] == "svc"
        h, b, s = tok.split(".")
        assert verify_jwt_jwks(f"{h}.{b[:-2]}aa.{s}", jwks=jwks) is None

    def test_unknown_alg_fails_closed(self):
        import json as _json

        from realtime_spark.operators.auth import _b64url_encode, verify_jwt_jwks

        h = _b64url_encode(_json.dumps({"alg": "XX999", "kid": "x"}).encode())
        b = _b64url_encode(_json.dumps({"role": "r", "exp": 2}).encode())
        assert verify_jwt_jwks(f"{h}.{b}.AAAA", jwks={"keys": []}) is None


class TestJwtEdDSA:
    """EdDSA (Ed25519, RFC 8032) verification — pure stdlib arithmetic,
    pinned to the RFC's published test vectors."""

    # RFC 8032 §7.1 TEST vectors (seed, public, msg, signature), hex
    VECTORS = [
        ("9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60",
         "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
         "",
         "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
         "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b"),
        ("4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb",
         "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
         "72",
         "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
         "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00"),
        ("c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7",
         "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
         "af82",
         "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
         "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a"),
    ]

    def test_rfc8032_vectors(self):
        from realtime_spark.operators.auth import (
            ed25519_public,
            ed25519_sign,
            ed25519_verify,
        )

        for seed_h, pub_h, msg_h, sig_h in self.VECTORS:
            seed, pub = bytes.fromhex(seed_h), bytes.fromhex(pub_h)
            msg, sig = bytes.fromhex(msg_h), bytes.fromhex(sig_h)
            assert ed25519_public(seed) == pub
            assert ed25519_sign(seed, msg) == sig
            assert ed25519_verify(pub, msg, sig)
            # flipped bit anywhere fails
            bad = bytearray(sig)
            bad[7] ^= 1
            assert not ed25519_verify(pub, msg, bytes(bad))
            assert not ed25519_verify(pub, msg + b"x", sig)

    def test_eddsa_jwt_roundtrip(self):
        import json as _json

        from realtime_spark.operators.auth import (
            _b64url_encode,
            ed25519_public_jwk,
            ed25519_sign,
            verify_jwt_jwks,
        )

        seed = bytes.fromhex(self.VECTORS[0][0])
        jwks = {"keys": [ed25519_public_jwk(seed, "kid-ed")]}
        h = _b64url_encode(
            _json.dumps({"alg": "EdDSA", "typ": "JWT", "kid": "kid-ed"}).encode()
        )
        b = _b64url_encode(
            _json.dumps({"role": "authenticated", "exp": 2_000_000_000}).encode()
        )
        sig = ed25519_sign(seed, f"{h}.{b}".encode())
        tok = f"{h}.{b}.{_b64url_encode(sig)}"
        out = verify_jwt_jwks(tok, jwks=jwks, now_epoch=1_700_000_000)
        assert out and out["role"] == "authenticated"
        # tamper / wrong kid / expired all fail closed
        assert verify_jwt_jwks(f"{h}.{b[:-2]}aa.{_b64url_encode(sig)}", jwks=jwks) is None
        h2 = _b64url_encode(
            _json.dumps({"alg": "EdDSA", "kid": "nope"}).encode()
        )
        sig2 = ed25519_sign(seed, f"{h2}.{b}".encode())
        assert verify_jwt_jwks(f"{h2}.{b}.{_b64url_encode(sig2)}", jwks=jwks) is None


class TestAesCrypto:
    """crypto.ex parity: AES-128-ECB + PKCS#7 + base64, pinned to the
    published FIPS-197 known-answer vectors."""

    KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")

    def test_fips197_vectors(self):
        from realtime_spark.functions.crypto import (
            aes128_decrypt_block,
            aes128_encrypt_block,
        )

        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = aes128_encrypt_block(pt, self.KEY)
        assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # appendix C.1
        assert aes128_decrypt_block(ct, self.KEY) == pt
        key_b = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        pt_b = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
        assert (
            aes128_encrypt_block(pt_b, key_b).hex()
            == "3925841d02dc09fbdc118597196a0b32"  # appendix B
        )

    def test_secret_roundtrip_and_padding(self):
        from realtime_spark.functions.crypto import decrypt_secret, encrypt_secret

        for n in (0, 1, 15, 16, 17, 31, 32, 100):
            s = "x" * n
            assert decrypt_secret(encrypt_secret(s, self.KEY), self.KEY) == s
        # exact multiple of 16 gets a FULL pad block (crypto.ex pad/1)
        import base64

        enc = base64.b64decode(encrypt_secret("y" * 16, self.KEY))
        assert len(enc) == 32
        # utf-8 survives
        s = "pässwörd→日本"
        assert decrypt_secret(encrypt_secret(s, self.KEY), self.KEY) == s


class TestReviewGuards:
    def test_aes_key_length_validated(self):
        import pytest as _pytest

        from realtime_spark.functions.crypto import encrypt_secret

        with _pytest.raises(ValueError, match="16 bytes"):
            encrypt_secret("x", b"0" * 32)  # silently truncating would
            # produce ciphertext no correct AES-128 peer can decrypt

    def test_decrypt_corrupt_ciphertext_raises_not_garbage(self):
        import base64

        import pytest as _pytest

        from realtime_spark.functions.crypto import decrypt_secret

        key = b"realtime-enc-16B"
        with _pytest.raises(ValueError):
            decrypt_secret("", key)  # empty
        with _pytest.raises(ValueError):
            decrypt_secret(base64.b64encode(b"short").decode(), key)  # %16
        with _pytest.raises(ValueError):
            # random block: PKCS#7 check fails instead of silent truncation
            decrypt_secret(base64.b64encode(b"\x01" * 16).decode(), key)

    def test_decrypt_col_maps_corrupt_rows_to_null(self, spark):
        from pyspark.sql import functions as F

        from realtime_spark.functions.crypto import decrypt_col, encrypt_secret

        key = b"realtime-enc-16B"
        good = encrypt_secret("hello", key)
        df = spark.createDataFrame([(good,), ("AAAA",), (None,)], "c string")
        got = [r["d"] for r in df.select(decrypt_col(F.col("c"), key).alias("d")).collect()]
        assert got == ["hello", None, None]

    def test_wildcard_filter_on_ambiguous_column_rejected(self, spark):
        import pytest as _pytest

        from realtime_spark.functions.filters import FilterValidationError
        from realtime_spark.operators.cdc import subscriptions_df

        maps = {
            ("public", "a"): {"val": "int4"},
            ("public", "b"): {"val": "text"},
        }
        with _pytest.raises(FilterValidationError, match="conflicting types"):
            subscriptions_df(
                spark,
                [{"subscription_id": "w", "table": "*", "filters": "val=gt.9"}],
                type_maps=maps,
            )
        # per-table subscription on the same column is fine
        subscriptions_df(
            spark,
            [{"subscription_id": "s", "table": "a", "filters": "val=gt.9"}],
            type_maps=maps,
        )

    def test_exists_policy_guards(self, spark):
        import pytest as _pytest

        from realtime_spark.operators.auth import apply_rls_exists_policy

        lookup = spark.createDataFrame([(1,)], "c_custkey long")
        with _pytest.raises(ValueError, match="at least one key"):
            apply_rls_exists_policy(lookup.alias("c"), lookup, [])


class TestClientWindowSeq:
    def test_intra_second_burst_accepts_first_max_calls(self, spark):
        """With a seq column the reference-exact arrival rule applies: 6
        same-second calls accept the first 5 (the default second-bucket
        variant deterministically rejects the whole burst instead)."""
        from pyspark.sql import functions as F

        from realtime_spark.operators.rate_limit import client_window_limit

        rows = [("c1", 0.0, i) for i in range(6)]
        df = spark.createDataFrame(
            rows, "client string, sec double, seq long"
        ).withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
        got = client_window_limit(
            df, ["client"], max_calls=5, window_seconds=30, seq_col="seq"
        )
        acc = {r["seq"]: r["accepted"] for r in got.collect()}
        assert [acc[i] for i in range(6)] == [True] * 5 + [False]
        # default variant: burst > cap rejects the whole second, documented
        strict = client_window_limit(df, ["client"], max_calls=5, window_seconds=30)
        assert all(not r["accepted"] for r in strict.collect())

    def test_seq_window_expires_old_calls(self, spark):
        from pyspark.sql import functions as F

        from realtime_spark.operators.rate_limit import client_window_limit

        rows = [("c", 0.0, 1), ("c", 1.0, 2), ("c", 31.0, 3)]
        df = spark.createDataFrame(
            rows, "client string, sec double, seq long"
        ).withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
        got = {
            r["seq"]: r["calls_in_window"]
            for r in client_window_limit(
                df, ["client"], max_calls=1, window_seconds=30, seq_col="seq"
            ).collect()
        }
        # at t=31 the trailing 30 s window covers seconds [2, 31]: both
        # earlier calls (t=0, t=1) have expired — zero prior calls, same
        # boundary as the RANGE variant's -(window-1)..0 frame
        assert got == {1: 1, 2: 2, 3: 1}
