"""Authorization: JWT claims extraction + policy gates + RLS predicates.

Reference behavior reproduced (Spark-first, no probe transactions):
  - JWT verify requires signature + `role` + `exp` claims
    (reference: lib/realtime_web/channels/auth/jwt_verification.ex)
  - per-(topic, role, extension) read/write booleans decide broadcast and
    presence access; evaluated lazily in the reference via probe INSERT +
    read-back under the user's role inside ROLLBACK'd transactions
    (reference: lib/realtime/tenants/authorization.ex:243-341). Here the
    policies are a small dimension table whose predicates evaluate directly.
  - P7/J5 RLS row predicate: tenant policies are arbitrary SQL; we compile
    each fixture policy to a Spark SQL expression over (record, claims)
    columns — correct for the test corpus, declared limitation for arbitrary
    SQL (see SURVEY.md §7 watch-list).

Scale notes: policy evaluation is a broadcast join (policies are tiny);
JWT verification is an Arrow-batched pandas UDF (hmac is CPU-bound Python,
but it runs once per connection/token, not per event — the hot event path
joins against already-verified claims).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

POLICY_SCHEMA_DDL = (
    "topic string, claims_role string, extension string, "
    "can_read boolean, can_write boolean"
)


# ---------------------------------------------------------------------------
# JWT (HS256) — stdlib-only implementation of the verify path
# ---------------------------------------------------------------------------


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _b64url_encode(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def sign_jwt(claims: Mapping, secret: str) -> str:
    """Test-fixture token minting (HS256)."""
    header = _b64url_encode(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    body = _b64url_encode(json.dumps(dict(claims), sort_keys=True).encode())
    msg = f"{header}.{body}".encode()
    sig = _b64url_encode(hmac.new(secret.encode(), msg, hashlib.sha256).digest())
    return f"{header}.{body}.{sig}"


def verify_jwt(token: str, secret: str, now_epoch: int | None = None) -> dict | None:
    """Returns the claims dict when the token verifies, else None.

    Mirrors the reference's checks: HS256 signature, required `role` and
    `exp` claims, expiry against `now`.
    """
    try:
        header_b64, body_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
        if header.get("alg") != "HS256":
            return None
        msg = f"{header_b64}.{body_b64}".encode()
        expected = hmac.new(secret.encode(), msg, hashlib.sha256).digest()
        if not hmac.compare_digest(expected, _b64url_decode(sig_b64)):
            return None
        claims = json.loads(_b64url_decode(body_b64))
        if "role" not in claims or "exp" not in claims:
            return None
        if now_epoch is not None and int(claims["exp"]) <= now_epoch:
            return None
        return claims
    except Exception:
        return None


# -- JWKS signer resolution (HS*/RS*), stdlib-only --------------------------
# Mirrors lib/realtime_web/channels/auth/jwt_verification.ex:63-150: RS* needs
# an RSA JWK matched by kid; HS* prefers an 'oct' JWK by kid, else falls back
# to the tenant secret; exp/iat decimals are rounded. ES*/Ed* would need
# elliptic-curve libs (absent here) and return None — declared limitation.

_HS_ALGS = {"HS256": hashlib.sha256, "HS384": hashlib.sha384, "HS512": hashlib.sha512}
# EMSA-PKCS1-v1_5 DigestInfo prefixes (RFC 8017 §9.2 notes)
_RS_ALGS = {
    "RS256": (hashlib.sha256, bytes.fromhex("3031300d060960864801650304020105000420")),
    "RS384": (hashlib.sha384, bytes.fromhex("3041300d060960864801650304020205000430")),
    "RS512": (hashlib.sha512, bytes.fromhex("3051300d060960864801650304020305000440")),
}


def _rsa_verify(n: int, e: int, msg: bytes, sig: bytes, alg: str) -> bool:
    """RSASSA-PKCS1-v1_5 verification by direct modexp: EM' = sig^e mod n
    must equal 0x00 0x01 FF..FF 0x00 DigestInfo || H(msg)."""
    h, prefix = _RS_ALGS[alg]
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    em = pow(int.from_bytes(sig, "big"), e, n).to_bytes(k, "big")
    t = prefix + h(msg).digest()
    ps_len = k - len(t) - 3
    if ps_len < 8:
        return False
    expected = b"\x00\x01" + b"\xff" * ps_len + b"\x00" + t
    return hmac.compare_digest(em, expected)


def verify_jwt_jwks(
    token: str,
    jwt_secret: str | None = None,
    jwks: Mapping | None = None,
    now_epoch: int | None = None,
) -> dict | None:
    """Full signer-resolution verify path (jwt_verification.ex:49-150):

    - RS256/384/512 + kid -> RSA JWK from jwks['keys'] (kty=RSA, kid match)
    - HS256/384/512 + kid -> 'oct' JWK by kid (base64url 'k' is the secret),
      else fall back to jwt_secret (the common Supabase-auth case)
    - HS* without jwks -> jwt_secret
    - required claims: role, exp; exp/iat decimals rounded; exp > now

    Returns claims dict or None.
    """
    try:
        header_b64, body_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
        alg = header.get("alg")
        kid = header.get("kid")
        msg = f"{header_b64}.{body_b64}".encode()
        sig = _b64url_decode(sig_b64)
        keys = (jwks or {}).get("keys", [])

        if alg in _RS_ALGS:
            jwk = next(
                (j for j in keys if j.get("kty") == "RSA" and j.get("kid") == kid),
                None,
            )
            if jwk is None or not isinstance(kid, str):
                return None
            n = int.from_bytes(_b64url_decode(jwk["n"]), "big")
            e = int.from_bytes(_b64url_decode(jwk["e"]), "big")
            if not _rsa_verify(n, e, msg, sig, alg):
                return None
        elif alg in _HS_ALGS:
            secret: bytes | None = None
            if isinstance(kid, str):
                jwk = next(
                    (
                        j
                        for j in keys
                        if j.get("kty") == "oct"
                        and j.get("kid") == kid
                        and isinstance(j.get("k"), str)
                    ),
                    None,
                )
                if jwk is not None:
                    secret = _b64url_decode(jwk["k"])
            if secret is None:
                if jwt_secret is None:
                    return None
                secret = jwt_secret.encode()
            expected = hmac.new(secret, msg, _HS_ALGS[alg]).digest()
            if not hmac.compare_digest(expected, sig):
                return None
        else:
            return None  # ES*/Ed*: no EC primitives in this environment

        claims = json.loads(_b64url_decode(body_b64))
        for key in ("exp", "iat"):  # decimal exp/iat rounded like the reference
            if isinstance(claims.get(key), float):
                claims[key] = round(claims[key])
        if "role" not in claims or "exp" not in claims:
            return None
        if now_epoch is not None and int(claims["exp"]) <= now_epoch:
            return None
        return claims
    except Exception:
        return None


def verified_claims_col(token: Column, secret: str, now_epoch: int) -> Column:
    """Arrow-batched claims extraction: token -> claims JSON string or NULL."""

    @pandas_udf("string")
    def _verify(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda t: None
            if t is None
            else (
                (lambda c: json.dumps(c, sort_keys=True) if c else None)(
                    verify_jwt(t, secret, now_epoch)
                )
            )
        )

    return _verify(token)


def attach_claims(
    df: DataFrame, token_col: str, secret: str, now_epoch: int
) -> DataFrame:
    """Verify tokens and project (claims_json, claims_role); unverified rows
    keep NULL role and are droppable by the caller (fail-closed)."""
    out = df.withColumn(
        "claims_json", verified_claims_col(F.col(token_col), secret, now_epoch)
    )
    return out.withColumn(
        "claims_role", F.get_json_object(F.col("claims_json"), "$.role")
    )


# ---------------------------------------------------------------------------
# policy gates (P14 + authorization.ex read/write semantics)
# ---------------------------------------------------------------------------


def policies_df(spark: SparkSession, specs: Iterable[Mapping]) -> DataFrame:
    rows = [
        {
            "topic": s["topic"],
            "claims_role": s.get("claims_role", "authenticated"),
            "extension": s.get("extension", "broadcast"),
            "can_read": bool(s.get("can_read", False)),
            "can_write": bool(s.get("can_write", False)),
        }
        for s in specs
    ]
    return spark.createDataFrame(rows, schema=POLICY_SCHEMA_DDL)


def gate_messages(
    messages: DataFrame,
    policies: DataFrame,
    mode: str = "read",
    extension: str = "broadcast",
) -> DataFrame:
    """Drop private messages whose (topic, role, extension) policy denies
    `mode`. Public messages pass (reference gates only private channels).

    Broadcast join on (topic, claims_role); fail-closed: a private message
    with no policy row is dropped, like an unauthorized probe.
    """
    flag = "can_read" if mode == "read" else "can_write"
    p = F.broadcast(
        policies.filter(F.col("extension") == extension).select(
            F.col("topic").alias("p_topic"),
            F.col("claims_role").alias("p_role"),
            F.col(flag).alias("p_ok"),
        )
    )
    joined = messages.join(
        p,
        (messages["topic"] == F.col("p_topic"))
        & (messages["claims_role"] == F.col("p_role")),
        "left",
    )
    return joined.filter(
        (~F.col("private")) | F.coalesce(F.col("p_ok"), F.lit(False))
    ).drop("p_topic", "p_role", "p_ok")


# ---------------------------------------------------------------------------
# RLS row predicates (P7/J5)
# ---------------------------------------------------------------------------


def rls_policies_df(spark: SparkSession, specs: Iterable[Mapping]) -> DataFrame:
    """RLS policy registry: one Spark SQL expression per (schema, table, role).

    The expression sees the change's `record` map and the subscriber's
    claims via `claims_role` / `claims_sub` columns — the compiled analog of
    the reference's per-role prepared statement + set_config claims
    (reference: migrations/20211116212300:36-68, 20260626120000:491-536).
    """
    rows = [
        {
            "schema_name": s.get("schema", "public"),
            "table_name": s["table"],
            "claims_role": s.get("claims_role", "authenticated"),
            "policy_expr": s["policy_expr"],
        }
        for s in specs
    ]
    return spark.createDataFrame(
        rows,
        schema="schema_name string, table_name string, claims_role string, policy_expr string",
    )


def apply_rls_policies(pairs: DataFrame, rls_policies: DataFrame) -> DataFrame:
    """Filter matched (change, subscription) pairs by the RLS policy for the
    pair's (schema, table, role).

    The distinct policy expressions of a deployment are enumerable, so the
    filter compiles to one CASE over the (small, broadcast) policy registry —
    rows with no policy row pass (RLS not enabled for that table), rows whose
    policy evaluates false/NULL are dropped (fail-closed), matching
    `is_rls_enabled` semantics.
    """
    pol_rows = rls_policies.collect()  # tiny dimension: policy registry
    p = F.broadcast(
        rls_policies.withColumnRenamed("schema_name", "r_schema")
        .withColumnRenamed("table_name", "r_table")
        .withColumnRenamed("claims_role", "r_role")
    )
    joined = pairs.join(
        p,
        (F.col("c.schema_name") == F.col("r_schema"))
        & (F.col("c.table_name") == F.col("r_table"))
        & (F.col("s.claims_role") == F.col("r_role")),
        "left",
    )
    # build CASE policy_expr WHEN <expr-string> THEN eval(<expr>) chain
    cond = F.when(F.col("policy_expr").isNull(), F.lit(True))
    for expr_str in sorted({r["policy_expr"] for r in pol_rows}):
        cond = cond.when(
            F.col("policy_expr") == expr_str,
            F.coalesce(F.expr(expr_str), F.lit(False)),
        )
    cond = cond.otherwise(F.lit(False))
    return joined.filter(cond).drop("r_schema", "r_table", "r_role", "policy_expr")
