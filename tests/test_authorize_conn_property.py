"""Model-based property test for the connection-authorization outcome
machine (operators/auth.py::authorize_conn vs channels_authorization.ex:19-40
+ the Joken exp validator, jwt_verification.ex:23-26).

The model below re-states the reference's control flow independently of the
implementation: verify the signature, then — inside verify — run the exp
validator IF AND ONLY IF the claim is present (``is_number(exp) and
exp > now``, exp rounded half-away-from-zero first), then authorize_conn's
required-claims check. Hypothesis drives hostile claim shapes (missing /
expired / non-numeric / boolean / decimal exp, missing role, extra claims)
and token manglings (percent-encoding, ASCII whitespace insertion) through
both and asserts identical outcome tuples.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_spark.operators.auth import authorize_conn, sign_jwt

SECRET = "prop-secret"
NOW = 1_000_000


def _model(claims: dict, now_epoch: int | None):
    """Pure restatement of the reference flow (NOT the implementation)."""
    # Joken verify: claim validators run only for PRESENT claims
    if "exp" in claims:
        exp = claims["exp"]
        numeric = isinstance(exp, (int, float)) and not isinstance(exp, bool)
        if not numeric:
            return ("error", None, "invalid_token")
        exp = math.floor(exp + 0.5) if exp >= 0 else math.ceil(exp - 0.5)
        if now_epoch is not None and not exp > now_epoch:
            return (
                "expired_token",
                None,
                f"Token has expired {now_epoch - exp} seconds ago",
            )
    # authorize_conn's required-claims check, after verify succeeded
    if "role" not in claims or "exp" not in claims:
        return ("error", None, "missing_claims")
    expect = dict(claims)
    if isinstance(expect.get("exp"), float):
        v = expect["exp"]
        expect["exp"] = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return ("ok", expect, None)


exp_values = st.one_of(
    st.integers(min_value=NOW - 100, max_value=NOW + 100),  # straddle expiry
    st.integers(min_value=0, max_value=4_000_000_000),
    st.floats(
        min_value=0, max_value=4e9, allow_nan=False, allow_infinity=False
    ),
    st.text(max_size=8),
    st.booleans(),
    st.none(),
    st.lists(st.integers(), max_size=2),
)

claims_st = st.fixed_dictionaries(
    {},
    optional={
        "role": st.sampled_from(["anon", "authenticated", "service"]),
        "exp": exp_values,
        "sub": st.text(max_size=6),
    },
)


@settings(max_examples=300, deadline=None)
@given(claims=claims_st, check_now=st.booleans())
def test_authorize_conn_matches_reference_model(claims, check_now):
    now = NOW if check_now else None
    tok = sign_jwt(claims, SECRET)
    assert authorize_conn(tok, SECRET, now_epoch=now) == _model(claims, now)


@settings(max_examples=100, deadline=None)
@given(
    claims=claims_st,
    cut=st.integers(min_value=0, max_value=40),
    ws=st.sampled_from([" ", "\t", "\n", "\r", "\v", "\f", "\r\n "]),
    encode_dots=st.booleans(),
)
def test_mangled_token_cleans_to_same_outcome(claims, cut, ws, encode_dots):
    """clean_token: percent-decoding + ASCII-whitespace stripping recovers
    the token wherever the mangling lands, so the outcome matches the
    pristine token's."""
    tok = sign_jwt(claims, SECRET)
    mangled = tok[:cut] + ws + tok[cut:]
    if encode_dots:
        mangled = mangled.replace(".", "%2E")
    assert authorize_conn(mangled, SECRET, now_epoch=NOW) == authorize_conn(
        tok, SECRET, now_epoch=NOW
    )


def test_unicode_whitespace_breaks_verification():
    """The reference's non-unicode PCRE \\s does NOT strip U+00A0/U+2028 —
    a token mangled with them must fail, not silently verify."""
    tok = sign_jwt({"role": "anon", "exp": NOW + 100}, SECRET)
    for uws in (" ", " ", "　"):
        got = authorize_conn(tok[:10] + uws + tok[10:], SECRET, now_epoch=NOW)
        assert got == ("error", None, "invalid_token")
