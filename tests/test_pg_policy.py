"""Postgres policy SQL -> Spark SQL translation (P7 widening).

Translation-layer tests are pure Python; the evaluation tests drive the
translated expressions through the real apply_rls_policies /
apply_rls_exists_policy plans on a Spark frame and compare against a
row-by-row Python reimplementation of the policy.
"""

from __future__ import annotations

import pytest

from realtime_spark.functions.pg_policy import (
    CompiledPolicy,
    PolicyTranslationError,
    compile_pg_policy,
    translate_pg_policy,
)

TM = {
    "o_custkey": "int8",
    "o_orderstatus": "text",
    "o_totalprice": "numeric",
    "o_orderdate": "timestamp",
    "user_id": "uuid",
    "tenant": "text",
    "room_id": "int8",
}
LK = {"members": {"room_id": "int8", "member_id": "uuid", "status": "text"}}


# ---------------------------------------------------------------------------
# translation
# ---------------------------------------------------------------------------

REC = "try_element_at(CASE WHEN c.action = 'DELETE' THEN c.old_record ELSE c.record END, "


@pytest.mark.parametrize(
    "pg,expected",
    [
        ("auth.uid() = user_id",
         f"(try_element_at(s.claims, 'sub') = {REC}'user_id'))"),
        ("(select auth.uid()) = user_id",
         f"(try_element_at(s.claims, 'sub') = {REC}'user_id'))"),
        ("auth.role() = 'authenticated'", "(s.claims_role = 'authenticated')"),
        ("auth.jwt() ->> 'tenant_id' = tenant",
         f"(try_element_at(s.claims, 'tenant_id') = {REC}'tenant'))"),
        ("current_setting('request.jwt.claims', true)::json ->> 'sub' = user_id",
         f"(try_element_at(s.claims, 'sub') = {REC}'user_id'))"),
        ("current_setting('request.jwt.claim.sub') = user_id",
         f"(try_element_at(s.claims, 'sub') = {REC}'user_id'))"),
        # typed column: catalog type drives the cast, int casts to BIGINT
        ("o_custkey = 7", f"(CAST({REC}'o_custkey') AS BIGINT) = 7)"),
        # ANY -> IN, both spellings
        ("o_orderstatus = ANY(ARRAY['a', 'b'])",
         f"({REC}'o_orderstatus') IN ('a', 'b'))"),
        ("o_orderstatus = ANY('{a,b}'::text[])",
         f"({REC}'o_orderstatus') IN ('a', 'b'))"),
        # pg operator spellings normalize
        ("o_orderstatus ~~* '%x%'", f"({REC}'o_orderstatus') ILIKE '%x%')"),
        ("o_orderstatus !~~ 'x'", f"({REC}'o_orderstatus') NOT LIKE 'x')"),
        ("o_orderstatus != 'F'", f"({REC}'o_orderstatus') <> 'F')"),
    ],
)
def test_translate_shapes(pg, expected):
    assert translate_pg_policy(pg, TM) == expected


def test_translate_cast_and_case_insensitive_keywords():
    out = translate_pg_policy("O_OrderStatus In ('a','b') AND o_custkey::text = '1'", TM)
    assert "IN ('a', 'b')" in out
    # ::text on an int column: the ::text cast re-renders the casted BIGINT
    assert "o_custkey" in out


def test_translate_string_escaping():
    # pg '' escape becomes a safely-escaped Spark literal (backslash rules)
    out = translate_pg_policy("o_orderstatus = 'it''s'", TM)
    assert "\\'" in out and "''" not in out


@pytest.mark.parametrize(
    "bad",
    [
        "no_such_col = 1",                    # unknown column
        "o_custkey = 5; drop table x",        # statement injection
        "delete from x",                       # not an expression
        "pg_sleep(10) = 1",                    # non-whitelisted function
        "auth.jwt() = 'x'",                    # claims map used as scalar
        "CASE WHEN true THEN true ELSE false END",  # unsupported construct
        "o_custkey = (SELECT max(x) FROM t)",  # scalar subquery
        "EXISTS (SELECT 1 FROM members m WHERE m.status = 'x') AND true",
    ],
)
def test_translate_rejects_fail_closed(bad):
    with pytest.raises(PolicyTranslationError):
        translate_pg_policy(bad, TM)


def test_exists_decomposition():
    cp = compile_pg_policy(
        "EXISTS (SELECT 1 FROM members m WHERE m.room_id = orders.room_id "
        "AND m.status = 'active')",
        TM, lookup_cols=LK,
    )
    assert cp.kind == "exists"
    assert cp.table == "members"
    assert cp.keys == [("room_id", "room_id")]
    assert cp.residual_sql == "(status = 'active')"


def test_exists_unqualified_outer_and_claims_literal():
    cp = compile_pg_policy(
        "EXISTS (SELECT 1 FROM members m WHERE m.member_id = user_id "
        "AND m.status = auth.role())",
        TM, lookup_cols=LK, claims_literals={"role": "authenticated"},
    )
    assert cp.keys == [("user_id", "member_id")]
    assert cp.residual_sql == "(status = 'authenticated')"


@pytest.mark.parametrize(
    "bad",
    [
        # inner-first scoping makes the equality lookup-local -> no key
        "EXISTS (SELECT 1 FROM members m WHERE m.room_id = room_id)",
        # non-equality row reference
        "EXISTS (SELECT 1 FROM members m WHERE m.room_id > orders.room_id)",
        # claims in residual without literals
        "EXISTS (SELECT 1 FROM members m WHERE m.member_id = auth.uid())",
        # unknown probe table
        "EXISTS (SELECT 1 FROM secrets s WHERE s.k = orders.room_id)",
    ],
)
def test_exists_rejects_fail_closed(bad):
    with pytest.raises(PolicyTranslationError):
        compile_pg_policy(bad, TM, lookup_cols=LK)


def test_expr_policy_roundtrip_through_compile():
    cp = compile_pg_policy("o_orderstatus = 'O'", TM, lookup_cols=LK)
    assert cp == CompiledPolicy(
        kind="expr", spark_sql=f"({REC}'o_orderstatus') = 'O')"
    )


# ---------------------------------------------------------------------------
# evaluation on the real plans
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spark():
    from realtime_spark.session import get_spark

    return get_spark("test_pg_policy", cpus=4)


SF = "/root/testdata/sf0.001"


def _pairs(spark, claims=None):
    import __spark_entry__ as em
    from realtime_spark.operators.cdc import matched_pairs
    from realtime_spark.sources.testdata import changes_from_orders

    changes = changes_from_orders(spark, SF)
    spec = {"subscription_id": "s1", "schema": "public", "table": "orders"}
    if claims:
        spec["claims"] = claims
    subs = em.subscriptions_df(spark, [spec])
    return changes, matched_pairs(changes, subs)


def _expected_rows(changes, pred):
    """Python reimplementation over collected change rows (DELETE-aware)."""
    out = set()
    for r in changes.collect():
        rec = r["old_record"] if r["action"] == "DELETE" else r["record"]
        if rec is not None and pred(rec):
            out.add(r["change_id"])
    return out


def test_eval_claims_policy(spark):
    from realtime_spark.operators.auth import apply_rls_policies, rls_policies_df

    changes, pairs = _pairs(spark, claims={"sub": "77", "tenant_id": "t-9"})
    pg = "auth.uid() = o_custkey::text OR o_orderstatus = 'P'"
    expr = translate_pg_policy(pg, {"o_custkey": "int8", "o_orderstatus": "text"})
    pols = rls_policies_df(
        spark, [{"table": "orders", "policy_expr": expr}]
    )
    got = {
        r["change_id"]
        for r in apply_rls_policies(pairs, pols).select("c.change_id").collect()
    }
    want = _expected_rows(
        changes,
        lambda rec: rec.get("o_custkey") == "77" or rec.get("o_orderstatus") == "P",
    )
    assert got == want and want


def test_eval_numeric_cast_policy(spark):
    from realtime_spark.operators.auth import apply_rls_policies, rls_policies_df

    changes, pairs = _pairs(spark)
    expr = translate_pg_policy(
        "o_totalprice > 200000 AND o_orderstatus <> 'F'",
        {"o_totalprice": "numeric", "o_orderstatus": "text"},
    )
    pols = rls_policies_df(spark, [{"table": "orders", "policy_expr": expr}])
    got = {
        r["change_id"]
        for r in apply_rls_policies(pairs, pols).select("c.change_id").collect()
    }
    want = _expected_rows(
        changes,
        lambda rec: float(rec.get("o_totalprice") or 0) > 200000
        and rec.get("o_orderstatus") != "F",
    )
    assert got == want and want


def test_eval_exists_policy(spark):
    """The EXISTS probe end-to-end: policy text -> compile -> semi-join plan."""
    from pyspark.sql import functions as F

    from realtime_spark.operators.auth import apply_rls_exists_policy
    from realtime_spark.sources.testdata import load_table

    changes, pairs = _pairs(spark)
    cp = compile_pg_policy(
        "EXISTS (SELECT 1 FROM customer cu WHERE cu.c_custkey = orders.o_custkey "
        "AND cu.c_mktsegment = 'BUILDING')",
        {"o_custkey": "int8"},
        lookup_cols={"customer": {"c_custkey": "int8", "c_mktsegment": "text"}},
    )
    assert cp.kind == "exists" and cp.keys == [("o_custkey", "c_custkey")]
    lookup = load_table(spark, SF, "customer")
    if cp.residual_sql:
        lookup = lookup.filter(F.expr(cp.residual_sql))
    got_df = apply_rls_exists_policy(
        pairs, lookup, cp.keys, table_name="orders", claims_role="authenticated"
    )
    got = {r["change_id"] for r in got_df.select("c.change_id").collect()}
    building = {
        str(r["c_custkey"])
        for r in load_table(spark, SF, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .collect()
    }
    want = _expected_rows(changes, lambda rec: rec.get("o_custkey") in building)
    assert got == want and want
