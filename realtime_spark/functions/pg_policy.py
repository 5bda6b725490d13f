"""Postgres RLS policy SQL -> Spark SQL translation (P7 fidelity widening).

The reference evaluates tenant-authored row-level-security policy SQL under
role impersonation with the subscriber's JWT claims injected as session
config (reference: lib/realtime/tenants/repo/migrations/
20211116212300_create_realtime_subscription_table.ex:36-68 — the
`realtime.build_prepared_statement_sql` + `set_config('request.jwt.claims')`
pair; policy bodies are arbitrary SQL run by Postgres itself).

This repo compiles policies to Spark SQL strings evaluated set-at-a-time by
``operators.auth.apply_rls_policies`` (claims-parameterized, fail-closed).
Until now those strings had to be hand-written in Spark dialect; this module
accepts the policy in its native Postgres dialect and translates the
practically-occurring subset:

- ``auth.uid()`` / ``auth.role()`` / ``auth.email()`` / ``auth.jwt()`` with
  ``->``/``->>`` key extraction (the standard Supabase policy helpers)
- ``current_setting('request.jwt.claims', true)::json ->> 'k'`` (the raw
  form the helpers expand to)
- ``(select auth.uid())`` — the initplan-caching idiom — collapses to the
  plain call
- ``::type`` casts via the same pg->Spark type table as ``realtime.cast``
- comparison / boolean / arithmetic operators, ``[NOT] LIKE/ILIKE`` (and
  the ``~~``/``~~*`` spellings), ``[NOT] IN``, ``= ANY(...)``, ``BETWEEN``,
  ``IS [NOT] NULL/TRUE/FALSE/DISTINCT FROM``, string ``||``
- a whitelist of dialect-shared scalar functions
- the ``EXISTS (SELECT 1 FROM tbl WHERE tbl.k = col AND ...)`` probe shape,
  which does NOT become a row expression: it is decomposed into the
  equality keys + residual predicate that
  ``operators.auth.apply_rls_exists_policy`` turns into a left-semi join
  (the J5 plan) — set-at-a-time instead of a per-row subquery.

Anything outside the subset raises ``PolicyTranslationError`` — the caller
must fail CLOSED (the reference likewise errors the subscription when its
prepared statement fails to build, subscriptions.ex `create` error path).

Row-value references resolve DELETE-aware, matching apply_rls_exists_policy:
a bare column ``col`` becomes a lookup in ``old_record`` for DELETEs and
``record`` otherwise, cast to its catalog type's comparison family.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping

from realtime_spark.functions.casts import pg_type_to_spark


class PolicyTranslationError(ValueError):
    """Policy SQL outside the translatable subset — caller must deny."""


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<num>\d+\.\d+|\.\d+|\d+)
    | (?P<qid>"(?:[^"]|"")*")
    | (?P<id>[A-Za-z_][A-Za-z_0-9$]*)
    | (?P<op>::|->>|->|<=|>=|<>|!=|\|\||~~\*|!~~\*|!~~|~~|[=<>(),.\[\]+\-*/%])
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str  # 'str' | 'num' | 'id' | 'qid' | 'op'
    text: str  # raw text; for 'id' the LOWERCASED identifier
    raw: str = ""


def _lex(sql: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise PolicyTranslationError(
                f"unsupported character {sql[pos]!r} at offset {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "id":
            toks.append(_Tok("id", text.lower(), text))
        elif kind == "qid":
            # "Quoted"."Identifier" — unquote, preserve case
            toks.append(_Tok("id", text[1:-1].replace('""', '"'), text))
        else:
            toks.append(_Tok(kind, text, text))
    return toks


def _unquote_str(tok_text: str) -> str:
    return tok_text[1:-1].replace("''", "'")


def _spark_str(value: str) -> str:
    """Render a Python string as a Spark SQL literal (backslash escaping —
    Spark's default lexer treats backslash as the escape char, unlike pg)."""
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


# ---------------------------------------------------------------------------
# parser / translator
# ---------------------------------------------------------------------------

_CLAIM_HELPERS = {
    "uid": "sub",
    "email": "email",
    "role": "role",  # auth.role() — but claims_role column is authoritative
}

# scalar functions whose semantics match between the dialects for the
# argument types policies use (strings/numerics); anything else is rejected.
# Dialect-name divergences are bridged by _FN_RENAME at render time, and
# NULL-semantics divergences by _render_fn (pg concat() skips NULL args;
# Spark concat() returns NULL if any arg is NULL). Declared edge divergence:
# NEGATIVE length/position arguments to left/right/substring follow Spark
# semantics here (pg left(s,-1) drops the last char, Spark returns '';
# pg substr counts negative starts on the number line, Spark from the end) —
# the renderer carries no literal-value info to reject them statically, and
# real policies do not use them.
_FN_WHITELIST = {
    "lower", "upper", "length", "char_length", "trim", "ltrim", "rtrim",
    "abs", "coalesce", "nullif", "concat", "greatest", "least", "left",
    "right", "replace", "substring", "substr", "starts_with",
}

# pg name -> Spark registry name (Spark has startswith, not starts_with)
_FN_RENAME = {"starts_with": "startswith"}


# NOTE: _as_pg_text / _render_fn are _Parser methods — string context must
# distinguish a genuine record-column cast (unwrap to the raw record text)
# from a claims/computed cast (typed round-trip), which a shape regex over
# the render cannot do: both render as CAST(try_element_at(...) AS T).


def _parse_pg_array_literal(body: str) -> list[str | None]:
    """Parse the inside of a pg ``'{...}'`` array literal with text[]
    semantics: comma-separated elements; a double-quoted element may contain
    commas, braces, and backslash escapes (``\\"`` and ``\\\\``); unquoted
    elements are whitespace-trimmed, may use backslash escapes, and an
    unquoted NULL (any case) is the SQL NULL. Mirrors pg's array_in
    (src/backend/utils/adt/arrayfuncs.c ReadArrayStr)."""
    items: list[str | None] = []
    i, n = 0, len(body)
    if not body.strip():
        return items
    while True:
        while i < n and body[i] in " \t":
            i += 1
        if i < n and body[i] == '"':
            i += 1
            buf: list[str] = []
            while True:
                if i >= n:
                    raise PolicyTranslationError(
                        "unterminated quoted element in array literal"
                    )
                ch = body[i]
                if ch == "\\":
                    if i + 1 >= n:
                        raise PolicyTranslationError(
                            "dangling backslash in array literal"
                        )
                    buf.append(body[i + 1])
                    i += 2
                elif ch == '"':
                    i += 1
                    break
                else:
                    buf.append(ch)
                    i += 1
            items.append("".join(buf))
            while i < n and body[i] in " \t":
                i += 1
            if i < n and body[i] != ",":
                raise PolicyTranslationError(
                    f"expected ',' after quoted array element, got {body[i]!r}"
                )
        else:
            if i < n and body[i] == "{":
                # pg's array_in treats an unquoted '{' as a sub-array opener
                # — for the 1-D text[] this caller handles, that is an error
                # in pg; accepting it as a literal string would be MORE
                # permissive than the reference (fail closed instead)
                raise PolicyTranslationError(
                    "nested array literal unsupported (1-D text[] only)"
                )
            buf = []
            while i < n and body[i] != ",":
                ch = body[i]
                if ch == "\\":
                    if i + 1 >= n:
                        raise PolicyTranslationError(
                            "dangling backslash in array literal"
                        )
                    buf.append(body[i + 1])
                    i += 2
                elif ch == '"':
                    raise PolicyTranslationError(
                        "misplaced quote inside unquoted array element"
                    )
                else:
                    buf.append(ch)
                    i += 1
            val = "".join(buf).strip()
            if not val:
                raise PolicyTranslationError(
                    "empty unquoted element in array literal"
                )
            items.append(None if val.upper() == "NULL" else val)
        if i >= n:
            return items
        i += 1  # skip the comma


_EXISTS_ERR = (
    "EXISTS is only supported as the entire policy body of the form "
    "EXISTS (SELECT 1 FROM tbl [alias] WHERE tbl.col = <row column> "
    "[AND ...residual...]); use compile_pg_policy() and route kind='exists' "
    "to apply_rls_exists_policy"
)


@dataclass
class CompiledPolicy:
    """kind='expr': ``spark_sql`` feeds rls_policies_df/apply_rls_policies.
    kind='exists': (table, keys, residual_sql) feed apply_rls_exists_policy —
    filter the lookup frame by residual_sql (it references lookup columns and
    claim literals only), then semi-join on keys."""

    kind: str  # 'expr' | 'exists'
    spark_sql: str = ""
    table: str = ""
    keys: list[tuple[str, str]] = field(default_factory=list)
    residual_sql: str = ""


class _Parser:
    def __init__(
        self,
        toks: list[_Tok],
        type_map: Mapping[str, str],
        record: str,
        old_record: str,
        action: str,
        claims: str,
        claims_role: str,
        local_cols: Mapping[str, str] | None = None,
        local_alias: str | None = None,
        claims_literals: Mapping[str, str] | None = None,
    ):
        self.toks = toks
        self.i = 0
        self.type_map = {k.lower(): v for k, v in type_map.items()}
        self.record = record
        self.old_record = old_record
        self.action = action
        self.claims = claims
        self.claims_role = claims_role
        # inside an EXISTS subquery body: columns of the lookup table render
        # as bare names (evaluated against the lookup frame), and references
        # to outer row columns are collected as join keys
        self.local_cols = {k.lower(): v for k, v in (local_cols or {}).items()}
        self.local_alias = (local_alias or "").lower()
        # concrete claims (the set_config('request.jwt.claims') analog):
        # when provided, claim helpers render as literals — required inside
        # EXISTS bodies, whose residual runs against the lookup frame where
        # the subscription's claims columns do not exist
        self.claims_literals = claims_literals
        # cast render -> raw render for record columns emitted by
        # _record_col, so string context (_as_pg_text) can unwrap exactly
        # those and nothing else. A claims lookup cast to a comparison type
        # renders with the same CAST(try_element_at(...)) shape but must
        # KEEP its typed round-trip (pg: ('+5')::int::text -> '5').
        self._record_casts: dict[str, str] = {}

    # -- token helpers ------------------------------------------------------
    def _peek(self, off: int = 0) -> _Tok | None:
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise PolicyTranslationError("unexpected end of policy SQL")
        self.i += 1
        return t

    def _accept(self, kind: str, text: str | None = None) -> _Tok | None:
        t = self._peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return t
        return None

    def _expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self._accept(kind, text)
        if t is None:
            got = self._peek()
            raise PolicyTranslationError(
                f"expected {text or kind}, got {got.raw if got else 'end'!r}"
            )
        return t

    # -- grammar ------------------------------------------------------------
    def parse(self) -> str:
        out = self._or()
        if self._peek() is not None:
            raise PolicyTranslationError(
                f"trailing tokens from {self._peek().raw!r}"
            )
        if "\x00JWT\x00" in out:
            raise PolicyTranslationError(
                "auth.jwt()/current_setting('request.jwt.claims') must be "
                "followed by ->> 'key' (the claims map is not a scalar)"
            )
        return out

    def _or(self) -> str:
        parts = [self._and()]
        while self._accept("id", "or"):
            parts.append(self._and())
        return " OR ".join(parts) if len(parts) > 1 else parts[0]

    def _and(self) -> str:
        parts = [self._not()]
        while self._accept("id", "and"):
            parts.append(self._not())
        return " AND ".join(parts) if len(parts) > 1 else parts[0]

    def _not(self) -> str:
        if self._accept("id", "not"):
            return f"(NOT {self._not()})"
        return self._cmp()

    def _cmp(self) -> str:
        left = self._additive()
        t = self._peek()
        if t is None:
            return left
        # IS [NOT] NULL / TRUE / FALSE / DISTINCT FROM
        if t.kind == "id" and t.text == "is":
            self._next()
            neg = bool(self._accept("id", "not"))
            if self._accept("id", "distinct"):
                self._expect("id", "from")
                right = self._additive()
                op = "IS NOT DISTINCT FROM" if neg else "IS DISTINCT FROM"
                return f"({left} {op} {right})"
            kw = self._next()
            if kw.kind != "id" or kw.text not in ("null", "true", "false", "unknown"):
                raise PolicyTranslationError(f"IS {kw.raw!r} unsupported")
            word = "NULL" if kw.text == "unknown" else kw.text.upper()
            return f"({left} IS {'NOT ' if neg else ''}{word})"
        neg = False
        if t.kind == "id" and t.text == "not":
            nxt = self._peek(1)
            if nxt and nxt.kind == "id" and nxt.text in ("like", "ilike", "in", "between"):
                self._next()
                neg = True
                t = self._peek()
        if t.kind == "id" and t.text in ("like", "ilike"):
            self._next()
            right = self._additive()
            return f"({left} {'NOT ' if neg else ''}{t.text.upper()} {right})"
        if t.kind == "id" and t.text == "between":
            self._next()
            lo = self._additive()
            self._expect("id", "and")
            hi = self._additive()
            return f"({left} {'NOT ' if neg else ''}BETWEEN {lo} AND {hi})"
        if t.kind == "id" and t.text == "in":
            self._next()
            self._expect("op", "(")
            items = [self._additive()]
            while self._accept("op", ","):
                items.append(self._additive())
            self._expect("op", ")")
            return f"({left} {'NOT ' if neg else ''}IN ({', '.join(items)}))"
        if t.kind == "op" and t.text in ("=", "<>", "!=", "<", "<=", ">", ">=", "~~", "~~*", "!~~", "!~~*"):
            self._next()
            # x = ANY(ARRAY[...]) / x = ANY('{...}')  ->  IN list
            if t.text == "=" and self._accept("id", "any"):
                return self._any_list(left)
            op = {"!=": "<>", "~~": "LIKE", "~~*": "ILIKE"}.get(t.text, t.text)
            if t.text in ("!~~", "!~~*"):
                right = self._additive()
                return f"({left} NOT {'ILIKE' if t.text.endswith('*') else 'LIKE'} {right})"
            right = self._additive()
            return f"({left} {op} {right})"
        return left

    def _any_list(self, left: str) -> str:
        self._expect("op", "(")
        items: list[str]
        if self._accept("id", "array"):
            self._expect("op", "[")
            items = [self._additive()]
            while self._accept("op", ","):
                items.append(self._additive())
            self._expect("op", "]")
        else:
            t = self._peek()
            if t is None or t.kind != "str":
                raise PolicyTranslationError("= ANY(...) expects ARRAY[..] or a '{..}' literal")
            self._next()
            body = _unquote_str(t.text)
            if not (body.startswith("{") and body.endswith("}")):
                raise PolicyTranslationError("= ANY('literal') must be a '{a,b}' array literal")
            elems = _parse_pg_array_literal(body[1:-1])
            if not elems:
                raise PolicyTranslationError("= ANY('{}') empty array literal")
            items = ["NULL" if v is None else _spark_str(v) for v in elems]
            # a trailing ::type[] cast on the literal is meaningless post-expansion
            while self._accept("op", "::"):
                self._type_name()
        self._expect("op", ")")
        return f"({left} IN ({', '.join(items)}))"

    def _additive(self) -> str:
        left = self._mul()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text in ("+", "-", "||"):
                self._next()
                right = self._mul()
                if t.text == "||":
                    # pg string context (anytext ||): record columns render
                    # as raw text, everything else casts to string — Spark's
                    # implicit numeric->string coercion would otherwise
                    # rescale decimals ('2.5' -> '2.500000000')
                    left = f"({self._as_pg_text(left)} || {self._as_pg_text(right)})"
                else:
                    left = f"({left} {t.text} {right})"
            else:
                return left

    def _mul(self) -> str:
        left = self._unary()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text in ("*", "/", "%"):
                self._next()
                if t.text == "/":
                    # pg `/` on integer operands TRUNCATES (7/2 = 3) while
                    # Spark's `/` is always double division (3.5) — the
                    # renderer carries no operand types, so a faithful
                    # translation is impossible and `a / b = c` would
                    # silently match different rows. Outside the subset ->
                    # fail closed (`*` and `%` agree between the dialects).
                    raise PolicyTranslationError(
                        "division is not translatable (pg integer `/` "
                        "truncates, Spark's is double division) — rewrite "
                        "the policy without `/`"
                    )
                right = self._unary()
                left = f"({left} {t.text} {right})"
            else:
                return left

    def _unary(self) -> str:
        if self._accept("op", "-"):
            return f"(- {self._unary()})"
        return self._postfix()

    def _postfix(self) -> str:
        out = self._primary()
        while True:
            if self._accept("op", "::"):
                spark_t = self._type_name()
                if spark_t is None:
                    pass
                elif spark_t == "STRING":
                    # pg string context: a direct record column's raw text
                    # IS pg's text rendering — never round-trip it through
                    # the comparison-type cast (see _as_pg_text)
                    out = self._as_pg_text(out)
                else:
                    raw = self._record_casts.get(out)
                    out_new = f"CAST({out} AS {spark_t})"
                    if raw is not None and out.endswith(f" AS {spark_t})"):
                        # an explicit re-cast to the column's OWN comparison
                        # type (o_totalprice::numeric) is a value identity;
                        # pg's subsequent ::text still renders the stored
                        # text, so the raw mapping carries forward. A cast
                        # to a DIFFERENT type is a genuine conversion whose
                        # text form pg derives from the converted value —
                        # that one keeps the typed round-trip.
                        self._record_casts[out_new] = raw
                    out = out_new
            elif self._peek() and self._peek().kind == "op" and self._peek().text in ("->", "->>"):
                op = self._next().text
                key = self._next()
                if key.kind == "str":
                    k = _unquote_str(key.text)
                    if out == "\x00JWT\x00":
                        out = self._claims_get(k)
                    else:
                        out = self._json_get(out, k, op)
                elif key.kind == "num":
                    raise PolicyTranslationError("json array indexing (-> n) unsupported")
                else:
                    raise PolicyTranslationError(f"bad {op} key {key.raw!r}")
            else:
                return out

    def _type_name(self) -> str | None:
        """Consume a pg type name; return the Spark cast target, or None when
        the cast is an identity in this engine (everything is text-carried,
        so ::text/::uuid/::json change nothing)."""
        name = self._expect("id").text
        # two-word types: double precision, character varying, timestamp with[out] time zone
        if name == "double" and self._accept("id", "precision"):
            name = "double precision"
        elif name == "character" and self._accept("id", "varying"):
            name = "character varying"
        elif name == "timestamp" and self._peek() and self._peek().kind == "id" \
                and self._peek().text in ("with", "without"):
            tz = self._next().text
            self._expect("id", "time")
            self._expect("id", "zone")
            name = f"timestamp {tz} time zone"
        if self._accept("op", "["):
            self._expect("op", "]")
            return None  # array casts: values stay text
        if name in ("json", "jsonb"):
            # claims stay a map (the ->> postfix does the lookup); row values
            # stay text — either way the cast is a no-op here
            return None
        # ::text (and the other string-family casts) must really cast: the
        # operand may already be a CAST(... AS BIGINT) from its catalog type
        return pg_type_to_spark(name).upper()

    def _claims_get(self, key: str) -> str:
        if self.claims_literals is not None:
            v = self.claims_literals.get(key)
            return _spark_str(str(v)) if v is not None else "NULL"
        if self.local_cols:
            raise PolicyTranslationError(
                "claim references inside an EXISTS body need concrete claims "
                "(pass claims_literals) — the residual predicate runs on the "
                "lookup frame, which has no subscription columns"
            )
        if key == "role":
            return self.claims_role
        return f"try_element_at({self.claims}, {_spark_str(key)})"

    def _json_get(self, operand: str, key: str, op: str) -> str:
        """``->``/``->>`` on a non-claims-map operand. Everything here is
        text-carried (json/jsonb columns and nested claim values render as
        strings), so extraction compiles to ``get_json_object``. Navigation
        (``->`` into an object/array) and ``->>`` scalar extraction are
        exact; the one divergence is ``->`` of a scalar *string*, where pg
        keeps the JSON quotes and get_json_object strips them. Non-text
        operands (a CAST from a numeric/timestamp catalog type) would be a
        type error in pg too — reject at translate time so the caller fails
        closed instead of crashing the whole pairs query at analysis."""
        if operand.startswith("CAST("):
            raise PolicyTranslationError(
                f"{op} applied to a non-json operand (json extraction needs "
                "a json/jsonb/text value)"
            )
        if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", key):
            path = f"$.{key}"
        elif "'" in key or "\\" in key or "[" in key or "]" in key:
            raise PolicyTranslationError(f"unsupported json key {key!r}")
        else:
            path = f"$['{key}']"
        return f"get_json_object({operand}, {_spark_str(path)})"

    def _record_col(self, col: str, force_outer: bool = False) -> str:
        lc = col.lower()
        if self.local_cols:
            # inside EXISTS body: lookup columns are plain references; outer
            # row columns are join keys, surfaced via a marker the EXISTS
            # decomposer pulls back out. Unqualified names resolve inner-first
            # (pg subquery scoping); a qualified outer ref (watched_tbl.col)
            # forces the row side even when the lookup shares the name.
            if lc in self.local_cols and not force_outer:
                return lc
            if lc in self.type_map:
                return f"\x00OUTER:{lc}\x00"
            raise PolicyTranslationError(
                f"unknown column {col!r} in EXISTS body (neither lookup nor row)"
            )
        if lc not in self.type_map:
            raise PolicyTranslationError(
                f"unknown column {col!r} (not in the relation's type map)"
            )
        target = (
            f"CASE WHEN {self.action} = 'DELETE' THEN {self.old_record} "
            f"ELSE {self.record} END"
        )
        raw = f"try_element_at({target}, {_spark_str(lc)})"
        spark_t = pg_type_to_spark(self.type_map[lc])
        if spark_t == "string":
            return raw
        val = f"CAST({raw} AS {spark_t.upper()})"
        self._record_casts[val] = raw
        return val

    def _as_pg_text(self, arg: str) -> str:
        """Render an expression in pg STRING context. For a direct
        record-column reference, the raw record text IS pg's rendering —
        wal2json wrote the value with the same `*_out` function pg's own
        cast-to-text calls — so unwrap the comparison-type cast instead of
        round-tripping through it: the decimal(38,9) round-trip would
        rescale ('2.5' -> '2.500000000') and the timestamp round-trip
        would re-format. Only renders recorded by _record_col unwrap;
        everything else (claims casts included) casts to string, keeping
        pg's typed round-trip ('+5'::int::text -> '5'). Computed NUMERIC
        expressions render via Spark's string cast — the declared
        approximation."""
        raw = self._record_casts.get(arg)
        if raw is not None:
            return raw
        return f"cast({arg} as string)"

    def _render_fn(self, name: str, args: list[str]) -> str:
        spark_name = _FN_RENAME.get(name, name)
        if name == "concat":
            # pg concat() ignores NULL arguments; Spark concat() is NULL if
            # any argument is NULL — coalesce each arg to keep pg semantics.
            # The string context renders record columns as their RAW text
            # (_as_pg_text), which also keeps the coalesce unambiguously
            # string-typed: under ANSI mode a numeric arg would otherwise
            # coerce the '' fallback to the numeric type and abort the query
            # with CAST_INVALID_INPUT on any NULL row.
            args = [f"coalesce({self._as_pg_text(a)}, '')" for a in args]
        return f"{spark_name}({', '.join(args)})"

    def _primary(self) -> str:
        t = self._next()
        if t.kind == "str":
            return _spark_str(_unquote_str(t.text))
        if t.kind == "num":
            return t.text
        if t.kind == "op" and t.text == "(":
            # (select auth.xxx()) initplan idiom
            if self._peek() and self._peek().kind == "id" and self._peek().text == "select":
                self._next()
                inner = self._or()
                self._expect("op", ")")
                return inner
            inner = self._or()
            self._expect("op", ")")
            return f"({inner})"
        if t.kind != "id":
            raise PolicyTranslationError(f"unexpected token {t.raw!r}")

        name = t.text
        if name in ("true", "false", "null"):
            return name.upper()
        if name == "exists":
            raise PolicyTranslationError(_EXISTS_ERR)
        if name == "case":
            raise PolicyTranslationError("CASE expressions unsupported in policies")

        # qualified: auth.fn(...), alias.col, schema.table is not a thing here
        if self._accept("op", "."):
            member = self._expect("id").text
            if name == "auth":
                self._expect("op", "(")
                self._expect("op", ")")
                if member in _CLAIM_HELPERS:
                    return self._claims_get(_CLAIM_HELPERS[member])
                if member == "jwt":
                    # resolved by the ->/->> postfix (claims map or literal)
                    return "\x00JWT\x00"
                raise PolicyTranslationError(f"auth.{member}() unsupported")
            if self.local_cols and name == self.local_alias:
                if member in self.local_cols:
                    return member
                raise PolicyTranslationError(
                    f"unknown lookup column {name}.{member}"
                )
            # qualified row reference like orders.o_custkey — treat the
            # qualifier as the watched relation (forcing the outer side when
            # inside an EXISTS body)
            return self._record_col(member, force_outer=True)

        if name == "current_setting":
            self._expect("op", "(")
            arg = self._next()
            if arg.kind != "str":
                raise PolicyTranslationError("current_setting requires a literal name")
            setting = _unquote_str(arg.text)
            if self._accept("op", ","):
                self._next()  # missing_ok flag — irrelevant here
            self._expect("op", ")")
            if setting in ("request.jwt.claims", "request.jwt.claim"):
                return "\x00JWT\x00"  # ::json ->> 'k' postfix does the lookup
            if setting.startswith("request.jwt.claim."):
                return self._claims_get(setting.rsplit(".", 1)[1])
            if setting == "role":
                return self.claims_role
            raise PolicyTranslationError(f"current_setting({setting!r}) unsupported")

        if self._peek() and self._peek().kind == "op" and self._peek().text == "(":
            if name not in _FN_WHITELIST:
                raise PolicyTranslationError(f"function {name}() unsupported")
            self._next()
            if self._accept("op", ")"):
                return self._render_fn(name, [])
            args = [self._or()]
            while self._accept("op", ","):
                args.append(self._or())
            self._expect("op", ")")
            return self._render_fn(name, args)

        return self._record_col(name)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

_OUTER_RE = re.compile("\x00OUTER:([a-z_0-9$]+)\x00")


def translate_pg_policy(
    sql: str,
    type_map: Mapping[str, str],
    record: str = "c.record",
    old_record: str = "c.old_record",
    action: str = "c.action",
    claims: str = "s.claims",
    claims_role: str = "s.claims_role",
    claims_literals: Mapping[str, str] | None = None,
) -> str:
    """Translate a Postgres policy USING-expression to a Spark SQL string for
    ``rls_policies_df`` / ``apply_rls_policies``. Raises
    ``PolicyTranslationError`` outside the subset (callers deny)."""
    p = _Parser(
        _lex(sql), type_map, record, old_record, action, claims, claims_role,
        claims_literals=claims_literals,
    )
    return p.parse()


def compile_pg_policy(
    sql: str,
    type_map: Mapping[str, str],
    lookup_cols: Mapping[str, Mapping[str, str]] | None = None,
    claims_literals: Mapping[str, str] | None = None,
    **refs: str,
) -> CompiledPolicy:
    """Translate a policy, routing the EXISTS-probe shape to its plan.

    ``lookup_cols``: {table_name: {col: pg_type}} for tables an EXISTS body
    may probe. A policy that is exactly
    ``EXISTS (SELECT 1 FROM tbl [AS] [alias] WHERE ...)`` decomposes into
    kind='exists' with equality join keys [(record_key, lookup_col)] and a
    residual predicate over the remaining lookup-only conjuncts; everything
    else returns kind='expr'.
    """
    toks = _lex(sql)
    if not (toks and toks[0].kind == "id" and toks[0].text == "exists"):
        return CompiledPolicy(
            kind="expr",
            spark_sql=translate_pg_policy(
                sql, type_map, claims_literals=claims_literals, **refs
            ),
        )

    # EXISTS ( SELECT <one|1|*> FROM table [AS] [alias] WHERE <body> )
    i = 1

    def expect(kind, text=None):
        nonlocal i
        if i >= len(toks) or toks[i].kind != kind or (text is not None and toks[i].text != text):
            got = toks[i].raw if i < len(toks) else "end"
            raise PolicyTranslationError(f"{_EXISTS_ERR} (at {got!r})")
        i += 1
        return toks[i - 1]

    expect("op", "(")
    expect("id", "select")
    if i < len(toks) and (
        toks[i].kind in ("num", "id") and toks[i].text != "from"
        or (toks[i].kind == "op" and toks[i].text == "*")
    ):
        i += 1  # the projected scalar is irrelevant
    expect("id", "from")
    table = expect("id").text
    alias = table
    if i < len(toks) and toks[i].kind == "id" and toks[i].text not in ("where",):
        if toks[i].text == "as":
            i += 1
        alias = expect("id").text
    expect("id", "where")
    # body runs to the matching close paren (which must end the policy)
    if toks[-1].kind != "op" or toks[-1].text != ")":
        raise PolicyTranslationError(_EXISTS_ERR)
    body = toks[i:-1]
    cols = (lookup_cols or {}).get(table)
    if cols is None:
        raise PolicyTranslationError(
            f"EXISTS probes unknown table {table!r}; pass lookup_cols"
        )

    # split top-level AND conjuncts on the token stream
    conjuncts: list[list[_Tok]] = [[]]
    depth = 0
    for t in body:
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
            if depth < 0:
                raise PolicyTranslationError(_EXISTS_ERR)
        if depth == 0 and t.kind == "id" and t.text == "and":
            conjuncts.append([])
        else:
            conjuncts[-1].append(t)
    if depth != 0:
        raise PolicyTranslationError(_EXISTS_ERR)

    keys: list[tuple[str, str]] = []
    residual: list[str] = []
    refs.setdefault("claims", "s.claims")
    refs.setdefault("claims_role", "s.claims_role")
    for cj in conjuncts:
        if not cj:
            raise PolicyTranslationError("empty conjunct in EXISTS body")
        p = _Parser(
            list(cj), type_map,
            record=refs.get("record", "c.record"),
            old_record=refs.get("old_record", "c.old_record"),
            action=refs.get("action", "c.action"),
            claims=refs["claims"], claims_role=refs["claims_role"],
            local_cols=cols, local_alias=alias,
            claims_literals=claims_literals,
        )
        rendered = p.parse()
        outers = _OUTER_RE.findall(rendered)
        if not outers:
            residual.append(rendered)
            continue
        # must be exactly `lookupcol = OUTER` / `OUTER = lookupcol` — the
        # OUTER marker position decides which side is the row column (a
        # membership test against the lookup's columns would mis-orient the
        # key when both relations share both names — RLS fail-open)
        m = re.fullmatch(
            r"\(([a-z_0-9$]+) = \x00OUTER:([a-z_0-9$]+)\x00\)", rendered
        )
        if m:
            lk, rec = m.group(1), m.group(2)
        else:
            m = re.fullmatch(
                r"\(\x00OUTER:([a-z_0-9$]+)\x00 = ([a-z_0-9$]+)\)", rendered
            )
            if m:
                rec, lk = m.group(1), m.group(2)
        if not m:
            shown = _OUTER_RE.sub(r"<row:\1>", rendered)
            raise PolicyTranslationError(
                "EXISTS conjuncts referencing row columns must be plain "
                f"equalities lookup.col = row_col (got: {shown})"
            )
        if lk not in cols:
            raise PolicyTranslationError(
                f"EXISTS key equality must compare a {table!r} column to a "
                f"row column (got {lk!r} = row.{rec})"
            )
        keys.append((rec, lk))
    if not keys:
        raise PolicyTranslationError(
            "EXISTS body has no row-column equality — the probe would be "
            "unconstrained (fail closed)"
        )
    return CompiledPolicy(
        kind="exists",
        table=table,
        keys=keys,
        residual_sql=" AND ".join(residual) if residual else "",
    )
