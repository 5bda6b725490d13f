"""The core CDC query: change-events ⋈ subscriptions with filter visibility.

Reference behavior reproduced:
  - J1 subscription-to-event match: `subscription WHERE entity = $1 AND
    (action_filter = '*' OR action_filter = action)` then per-subscription
    filter evaluation (reference: migrations/20260626120000:330-337; hash
    index on entity migrations/20211116024918:45)
  - P5 action filter (reference: subscriptions.ex:382-393)
  - P6/J7 schema/table wildcard, expanded against publication tables at
    subscription-load time (reference: subscriptions.ex:61-74)
  - P3 conjunctive fail-closed visibility (reference: migrations/20260626120000:158-185)
  - A5 visible subscription_ids collected per change
    (reference: migrations/20260626120000:500-536,639-648)

Spark-first design for 100 TB: subscriptions are a small dimension, so the
match is a **broadcast hash join** on the equi keys (schema_name, table_name)
with the action predicate and the filter interpreter as residual join filters
— no shuffle of the change stream at all. Filters are evaluated by a pure
higher-order-function expression (filters.py), so the whole pipeline is one
WholeStageCodegen span over the scan.

DELETE changes evaluate filters against old_record (wal2json carries only
`identity` for deletes — reference decoder.ex + migrations/20260626120000:586-634).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_spark.functions.filters import (
    FILTER_STRUCT_DDL,
    FilterValidationError,
    compile_filters_on_record,
    filters_match_expr,
    filters_to_rows,
    parse_filter_string,
)

SUBSCRIPTION_SCHEMA_DDL = (
    "id bigint, subscription_id string, schema_name string, table_name string, "
    "filters array<struct<column_name:string,op:string,value:string,"
    "values:array<string>,negate:boolean,fam:string>>, "
    "claims_role string, action_filter string, selected_columns array<string>, "
    "claims map<string,string>"
)


def subscriptions_df(
    spark: SparkSession,
    specs: Iterable[Mapping],
    type_maps: Mapping[tuple[str, str], Mapping[str, str]] | None = None,
) -> DataFrame:
    """Build the subscription dimension from specs.

    Spec keys: subscription_id, schema ('*' ok), table ('*' ok),
    filters (PostgREST filter string, optional), action ('*'|'INSERT'|...),
    claims_role (default 'authenticated'), selected_columns (list | None).

    `type_maps` maps (schema, table) -> {column: pg typename}; each filter's
    comparison family is resolved here against it. Filter strings are
    parsed+validated+canonical-sorted here too — together the analog of the
    reference's `subscription_check_filters` trigger (P4), which type-checks
    filters against the catalog at subscription insert. Wildcard ('*')
    subscriptions resolve against the union of all known relations.
    """
    type_maps = dict(type_maps or {})
    from realtime_spark.functions.casts import pg_type_family

    merged: dict[str, str] = {}
    _fams: dict[str, str] = {}
    ambiguous: set[str] = set()  # same column name, conflicting type FAMILIES
    for m in type_maps.values():
        for col, t in m.items():
            fam = pg_type_family(t)
            # compare comparison families, not raw names: int4 vs bigint
            # both compare as 'long' and are NOT ambiguous
            if col in _fams and _fams[col] != fam:
                ambiguous.add(col)
            _fams[col] = fam
            merged[col] = t
    rows = []
    for i, s in enumerate(specs):
        filters = parse_filter_string(s.get("filters"))
        schema = s.get("schema", "public")
        table = s.get("table", "*")
        types = type_maps.get((schema, table), merged if "*" in (schema, table) else {})
        if "*" in (schema, table) and filters:
            # a wildcard filter on a column whose type differs across
            # relations has no single comparison family — last-wins would
            # silently compare numbers as strings on some tables; reject it
            # like the reference's subscription_check_filters type check
            bad = [f.column_name for f in filters if f.column_name in ambiguous]
            if bad:
                raise FilterValidationError(
                    f"wildcard filter column(s) {bad} have conflicting types "
                    "across relations; subscribe per table instead"
                )
        rows.append(
            {
                "id": int(s.get("id", i + 1)),
                "subscription_id": s["subscription_id"],
                "schema_name": schema,
                "table_name": table,
                "filters": filters_to_rows(filters, types) if filters else None,
                "claims_role": s.get("claims_role", "authenticated"),
                "action_filter": s.get("action", "*"),
                "selected_columns": s.get("selected_columns"),
                # session claims (jwt payload) for claims-parameterized RLS
                # (set_config('request.jwt.claims') analog, P7)
                "claims": {
                    str(k): str(v) for k, v in (s.get("claims") or {}).items()
                },
            }
        )
    df = spark.createDataFrame(rows, schema=SUBSCRIPTION_SCHEMA_DDL)
    # stash the local rows so the compile strategy (matched_pairs) reads the
    # dim without a Spark job; any DataFrame surgery drops the attribute and
    # the strategy falls back to a real collect
    df._rs_spec_rows = rows
    return df


def upsert_subscriptions(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """S4: INSERT .. ON CONFLICT DO UPDATE on the subscription dimension.

    The reference upserts into `realtime.subscription` with a unique index on
    (subscription_id, entity, filters, action, coalesce(selected_columns,'{}'))
    (reference: lib/extensions/postgres_cdc_rls/subscriptions.ex:60-137;
     unique index migrations/20211116024918:41-45). Relationally: incoming
    rows win on key collision; canonical filter sort (done at parse time)
    makes the key comparison representation-stable. On a Delta table this is
    a MERGE; on the in-memory dim it is an anti-join + union.
    """
    key = [
        "subscription_id",
        "schema_name",
        "table_name",
        F.to_json(F.coalesce(F.col("filters"), F.array().cast(FILTER_STRUCT_DDL))),
        "action_filter",
        F.coalesce(F.col("selected_columns"), F.array().cast("array<string>")),
    ]
    # key via to_json(struct(...)): unambiguous field boundaries — a plain
    # concat_ws separator both flattens arrays and skips NULLs, so
    # selected_columns ['a','b'] vs ['a|b'] (or a '|' inside an id) would
    # collide and the anti-join would drop an unrelated subscription
    keyed = lambda df: df.withColumn("_k", F.md5(F.to_json(F.struct(*[  # noqa: E731
        (c if isinstance(c, Column) else F.col(c)).alias(f"k{i}")
        for i, c in enumerate(key)
    ]), {"ignoreNullFields": "false"})))
    ex = keyed(existing)
    inc = keyed(incoming)
    kept = ex.join(inc.select("_k"), "_k", "left_anti")
    return kept.unionByName(inc).drop("_k")


def delete_subscriptions(existing: DataFrame, subscription_ids) -> DataFrame:
    """S4 counterpart: unsubscribe. The reference deletes the subscriber's
    rows from `realtime.subscription` on channel leave / socket close
    (reference: lib/extensions/postgres_cdc_rls/subscriptions.ex:139-206 —
    delete_by_subscription_ids / delete_all). On the dim frame this is a
    filter; on a Delta table a DELETE WHERE subscription_id IN (...)."""
    ids = list(subscription_ids)
    return existing.filter(~F.col("subscription_id").isin(ids))


def expand_wildcards(
    subs: DataFrame, publication_tables: Sequence[tuple[str, str]]
) -> DataFrame:
    """J7: expand '*' schema/table against the publication at load time so the
    hot join stays a pure equi-join (the reference does the same expansion with
    a LIKE lateral join at subscription insert: subscriptions.ex:61-74)."""
    spark = subs.sparkSession
    local = getattr(subs, "_rs_spec_rows", None)
    if local is not None:
        expanded = [
            {**r, "schema_name": ps, "table_name": pt}
            for r in local
            for ps, pt in publication_tables
            if r["schema_name"] in ("*", ps) and r["table_name"] in ("*", pt)
        ]
        df = spark.createDataFrame(expanded, schema=subs.schema)
        df._rs_spec_rows = expanded
        return df
    pub = spark.createDataFrame(
        list(publication_tables), schema="pub_schema string, pub_table string"
    )
    matched = subs.join(
        F.broadcast(pub),
        ((subs.schema_name == "*") | (subs.schema_name == pub.pub_schema))
        & ((subs.table_name == "*") | (subs.table_name == pub.pub_table)),
        "inner",
    )
    return matched.drop("schema_name", "table_name").withColumnsRenamed(
        {"pub_schema": "schema_name", "pub_table": "table_name"}
    )


# Above this many subscription rows, matched_pairs/match_changes fall back to
# the broadcast-join + runtime-interpreter plan instead of plan-compiling every
# predicate (expression-tree size, and with that many distinct filter sets the
# dim genuinely is data). At 100 TB the compiled path is the one that matters:
# real deployments have few DISTINCT (entity, action, filters) signatures even
# with millions of subscribers — the reference exploits the same grouping
# (migrations/20260626120000:413-417 per-role / per-selected_columns loops).
COMPILE_MAX_SUBS = 128


def _collect_small_dim(subs: DataFrame):
    """Collect the subscription dim if it is compile-sized, else None.
    Dims built by subscriptions_df carry their rows locally (zero jobs)."""
    local = getattr(subs, "_rs_spec_rows", None)
    if local is not None:
        return local if len(local) <= COMPILE_MAX_SUBS else None
    rows = subs.limit(COMPILE_MAX_SUBS + 1).collect()
    if len(rows) > COMPILE_MAX_SUBS:
        return None
    return rows


def _compile_frame(changes: DataFrame):
    """Resolve the frame the compiled predicates run on.

    A change frame carrying the typed-source contract (`_rs_typed_source`,
    set by relational derivations like testdata.changes_from_orders) yields
    (base_df, change_exprs, typed_record_cols): predicates read typed scan
    columns (parquet pushdown) and the record maps are only built for rows
    that matched. Any other frame evaluates on its own columns via the
    record map."""
    typed = getattr(changes, "_rs_typed_source", None)
    if typed is not None:
        base, change_exprs, typed_cols = typed
        # dtype of each typed expression (schema analysis only, no job):
        # native-typed columns compile to cast-free, scan-pushable predicates
        typed_dtypes = dict(
            base.select([c.alias(n) for n, c in typed_cols.items()]).dtypes
        )
        return base, dict(change_exprs), dict(typed_cols), typed_dtypes
    return changes, {n: F.col(n) for n in changes.columns}, None, None


def _named_struct(cols: Mapping[str, Column]) -> Column:
    """Struct with explicitly-named fields (alias-on-expression inside
    F.struct proved fragile for complex expressions)."""
    parts: list[Column] = []
    for n, c in cols.items():
        parts.append(F.lit(n))
        parts.append(c)
    return F.named_struct(*parts)


def _any_pred(preds) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _lit_str(col: Column) -> str | None:
    """The string value of a plan-time Literal column, else None. Lets the
    compiled match constant-fold literal-vs-literal entity clauses in Python
    (a change feed built with F.lit(schema)/F.lit(table)/literal action)
    instead of emitting Spark's 'trivially true equals predicate' warning
    for every subscription."""
    try:
        node = col._jc.node()  # Spark 4 ColumnNode
        if node.getClass().getSimpleName() == "Literal":
            v = node.value()
            return None if v is None else str(v)
    except Exception:
        return None
    return None


def _sub_pred(r, cols, typed_cols=None, typed_dtypes=None) -> Column:
    """Plan-time predicate for one collected subscription row: entity equality
    + action filter + compiled filter conjunction over the action-appropriate
    record (DELETE evaluates old_record — wal2json delete identity). With
    `typed_cols` the action pick is the SOURCE's job: typed change scans
    must project the delete identity into the typed columns for DELETE rows
    (see compile_filter_on_record's contract note).

    `cols` maps change-column name -> Column (over whatever frame the
    predicate runs on); `typed_cols` optionally maps record keys to typed
    base columns (see compile_filter_on_record)."""
    target = F.when(cols["action"] == "DELETE", cols["old_record"]).otherwise(
        cols["record"]
    )
    wanted = [("schema_name", r["schema_name"]), ("table_name", r["table_name"])]
    if r["action_filter"] != "*":
        wanted.append(("action", r["action_filter"]))
    clauses: list[Column] = []
    for cname, val in wanted:
        lv = _lit_str(cols[cname])
        if lv is not None:
            if lv != val:
                return F.lit(False)  # entity can never match: fold whole pred
            # equal literals: clause is constant-true, skip it
        else:
            clauses.append(cols[cname] == F.lit(val))
    pred = compile_filters_on_record(r["filters"], target, typed_cols, typed_dtypes)
    for c in reversed(clauses):
        pred = c & pred
    return pred


def _sub_struct_lit(r) -> Column:
    """Collected subscription row -> struct literal (schema parity with the
    subscription dim; `filters` is typed-NULL — consumed at match time only)."""
    sel = r["selected_columns"]
    return F.struct(
        F.lit(r["id"]).cast("bigint").alias("id"),
        F.lit(r["subscription_id"]).alias("subscription_id"),
        F.lit(r["schema_name"]).alias("schema_name"),
        F.lit(r["table_name"]).alias("table_name"),
        F.lit(None).cast(FILTER_STRUCT_DDL).alias("filters"),
        F.lit(r["claims_role"]).alias("claims_role"),
        F.lit(r["action_filter"]).alias("action_filter"),
        (
            F.array(*[F.lit(x) for x in sel])
            if sel is not None
            else F.lit(None).cast("array<string>")
        ).alias("selected_columns"),
        (
            F.create_map(
                *[F.lit(x) for kv in sorted(r["claims"].items()) for x in kv]
            )
            if r["claims"]
            else F.lit(None).cast("map<string,string>")
        ).alias("claims"),
    )


def _joined_pairs(changes: DataFrame, subs: DataFrame) -> DataFrame:
    """Interpreter plan: broadcast join with the generic JVM filter interpreter
    as residual condition (used when the dim exceeds COMPILE_MAX_SUBS)."""
    s = F.broadcast(subs).alias("s")
    c = changes.alias("c")
    filter_target = F.when(
        F.col("c.action") == "DELETE", F.col("c.old_record")
    ).otherwise(F.col("c.record"))
    cond = (
        (F.col("s.schema_name") == F.col("c.schema_name"))
        & (F.col("s.table_name") == F.col("c.table_name"))
        & ((F.col("s.action_filter") == "*") | (F.col("s.action_filter") == F.col("c.action")))
        & filters_match_expr(F.col("s.filters"), filter_target)
    )
    return c.join(s, cond, "inner")


def matched_pairs(changes: DataFrame, subs: DataFrame, strategy: str = "auto") -> DataFrame:
    """One row per (change, visible subscription): the pre-aggregation form.

    Default plan (small dim, the realistic case): the subscriptions are
    **compiled into the plan** — one codegen'd predicate per subscription, the
    matching subs collected per change with `array_compact` and exploded. The
    change stream is scanned exactly once with ZERO shuffle and no join at
    all; Catalyst constant-folds the entity equality per subscription.

    Fallback plan (`strategy="join"` or dim > COMPILE_MAX_SUBS): broadcast
    hash join on (schema_name, table_name) with the runtime filter
    interpreter as residual condition.

    Both plans expose change fields as `c.*` and subscription fields as
    `s.*` (struct columns in the compiled plan, alias qualifiers in the
    joined plan) so downstream operators are agnostic to the strategy.
    """
    rows = _collect_small_dim(subs) if strategy in ("auto", "compile") else None
    if rows is None:
        if strategy == "compile":
            # the caller explicitly asked for the compiled plan (scan
            # pushdown, _rs_match_sets for the zero-shuffle projection);
            # silently handing back the joined plan would swap semantics
            # and plan shape without a trace
            raise ValueError(
                f"strategy='compile' requires <= {COMPILE_MAX_SUBS} "
                "subscriptions; use strategy='auto' to allow the join fallback"
            )
        return _joined_pairs(changes, subs)
    if not rows:
        empty = changes.sparkSession.createDataFrame([], subs.schema)
        return _joined_pairs(changes.limit(0), empty)
    src, cols, typed_cols, typed_dtypes = _compile_frame(changes)
    preds = [_sub_pred(r, cols, typed_cols, typed_dtypes) for r in rows]
    matches = F.array_compact(
        F.array(*[F.when(p, _sub_struct_lit(r)) for p, r in zip(preds, rows)])
    )
    or_pred = _any_pred(preds)
    c_struct = _named_struct(cols).alias("c")
    filtered = src.filter(or_pred)
    pairs = filtered.select(c_struct, F.explode(matches).alias("s"))
    # pre-explode form: each change with its full visible-subscription array in
    # ONE row. projection.project_output groups per (role, selected_columns)
    # within the row from this frame — zero shuffle instead of explode+groupBy.
    pairs._rs_match_sets = filtered.select(c_struct, matches.alias("subs"))
    return pairs


def _match_ids_expr(preds, rows) -> Column:
    """A5 id-set assembly shared by the per-frame and compile-once paths:
    sorted distinct array of the subscription ids whose predicate holds."""
    return F.sort_array(
        F.array_distinct(
            F.array_compact(
                F.array(
                    *[
                        F.when(p, F.lit(r["subscription_id"]))
                        for p, r in zip(preds, rows)
                    ]
                )
            )
        )
    )


class CompiledMatcher:
    """match_changes compiled ONCE into name-bound Column expressions and
    re-applied to any DataFrame with the same columns — the foreachBatch
    fast path.

    Rationale: inside foreachBatch every micro-batch used to rebuild the
    whole compiled match tree through py4j (one roundtrip per Column node —
    hundreds per batch, ~38% of batch wall at bench scale). All of those
    expressions are unresolved name references when the frame is not a
    typed source, so they are batch-agnostic: build them once, and each
    batch costs a single filter+select call. Mirrors the reference's poller
    preparing its statement once per subscription epoch, not per poll
    (replication_poller.ex:240-292).

    Falls back to the per-frame `match_changes` when the dim exceeds
    COMPILE_MAX_SUBS (join plan) or is empty.
    """

    def __init__(self, subs: DataFrame, column_names):
        self._subs = subs
        self._columns = list(column_names)
        rows = _collect_small_dim(subs)
        if rows:
            cols = {n: F.col(n) for n in self._columns}
            preds = [_sub_pred(r, cols) for r in rows]
            self._pred = _any_pred(preds)
            self._select = [cols[n].alias(n) for n in self._columns] + [
                _match_ids_expr(preds, rows).alias("subscription_ids")
            ]
        else:
            self._pred = None
            self._select = None

    def __call__(self, batch_df: DataFrame) -> DataFrame:
        if self._pred is None:
            return match_changes(batch_df, self._subs)
        return batch_df.filter(self._pred).select(*self._select)


def match_changes(changes: DataFrame, subs: DataFrame, strategy: str = "auto") -> DataFrame:
    """Full J1+A5: change rows annotated with the sorted array of visible
    subscription ids (the reference's `wal_rls.subscription_ids`).

    Compiled plan: the id set is assembled per change row inside one codegen
    stage (`array_compact` of per-subscription conditional ids) — no join, no
    groupBy, no shuffle anywhere. This mirrors the reference's single pass
    over each WAL record accumulating visible_role_sub_ids
    (migrations/20260626120000:500-536)."""
    rows = _collect_small_dim(subs) if strategy in ("auto", "compile") else None
    if rows is not None and rows:
        src, cols, typed_cols, typed_dtypes = _compile_frame(changes)
        preds = [_sub_pred(r, cols, typed_cols, typed_dtypes) for r in rows]
        ids = _match_ids_expr(preds, rows)
        # or_pred true <=> the id set is non-empty, so a single scan-pushable
        # filter replaces the post-projection size() check
        return src.filter(_any_pred(preds)).select(
            *[c.alias(n) for n, c in cols.items()], ids.alias("subscription_ids")
        )
    if rows is not None:  # empty dim -> no matches
        return changes.limit(0).withColumn(
            "subscription_ids", F.lit(None).cast("array<string>")
        )
    pairs = _joined_pairs(changes, subs)
    keep = [f for f in changes.columns if f != "change_id"]
    return pairs.groupBy(F.col("c.change_id").alias("change_id")).agg(
        *[F.first(F.col(f"c.{f}")).alias(f) for f in keep],
        F.sort_array(F.collect_set(F.col("s.subscription_id"))).alias("subscription_ids"),
    )
