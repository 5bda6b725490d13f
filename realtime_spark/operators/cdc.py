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
    filters_match_expr,
    filters_to_rows,
    parse_filter_string,
)

SUBSCRIPTION_SCHEMA_DDL = (
    "id bigint, subscription_id string, schema_name string, table_name string, "
    "filters array<struct<column_name:string,op:string,value:string,"
    "values:array<string>,negate:boolean,fam:string>>, "
    "claims_role string, action_filter string, selected_columns array<string>"
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
    merged: dict[str, str] = {}
    for m in type_maps.values():
        merged.update(m)
    rows = []
    for i, s in enumerate(specs):
        filters = parse_filter_string(s.get("filters"))
        schema = s.get("schema", "public")
        table = s.get("table", "*")
        types = type_maps.get((schema, table), merged if "*" in (schema, table) else {})
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
            }
        )
    return spark.createDataFrame(rows, schema=SUBSCRIPTION_SCHEMA_DDL)


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
    keyed = lambda df: df.withColumn("_k", F.md5(F.concat_ws("|", *[  # noqa: E731
        c if isinstance(c, Column) else F.col(c) for c in key
    ])))
    ex = keyed(existing)
    inc = keyed(incoming)
    kept = ex.join(inc.select("_k"), "_k", "left_anti")
    return kept.unionByName(inc).drop("_k")


def expand_wildcards(
    subs: DataFrame, publication_tables: Sequence[tuple[str, str]]
) -> DataFrame:
    """J7: expand '*' schema/table against the publication at load time so the
    hot join stays a pure equi-join (the reference does the same expansion with
    a LIKE lateral join at subscription insert: subscriptions.ex:61-74)."""
    spark = subs.sparkSession
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


def matched_pairs(changes: DataFrame, subs: DataFrame) -> DataFrame:
    """One row per (change, visible subscription): the pre-aggregation form.

    Join is broadcast-hash on (schema_name, table_name); action filter and the
    filter interpreter ride along as residual conditions evaluated inside the
    join, so non-matching rows never materialize.
    """
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


def match_changes(changes: DataFrame, subs: DataFrame) -> DataFrame:
    """Full J1+A5: change rows annotated with the sorted array of visible
    subscription ids (the reference's `wal_rls.subscription_ids`)."""
    pairs = matched_pairs(changes, subs)
    keep = [f for f in changes.columns if f != "change_id"]
    return pairs.groupBy(F.col("c.change_id").alias("change_id")).agg(
        *[F.first(F.col(f"c.{f}")).alias(f) for f in keep],
        F.sort_array(F.collect_set(F.col("s.subscription_id"))).alias("subscription_ids"),
    )
