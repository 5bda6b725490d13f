"""As-of and interval (range) joins — operators the reference lacks but a
training-data/analytics engine needs (the reference's only range predicate
is the replay scan bound, lib/realtime/messages.ex:49-58; everything else
is an equi join, SURVEY §2.3).

Spark has no ASOF JOIN primitive, so `asof_join` composes one from a
union + keyed window scan: tag both inputs, sort within each key by
(ts, tag) and carry the right side's last non-null values forward. This is
the scale-correct shape — ONE shuffle of each input by key, no range
explosion, no per-row subquery — and it streams through whole-stage
codegen. A broadcast-range band join and a bucketed interval self-join
live in plans/temporal.py on top of this module's helpers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``right_ts`` <= ``left_ts`` (strictly < when ``strict``) for
    the same key, NULL when none precedes.

    ``value_cols`` are the right-side columns carried over; they must not
    collide with left-side names (alias beforehand). Duplicate right rows
    per (key, ts) must be pre-deduped by the caller for deterministic
    output (e.g. ``max_by`` per key+ts).

    Implementation: right rows tag 0, left rows tag 1 (strict: left 0,
    right 1 — so equal-ts right rows sort AFTER the left row and are not
    visible to it). One window scan per key ordered by (ts, tag) carries
    ``last(value, ignorenulls=True)`` forward; left rows are then
    filtered back out. Cost: one hash partitioning of each side on the
    key — the same single shuffle a shuffled-hash equi join would pay.
    """
    on = list(on)
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    lt = left.withColumn(_TAG, F.lit(l_tag)).withColumn(_TS, F.col(left_ts))
    # carry the matched right row as ONE struct: per-column ignorenulls
    # fill would (a) let a matched row's legitimately-NULL value fall
    # through to a STALE older row and (b) tear multiple value_cols across
    # different right rows. The struct is non-null whenever a right row
    # exists, so NULL values inside it survive intact. Right rows with a
    # NULL as-of timestamp are undefined predecessors and are dropped
    # (they would sort before everything and leak into every left row).
    rt = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *[F.col(c) for c in on],
            F.col(right_ts).alias(_TS),
            F.struct(*[F.col(c) for c in value_cols]).alias("_vs"),
        )
        .withColumn(_TAG, F.lit(r_tag))
    )
    combined = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.withColumn("_vs", F.last(F.col("_vs"), ignorenulls=True).over(w))
    out = filled.filter(F.col(_TAG) == F.lit(l_tag))
    for c in value_cols:
        out = out.withColumn(c, F.col("_vs")[c])
    return out.drop(_TAG, _TS, "_vs")


def hour_bucket(ts_col) -> "F.Column":
    """Second-truncated hour bucket used by the interval self-join's
    candidate generation (superset-safe: the exact predicate re-filters)."""
    from realtime_spark.functions.timeutil import epoch_seconds

    return F.floor(epoch_seconds(ts_col) / F.lit(3600))
