"""Markov-chain modeling of per-user event sequences.

Behavioral transition analysis over the event stream: the empirical
event-type transition matrix (who goes from `view` to `purchase`), and its
stationary distribution by exact-integer power iteration — the long-run
share of each event type implied by observed behavior. Standard
session-modeling tools for product analytics and for behavioral-cloning /
user-simulation training data.

Determinism contract: transition counts are exact integers; the stationary
iteration uses micro-unit integer arithmetic with floor division (same
scheme as graph.pagerank), so every round is bit-exact and the DuckDB
oracle replays it with unrolled CTEs.

Scale notes (100 TB):
- transitions: one window (lead) per user partition — the shuffle is keyed
  by user, and the window state per key is one row. Output collapses to
  |types|^2 rows via a map-side-combined count.
- stationary: the chain state is |types| rows; each iteration is a
  broadcast-join against the (tiny) transition matrix — zero large-side
  shuffles, driver loop with no per-row collects.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Empirical transition matrix of consecutive events per user:
    (from_type, to_type, cnt, p) where p = cnt / out-count of from_type,
    quantized. Ordering ties break on `tiebreak_col` for engine stability.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col, 1).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_from = Window.partitionBy("from_type")
    scale = float(10**round_digits)
    p = F.col("cnt").cast("double") / F.sum("cnt").over(w_from).cast("double")
    return pairs.select(
        "from_type",
        "to_type",
        "cnt",
        (F.floor(p * scale + F.lit(0.5)) / F.lit(scale)).alias("p"),
    )


def stationary_distribution(
    trans: DataFrame, iterations: int = 6
) -> DataFrame:
    """Stationary distribution of the transition matrix by power iteration
    in exact integer micro-units.

    x_0(s) = MICRO for every state;
    x_{i+1}(t) = Σ_s floor(x_i(s) * cnt(s,t) / out(s))
    — all bigint floor division, so each round is exactly reproducible and
    an unrolled-CTE SQL oracle can replay it. States with no outgoing
    transitions keep their mass (identity row). Output: (state, mass_micro).
    """
    t = trans.select(
        F.col("from_type").alias("s"), F.col("to_type").alias("t"), "cnt"
    ).persist()
    out = t.groupBy("s").agg(F.sum("cnt").alias("outc"))
    tm = t.join(out, "s").persist()
    states = (
        t.select(F.col("s").alias("state"))
        .unionByName(t.select(F.col("t").alias("state")))
        .distinct()
        .persist()
    )
    x = states.withColumn("mass", F.lit(MICRO).cast("bigint"))
    sinks = states.join(
        tm.select(F.col("s").alias("state")).distinct(), "state", "left_anti"
    )
    for _ in range(iterations):
        flows = (
            tm.join(x, tm["s"] == x["state"])
            .select(
                F.col("t").alias("state"),
                # DECIMAL(38,0) intermediate: mass*cnt exceeds int64 once
                # per-edge counts reach corpus scale (ANSI would throw,
                # non-ANSI silently wraps negative)
                F.expr(
                    "CAST((CAST(mass AS DECIMAL(38,0)) * cnt) DIV outc AS BIGINT)"
                ).alias("m"),
            )
            .groupBy("state")
            .agg(F.sum("m").alias("mass"))
        )
        kept = sinks.join(x, "state").select("state", "mass")
        contrib = (
            flows.unionByName(kept)
            .groupBy("state")
            .agg(F.sum("mass").cast("bigint").alias("mass"))
        )
        # left join back to the full state set: a state receiving no mass
        # this round stays at 0 instead of disappearing from the frame
        x = (
            states.join(contrib, "state", "left")
            .select(
                "state",
                F.coalesce(F.col("mass"), F.lit(0)).cast("bigint").alias("mass"),
            )
            # eager: materializes the round (so the tm/states caches are
            # actually populated and reused) and truncates lineage
            .localCheckpoint()
        )
    out = x.select("state", F.col("mass").alias("mass_micro"))
    t.unpersist()
    tm.unpersist()
    states.unpersist()
    return out
