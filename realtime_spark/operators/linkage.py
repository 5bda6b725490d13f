"""Probabilistic record linkage (entity resolution): multi-pass blocking +
Fellegi-Sunter-style field-agreement scoring (Fellegi & Sunter 1969; the
Splink/dedupe.io production shape).

All-pairs comparison is quadratic and impossible at scale; linkage runs as

  1. BLOCKING: candidate pairs = union of several cheap equi-join passes
     (each pass an equi join on one blocking key — survives one field being
     dirty as long as ANY pass agrees);
  2. SCORING: per-field agreement weights summed into a match score —
     integer milli-ban weights (scaled log-likelihood ratios), so scores
     are exact and the DuckDB oracle replays them;
  3. RESOLUTION: best candidate per left record (max score, min right id),
     thresholded.

Scale shape: each blocking pass is one equi-join whose key distributes
(skewed blocks are the known hazard — cap block sizes like stop-shingles if
a key collapses); scoring is a projection over candidate pairs; resolution
is one max_by groupBy keyed by the left id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    blocking_keys: Sequence[tuple[Column, Column]],
    left_id: str = "l_id",
    right_id: str = "r_id",
) -> DataFrame:
    """Union of equi-join passes; output distinct (left row ⨯ right row)
    candidate pairs with all left_/right_ prefixed columns."""
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    out = None
    for lk, rk in blocking_keys:
        cand = l.join(r, lk.eqNullSafe(rk))
        out = cand if out is None else out.unionByName(cand)
    return out.dropDuplicates([left_id, right_id])


def score_pairs(
    cands: DataFrame,
    comparisons: Sequence[tuple[Column, int, int]],
) -> DataFrame:
    """Fellegi-Sunter match score: for each (agree_predicate, w_agree,
    w_disagree) comparison, add the agreement or disagreement weight
    (integer milli-bans: 1000 * log-likelihood-ratio, pre-scaled by the
    caller). NULL-involved comparisons contribute 0 (the standard
    'missing is uninformative' convention)."""
    score = F.lit(0)
    for pred, w_a, w_d in comparisons:
        score = score + F.when(pred.isNull(), 0).otherwise(
            F.when(pred, F.lit(w_a)).otherwise(F.lit(w_d))
        )
    return cands.withColumn("match_score", score.cast("bigint"))


def resolve_best(
    scored: DataFrame,
    left_id: str,
    right_id: str,
    threshold: int,
) -> DataFrame:
    """One row per left record: its best-scoring candidate (ties -> lowest
    right id) and whether it clears the match threshold."""
    best = scored.groupBy(left_id).agg(
        F.max_by(
            F.struct(
                F.col(right_id).alias("rid"),
                F.col("match_score").alias("s"),
            ),
            F.struct(F.col("match_score"), -F.col(right_id)),
        ).alias("b"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return best.select(
        left_id,
        F.col("b.rid").alias(right_id),
        F.col("b.s").alias("match_score"),
        "n_candidates",
        (F.col("b.s") >= threshold).alias("matched"),
    )
