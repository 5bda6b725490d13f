"""Deterministic probabilistic sketches: count-min and Bloom membership.

At 100 TB, exact per-key counting and exact membership pre-filters are
sometimes the dominant shuffle (e.g. token frequencies for LM scoring,
"have we already ingested this digest" checks before dedup). Sketches cap
that cost: a count-min sketch is depth x width counters regardless of key
cardinality; a Bloom filter is m bits regardless of set size. Both are
usually unverifiable against an exact oracle — unless the hash family is
engine-stable. Here every hash is `md5("<i>:" || key)` truncated to 60
bits, which DuckDB reproduces exactly (`('0x' || substr(md5(...),1,15))
::BIGINT`), so the sketch CONTENTS — including every collision and every
false positive — are oracle-checkable, not just the sketch's error bound.

Scale shape:
- build: one explode (depth rows per item) -> map-side-combined groupBy
  over (depth x width) cells; the shuffle carries at most d*w aggregates
  per partition, independent of input size.
- probe: the built sketch is at most d*w (CMS) or m (Bloom positions)
  rows — broadcast; probing is a per-row hash + broadcast lookup, no
  shuffle of the probe stream.
- The Bloom bitset is represented relationally as the set of occupied bit
  positions (<= m rows) rather than packed words: identical semantics and
  FP behavior, and the representation stays joinable/broadcastable.

Reference anchor: the reference has no sketches (SURVEY §2.4 "no
approximate sketches") — this is a beyond-reference family for the
training-data north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_hash(col: Column, seed: Column | int, mod: int) -> Column:
    """60-bit md5-based universal hash, identical in Spark and DuckDB SQL:
    ('0x' || substr(md5(seed || ':' || key), 1, 15))::BIGINT % mod."""
    seed_c = seed if isinstance(seed, Column) else F.lit(str(seed))
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(seed_c.cast("string"), F.lit(":"), col)), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(mod)
    )


def sql_stable_hash(key_sql: str, seed_sql: str, mod: int) -> str:
    """DuckDB mirror of stable_hash (seed/key given as SQL fragments)."""
    return (
        f"('0x' || substr(md5(CAST({seed_sql} AS VARCHAR) || ':' || {key_sql}),"
        f" 1, 15))::BIGINT % {mod}"
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight: Column | None = None,
) -> DataFrame:
    """Build a count-min sketch over `key_col`: (i, bucket, cnt) with
    i < depth, bucket < width, cnt = sum of weights hashing there."""
    cells = df.select(
        F.col(key_col).cast("string").alias("_k"),
        (F.lit(1).cast("bigint") if weight is None else weight.cast("bigint")).alias(
            "_w"
        ),
    ).select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: stable_hash(F.col("_k"), i, width),
            )
        ).alias("i", "bucket"),
        "_w",
    )
    return cells.groupBy("i", "bucket").agg(F.sum("_w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key: min over rows of its bucket counters.
    The sketch (<= depth x width rows) is broadcast; unseen buckets read 0.
    Output: keys + (est bigint)."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: stable_hash(F.col(key_col).cast("string"), i, width),
            )
        ).alias("i", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


# ---------------------------------------------------------------------------
# Bloom filter (relational bitset: occupied positions)
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame, key_col: str, num_hashes: int = 3, num_bits: int = 2048
) -> DataFrame:
    """Occupied bit positions of a Bloom filter over `key_col`
    (<= num_bits rows): (bitpos bigint)."""
    return (
        df.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                    lambda i: stable_hash(F.col(key_col).cast("string"), i, num_bits),
                )
            ).alias("bitpos")
        )
        .distinct()
    )


def bloom_maybe_contains(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_hashes: int = 3,
    num_bits: int = 2048,
) -> DataFrame:
    """Probe: a key is 'maybe present' iff ALL its bit positions are set.
    The position set is broadcast; no shuffle of the probe stream beyond
    the per-key regroup. Output: keys + (maybe_present boolean)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda i: stable_hash(F.col(key_col).cast("string"), i, num_bits),
            )
        ).alias("bitpos"),
    )
    hit = probes.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bitpos", "left"
    )
    return hit.groupBy(key_col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == F.lit(num_hashes)).alias(
            "maybe_present"
        )
    )
