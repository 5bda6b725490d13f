"""Bucket-digest corpus diff: find what changed between two corpus snapshots
by exchanging per-bucket digests first and touching rows only in buckets
that differ — the Merkle-tree/anti-entropy pattern (Dynamo replica sync,
Cassandra repair), flattened to one level for a relational engine.

Why at 100 TB: a naive snapshot diff is a full-outer join of two corpora —
both sides shuffle every row. Here each side folds to `buckets` digest rows
(map-side-combined XOR/count aggregates, nothing else crosses the wire),
the digest frames join broadcast-size, and only the buckets that disagree
are re-read for the row-level drill-down. Unchanged data — the vast
majority between daily snapshots — is never shuffled, and with the bucket
key derived from the id hash the second pass is a scan filter.

The digest is bit_xor over the engine-stable 60-bit md5 of (id, content)
plus a row count: XOR is order/partition-independent and mergeable, count
catches the xor-collision of identical multisets of different size. DuckDB
reproduces both exactly, so the whole operator is oracle-checkable.

Reference anchor: the reference has no snapshot diff (its sync primitive is
Phoenix presence CRDT deltas); this is the batch-corpus analog for the
training-data north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_spark.operators.sampling import hash_bucket

_DIFF_BUCKETS = 256


def bucket_digests(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = _DIFF_BUCKETS,
) -> DataFrame:
    """Per-bucket digest of a corpus: (bucket, xor_digest, n_rows).
    Bucket = stable hash of the id; digest = bit_xor of the 60-bit md5 of
    'id:content'. One map-side-combined groupBy over <= `buckets` keys."""
    # NULL text must still contribute to the bucket digest (concat would
    # null the whole hash and bit_xor would skip the row, hiding
    # NULL<->value transitions); the sentinel cannot collide with real
    # text's md5 input because ':' separates the non-null id prefix
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.coalesce(F.col(text_col), F.lit("\x00null")),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
    )
    return (
        df.select(hash_bucket(F.col(id_col), buckets).alias("bucket"), h.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.bit_xor("_h").alias("xor_digest"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def changed_buckets(
    a: DataFrame, b: DataFrame, id_col: str, text_col: str,
    buckets: int = _DIFF_BUCKETS,
) -> DataFrame:
    """Buckets whose digests disagree between snapshots a and b (1-column
    frame, <= `buckets` rows — broadcastable by construction)."""
    da = bucket_digests(a, id_col, text_col, buckets)
    db = bucket_digests(b, id_col, text_col, buckets)
    j = da.alias("a").join(db.alias("b"), "bucket", "full_outer")
    differs = (
        ~F.col("a.xor_digest").eqNullSafe(F.col("b.xor_digest"))
    ) | (~F.col("a.n_rows").eqNullSafe(F.col("b.n_rows")))
    return j.filter(differs).select("bucket")


def corpus_changed_docs(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = _DIFF_BUCKETS,
) -> DataFrame:
    """Row-level diff restricted to changed buckets: (id, status) with
    status in {'added', 'removed', 'changed'} ('added' = only in b).
    Ids must be non-null keys (a NULL id cannot equi-join in the naive
    diff either); NULL text is a first-class value — NULL<->value
    transitions report 'changed'. The restriction is lossless — any differing row flips its bucket's
    digest — so the result equals the naive full-outer diff while reading
    and shuffling only the changed slice."""
    cb = F.broadcast(changed_buckets(a, b, id_col, text_col, buckets))

    def slim(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("bucket", hash_bucket(F.col(id_col), buckets))
            .join(cb, "bucket", "left_semi")
            .select(
                F.col(id_col).alias("id"),
                F.coalesce(F.md5(F.col(text_col)), F.lit("_null_")).alias("dg"),
            )
        )

    sa, sb = slim(a), slim(b)
    j = sa.alias("a").join(sb.alias("b"), F.col("a.id") == F.col("b.id"), "full_outer")
    status = (
        F.when(F.col("a.id").isNull(), F.lit("added"))
        .when(F.col("b.id").isNull(), F.lit("removed"))
        .when(~F.col("a.dg").eqNullSafe(F.col("b.dg")), F.lit("changed"))
    )
    return (
        j.select(F.coalesce(F.col("a.id"), F.col("b.id")).alias("id"), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
