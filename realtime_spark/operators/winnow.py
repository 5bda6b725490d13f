"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
algorithm): k-gram hashes, one selected minimum per sliding window of w
consecutive grams, fingerprint set = distinct selected hashes.

Why alongside MinHash: winnowing gives a POSITIONAL guarantee — any shared
substring of length >= w + k - 1 tokens contributes at least one common
fingerprint — so it detects contiguous plagiarized/pasted spans that
bag-of-shingles MinHash can dilute away in long documents. Fingerprint
density is ~2/(w+1) of gram count, a tunable corpus-size reduction.

Determinism: gram hash is the engine-stable 60-bit md5 digest (DuckDB
reproduces it bit-for-bit, see operators/sketches.py); within a window the
minimum hash is selected with leftmost-position tie-break (the original
paper picks rightmost — leftmost is the variant whose SQL mirror is
`list_position` of the min, which returns the FIRST occurrence).

Scale shape: gram hashing + window minima are per-row array expressions
(O(n*w) per doc, no shuffle); the fingerprint frame shuffles (doc, 8-byte
hash) pairs only. Pair generation is the same digest-join pattern as
n-gram Jaccard, with the same hot-fingerprint frequency cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_spark.operators.dedup import spread_by, tokens_expr


def _gram_hashes(text: Column, k: int) -> Column:
    """60-bit md5 hash per word k-gram, in position order."""
    toks = tokens_expr(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 15),
            16,
            10,
        ).cast("bigint"),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<bigint>"))


def winnow_expr(text: Column, k: int = 3, w: int = 4) -> Column:
    """Distinct winnowed fingerprint hashes of `text` (array<bigint>).
    Documents with at least k tokens but shorter than one full window
    contribute their single overall minimum (one clamped window); documents
    with FEWER than k tokens produce no k-grams and therefore no
    fingerprints at all — they are invisible to winnow_pairs."""
    grams = _gram_hashes(text, k)
    n = F.size(grams)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(grams, i, w)),
    )
    return F.when(n > 0, F.array_distinct(mins)).otherwise(
        F.array().cast("array<bigint>")
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """(doc, fp): distinct winnowed fingerprints per document."""
    return spread_by(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(winnow_expr(F.col(text_col), k, w)).alias("fp"),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    threshold: float = 0.5,
    max_fp_freq: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs by winnowed-fingerprint Jaccard overlap.
    Output: (doc_a, doc_b, n_shared, overlap) with doc_a < doc_b and
    overlap = |∩| / |∪| >= threshold. Fingerprints hotter than
    `max_fp_freq` docs are dropped (boilerplate-span skew guard)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w).persist()
    sizes = fps.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
    freq_ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") <= max_fp_freq)
    )
    f = fps.join(freq_ok.select("fp"), "fp", "left_semi")
    a = f.alias("a")
    b = f.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_fp").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "overlap",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("overlap") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "overlap")
    )
