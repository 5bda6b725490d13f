"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference operators (BASELINE.json north star): exact dedup,
word-shingle n-gram Jaccard, MinHash+LSH, and SimHash — each expressed with
deterministic, oracle-checkable primitives (md5 is the shared hash between
Spark and DuckDB, so every stage can be verified against SQL).

Scale notes (100 TB design):
  - exact dedup: one hash-shuffle on the digest, map-side partial agg first.
  - shingle explode: the shuffle key is the shingle string; frequent shingles
    skew — cap per-shingle fan-out (`max_shingle_freq`) the way production
    near-dup pipelines drop stop-shingles.
  - MinHash: signatures are computed per-row (no shuffle), the LSH band join
    shuffles only (band_key, doc_id) pairs — tiny compared to the corpus; the
    band key is a hash so it distributes uniformly.
  - pair generation joins always produce doc_a < doc_b to halve volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# text normalization + shingling (shared by jaccard/minhash/simhash)
# ---------------------------------------------------------------------------


def tokens_expr(text: Column) -> Column:
    """Lowercased word tokens; keeps [a-z0-9]+ runs. Mirrored in SQL by
    regexp_split_to_array(lower(text), '[^a-z0-9]+')-style splits."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def shingles_expr(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles (space-joined k-grams of tokens)."""
    toks = tokens_expr(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    # guard: Spark sequence(1, 0) descends; short texts get no shingles
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content digest: returns (digest, canonical_id, n_dups,
    ids) for every duplicate group (n_dups > 1). Canonical = min id."""
    g = (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("id")).alias("ids"),
        )
    )
    return g.filter(F.col("n_dups") > 1)


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct text value."""
    w_ids = df.withColumn("_digest", F.md5(F.col(text_col)))
    canon = w_ids.groupBy("_digest").agg(F.min(F.col(id_col)).alias(id_col))
    return w_ids.join(canon, ["_digest", id_col], "left_semi").drop("_digest")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by word-k-shingle Jaccard similarity.

    explode -> self-join on shingle -> count intersections -> |A∪B| =
    |A|+|B|-|A∩B|. Shingles occurring in more than `max_shingle_freq` docs are
    dropped (stop-shingle skew guard; deterministic, mirrored in the oracle).
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_expr(F.col(text_col), k)).alias("shingle"),
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    freq_ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq")).filter(
        F.col("freq") <= max_shingle_freq
    )
    sh_f = sh.join(freq_ok.select("shingle"), "shingle", "left_semi")
    a = sh_f.alias("a")
    b = sh_f.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(text: Column, num_hashes: int = 12, k: int = 3) -> Column:
    """MinHash signature as an array of hex digests: sig[i] = min over
    shingles of md5(i || ':' || shingle). Lexicographic min over a uniform
    hash is a valid min-hash family and is exactly reproducible in SQL."""
    sh = shingles_expr(text, k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    num_hashes/bands rows per band; docs sharing any band digest are
    candidates. Only (band_id, band_key, doc) leaves each row — the corpus
    itself never shuffles. Output: distinct (doc_a, doc_b), doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc"),
        shingles_expr(F.col(text_col), k).alias("sh"),
    ).filter(F.size("sh") > 0).select(
        "doc",
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(
                    F.col("sh"),
                    lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
                )
            ),
        ).alias("sig"),
    )
    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), "|"
                        )
                    ).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_expr(text: Column, bits: int = 16) -> Column:
    """SimHash over word tokens: per-bit majority vote of token hashes.

    Token hash = first 15 hex chars of md5 -> bigint (conv); bit b of the
    simhash is 1 when more tokens have bit b set than unset. 16 bits keeps the
    SQL mirror simple; the Spark path supports up to ~60.
    """
    toks = tokens_expr(text)
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
    )
    def bit_vote(b: int) -> Column:
        ones = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << b)) != 0)
        )
        return F.when(ones * 2 > F.size(hashes), F.lit(1 << b)).otherwise(F.lit(0))

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out + bit_vote(b)
    return out


def simhash_buckets(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """(id, simhash) — hamming-close docs collide on equal simhash for the
    dedup use; banded hamming search would split the hash into chunks."""
    return df.select(
        F.col(id_col).alias("doc"),
        simhash_expr(F.col(text_col), bits).alias("simhash"),
    )
