"""Byte-pair-encoding tokenizer training and segmentation on Spark.

Classic BPE (Sennrich, Haddow & Birch 2016, arXiv:1508.07909 — public
method): train on the WORD-TYPE frequency table, not the raw corpus. Each
round counts adjacent symbol pairs weighted by word frequency, merges the
most frequent pair everywhere, and records it; segmentation replays the
merge list in rank order.

This is the "beyond-reference" tokenizer-training operator a training-data
pipeline needs (the engine already counts tokens with a BPE-ish regex;
this LEARNS the merge table from the corpus itself).

Scale shape (100 TB corpus):
  - The corpus collapses to the word-type table in ONE pass
    (`word_freqs`: explode → groupBy(word) with map-side combine). Word
    TYPES grow ~ O(sqrt(corpus)) (Heaps' law), so the iterated state is
    orders of magnitude smaller than the corpus and carries only
    (word, freq, array<symbol>).
  - Each training round is one explode→groupBy pair count (map-side
    combined; the shuffle carries (pair, long) partials), one 1-row argmax
    collect (the merge decision is a scalar, like Lloyd's centroids), and
    one JVM-side fold (`F.aggregate`) applying the merge — no Python in
    the loop. Lineage is truncated with localCheckpoint every few rounds.
  - Segmentation of the full corpus is embarrassingly parallel: the merge
    table (vocab-size rows) broadcasts; an Arrow-batched pandas UDF runs
    the standard rank-greedy merge loop per word with a per-batch memo
    cache (word types repeat heavily, so the cache hit rate is the Heaps
    ratio).

Determinism: pair-count ties break on the lexicographically smallest
(left, right) pair, so training is bit-reproducible on any cluster layout.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_MARK = "</w>"  # end-of-word symbol, per the original BPE formulation

TOKEN_RE = "[^a-z0-9]+"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased alnum token stream — the one
    corpus-wide pass; everything after iterates on word TYPES."""
    toks = df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), TOKEN_RE), lambda t: t != "")
        ).alias("word")
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def symbolize(words: DataFrame) -> DataFrame:
    """Add `syms`: the word split into single-character symbols with the
    end-of-word marker appended (so merges can learn suffixes)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.withColumn("syms", F.concat(chars, F.array(F.lit(END_MARK))))


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts: (left, right, cnt).

    Explode positions 1..len-1; the groupBy is map-side combined so the
    shuffle carries only (pair, partial-count) rows.
    """
    # guard: a fully merged word has ONE symbol, and Spark's sequence(1, 0)
    # counts DOWN — explode an empty array instead for those rows
    pair_arr = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("left"),
                F.element_at("syms", i + 1).alias("right"),
            ),
        ),
    )
    pairs = symbolized.select("freq", F.explode(pair_arr).alias("p"))
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("freq").alias("cnt"))


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Leftmost non-overlapping merge of adjacent (left, right) into
    left||right, as a JVM-side fold (no Python).

    The fold appends each symbol unless the accumulator ends with `left`
    and the current symbol is `right` AND that trailing `left` was not
    itself just produced by this merge (tracked by comparing sizes — a
    freshly merged symbol equals left||right, which can only collide with
    `left` when right == '' which never happens)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast(T.ArrayType(T.StringType())),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    checkpoint_every: int = 4,
    driver_max_types: int = 262_144,
) -> list[tuple[int, str, str, int]]:
    """Learn `num_merges` BPE merges; returns
    [(rank, left, right, pair_count), ...] in learned order.

    Driver work per round is ONE scalar-sized collect (the argmax pair) —
    the same contract as Lloyd's iterations (SCALE.md §5); word-type state
    stays distributed throughout.

    Small-vocabulary fast path (r10, guide section 1.2: fix the
    distributed algorithm before per-task work): below `driver_max_types`
    word TYPES the iterated state is a dim-sized table (a few MB of
    (word, freq) pairs — the same bounded-collect contract as centroids /
    the union-find fast path in duplicate_clusters), and the distributed
    loop is pure job-scheduling overhead: num_merges rounds of
    explode+agg+argmax jobs cost ~0.3-1 s each at ANY corpus size to
    relabel a table Python folds in microseconds. The corpus-wide
    word_freqs pass stays distributed; only the merge iteration moves
    driver-side, and it replays the exact pair-count/tie-break/stop
    semantics (pinned against the distributed path by
    tests/test_bpe.py::test_merges_match_reference both ways). Real
    web-scale vocabularies exceed the threshold and take the distributed
    loop unchanged.
    """
    wf = word_freqs(df, text_col)
    # one pass, not count()+collect() (r10 ADVICE): collect at most
    # threshold+1 rows — fewer means we hold the complete type table and
    # take the fast path; one more means large-vocabulary, fall through to
    # the distributed loop with zero extra corpus passes paid up front
    probe_rows = wf.limit(driver_max_types + 1).collect()
    if len(probe_rows) <= driver_max_types:
        from collections import Counter

        state = [
            (list(r["word"]) + [END_MARK], int(r["freq"]))
            for r in probe_rows
        ]
        merges: list[tuple[int, str, str, int]] = []
        for rank in range(1, num_merges + 1):
            pc: Counter = Counter()
            for syms, f in state:
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += f
            if not pc:
                break
            (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt <= 1:
                break
            merges.append((rank, left, right, int(cnt)))
            def _merge(syms: list[str]) -> list[str]:
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                return out

            state = [(_merge(s), f) for s, f in state]
        return merges
    cur = symbolize(wf).select("freq", "syms")
    cur = cur.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] <= 1:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        cur = cur.withColumn("syms", merge_pair_expr(F.col("syms"), left, right))
        if rank % checkpoint_every == 0:
            # truncate the per-round fold lineage (plan trees, not data)
            cur = cur.localCheckpoint(eager=False)
    return merges


def merges_df(spark, merges: Sequence[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        list(merges), schema="rank int, left string, right string, pair_count bigint"
    )


def _segment_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Standard rank-greedy BPE segmentation of one word (+ END_MARK)."""
    syms = list(word) + [END_MARK]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def segment_with_merges(
    df: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with a learned merge table:
    (id, bpe_tokens array<string>, n_bpe_tokens).

    Arrow-batched `mapInPandas`; the merge table rides into the workers as
    a closure constant (vocab-sized — the same "small dim" contract as a
    broadcast join) and a per-batch word memo exploits word-type reuse.
    """
    rank_of = {(l, r): k for (k, l, r, _) in merges}
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.IntegerType()),
        ]
    )
    import re

    tok_re = re.compile(TOKEN_RE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col].astype(str):
                out: list[str] = []
                for w in tok_re.split(text.lower()):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _segment_word(w, rank_of)
                        memo[w] = got
                    out.extend(got)
                toks_col.append(out)
                n_col.append(len(out))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks_col,
                    "n_bpe_tokens": n_col,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def with_bpe_token_count(
    df: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    out_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Append the BPE segment count of `text_col` to EVERY input column —
    the inline-costing form of segment_with_merges (r9 verdict ask #5:
    plug the real tokenizer into the chat pipeline). Map-only: the merge
    table rides into the workers as a closure constant (vocab-sized — the
    broadcast-dim contract) and no join is needed to get the cost next to
    the rest of the row, so a downstream window/aggregate still pays only
    its own single exchange.

    `out_cols` limits which input columns the Python worker RETURNS (the
    count is always appended). mapInPandas is opaque to Catalyst, so a
    downstream .select cannot prune what crosses the boundary — a caller
    that only needs the count plus a few small columns names them here and
    the document text crosses into Python once and never back out."""
    rank_of = {(l, r): k for (k, l, r, _) in merges}
    import re

    tok_re = re.compile(TOKEN_RE)
    if out_cols is not None:
        keep = list(out_cols)
        # text must still ride INTO the worker; prune everything else
        df = df.select(*dict.fromkeys([*keep, text_col]))
        fields = [df.schema[c] for c in keep]
    else:
        keep = None
        fields = list(df.schema.fields)
    out_schema = T.StructType(fields + [T.StructField(out_col, T.LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            counts = []
            for text in pdf[text_col].astype(str):
                n = 0
                for w in tok_re.split(text.lower()):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = len(_segment_word(w, rank_of))
                        memo[w] = got
                    n += got
                counts.append(n)
            out = pdf if keep is None else pdf[keep]
            yield out.assign(**{out_col: counts})

    return df.mapInPandas(run, schema=out_schema)


def bpe_vocab(df: DataFrame, merges, text_col: str = "text") -> DataFrame:
    """Final learned vocabulary: (symbol, freq) after applying every merge
    to the word-type table — the tokenizer's unit inventory."""
    cur = symbolize(word_freqs(df, text_col))
    for i, (_, left, right, _) in enumerate(merges, start=1):
        cur = cur.withColumn("syms", merge_pair_expr(F.col("syms"), left, right))
        if i % 4 == 0:
            # same lineage truncation as train_bpe: each merge nests its
            # aggregate-lambda inside the previous round's column, and a
            # realistic merge table would otherwise blow up Catalyst
            # analysis (or the driver stack)
            cur = cur.localCheckpoint(eager=False)
    return (
        cur.select("freq", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("freq"))
    )
