"""Differential tests for BPE training/segmentation: the Spark operator
must reproduce a direct pure-Python reference implementation exactly."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

from realtime_spark.operators.bpe import (
    END_MARK,
    merge_pair_expr,
    merges_df,
    segment_with_merges,
    symbolize,
    train_bpe,
    word_freqs,
)

TEXTS = [
    "the merge merges merged the merging merger",
    "low lower lowest newer newest wide widest",
    "aaa aaaa aa a banana bandana ban",
    "spark sparks sparse parse part parts partition",
    "the the the lower lower newer banana",
]


def ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                c[w] += 1
    return c


def ref_merge(syms, left, right):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(texts, num_merges):
    wf = {w: (list(w) + [END_MARK], f) for w, f in ref_word_freqs(texts).items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = Counter()
        for syms, f in wf.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max count, ties -> lexicographically smallest pair
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt <= 1:
            break
        merges.append((rank, left, right, cnt))
        wf = {w: (ref_merge(s, left, right), f) for w, (s, f) in wf.items()}
    return merges


def ref_segment(word, merges):
    rank_of = {(l, r): k for (k, l, r, _) in merges}
    syms = list(word) + [END_MARK]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


class TestTrain:
    def test_merges_match_reference(self, docs, spark):
        got = train_bpe(docs, num_merges=10)
        want = ref_train(TEXTS, 10)
        assert got == want

    def test_distributed_path_matches_fast_path(self, docs, spark):
        # r10: train_bpe folds small vocabularies driver-side; force the
        # distributed loop (driver_max_types=0) and pin both paths to the
        # same merge list so the fast path can never drift
        dist = train_bpe(docs, num_merges=10, driver_max_types=0)
        fast = train_bpe(docs, num_merges=10)
        assert dist == fast == ref_train(TEXTS, 10)

    def test_merge_expr_leftmost_nonoverlapping(self, spark):
        df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
        out = df.select(merge_pair_expr(F.col("syms"), "a", "a").alias("m")).head()
        assert out["m"] == ["aa", "a"]

    def test_merge_expr_repeated_runs(self, spark):
        df = spark.createDataFrame([(["a", "a", "a", "a", "b"],)], "syms array<string>")
        out = df.select(merge_pair_expr(F.col("syms"), "a", "a").alias("m")).head()
        assert out["m"] == ["aa", "aa", "b"]


class TestSegment:
    def test_segmentation_matches_reference(self, docs, spark):
        merges = train_bpe(docs, num_merges=8)
        seg = {
            r["doc_id"]: r["bpe_tokens"]
            for r in segment_with_merges(docs, merges).collect()
        }
        for i, t in enumerate(TEXTS):
            want = []
            for w in re.split("[^a-z0-9]+", t.lower()):
                if w:
                    want.extend(ref_segment(w, merges))
            assert seg[i] == want, f"doc {i}"

    def test_token_counts_positive(self, docs):
        merges = train_bpe(docs, num_merges=4)
        out = segment_with_merges(docs, merges)
        assert out.filter(F.col("n_bpe_tokens") <= 0).count() == 0

    def test_merges_df_roundtrip(self, docs, spark):
        merges = train_bpe(docs, num_merges=4)
        mdf = merges_df(spark, merges)
        assert mdf.count() == len(merges)
