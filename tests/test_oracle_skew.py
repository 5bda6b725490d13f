"""Replay the oracle matrix against the cardinality-skew corpus
(tests/skew_corpus.py): one user with ~30% of events, one event_type with
~40%, one customer with ~30% of orders, one (suppkey, partkey) pair with
~30% of line items, one exact-duplicate text on ~20% of documents, one
IVF cluster holding ~50% of vectors.

The stress corpus makes the CONTENT hostile; this one makes the KEY
DISTRIBUTION hostile — the 100 TB failure mode (skewed shuffle keys, hot
window partitions, one-reducer joins). Correctness must hold bit-for-bit
(both engines read the same parquet) and, as importantly, nothing may
blow up combinatorially on the dominant key: the per-test timeout below
is the wall alarm for quadratic candidate generation or a runaway
recursion seeded by mass duplication.

The FULL replay stays behind SPARK_GRAFT_SKEW_TEST=1; the DEFAULT suite
runs the curated skew-sensitive subset (hot-key windows/sessions/chat,
dedup clustering over the giant duplicate component, LSH banding with an
overfull bucket, IVF-confined similarity with a half-corpus cluster,
fan-out and rate windows over the hot user/topic).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import run_oracle_matrix
from tests.skew_corpus import build_skew_dir

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

_FULL = os.environ.get("SPARK_GRAFT_SKEW_TEST") == "1"

SKEW_DIR = "/tmp/spark_graft_skew_sf"

# the curated default: every family with a per-key window, a per-key
# aggregate whose partition is now dominated by one key, or a join keyed
# on the skewed column
CURATED = [
    # hot-user sessions / chat (giant gap-session, heavy window partition)
    "session_transitions",
    "chat_threads",
    "chat_context_fit",
    "chat_render",
    "chat_pack",
    "chat_bpe_cost",
    "stream_chat_threads",
    "stream_chat_bounded",
    "dpo_pairs",
    # giant duplicate component / overfull LSH bucket
    "dedup_exact_groups",
    "dedup_clusters",
    "split_leakage",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    # hot shared text -> corpus-hot shingles on the per-shingle freq aggs
    "ngram_novelty",
    "ngram_shared_frac",
    # half-corpus IVF cluster
    "semdedup",
    "sem_decontaminate",
    "ann_ivf_topk",
    # hot topic / hot user on the realtime path
    "fastlane_dispatch",
    "presence_diffs",
    "rate_sliding_60s",
    "users_counter",
    "billable_events",
    # hot join keys in the relational core
    "tpch_q9",
    "tpch_q18",
]


@pytest.fixture(scope="module")
def skew_dir():
    return build_skew_dir(SKEW_DIR)


@pytest.fixture(scope="module")
def skew_results(spark, skew_dir):
    # r11: the replay (full or curated subset) runs through the overlapped
    # matrix runner (oracle_utils.run_oracle_matrix); granularity preserved
    names = sorted(QUERIES) if _FULL else [q for q in CURATED if q in QUERIES]
    return run_oracle_matrix(spark, skew_dir, names, QUERIES, ORACLES)


@pytest.mark.skipif(
    not _FULL,
    reason="set SPARK_GRAFT_SKEW_TEST=1 for the full skew replay "
    "(the default suite runs the curated subset below)",
)
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_on_skew(skew_results, name):
    err = skew_results[name]
    if err is not None:
        raise err


@pytest.mark.skipif(
    _FULL, reason="full skew replay active; the subset would be redundant"
)
@pytest.mark.parametrize("name", [q for q in CURATED if q in QUERIES])
def test_query_matches_oracle_on_skew_curated(skew_results, name):
    err = skew_results[name]
    if err is not None:
        raise err


def test_curated_names_still_registered():
    missing = [q for q in CURATED if q not in QUERIES]
    assert not missing, f"curated skew subset names drifted: {missing}"


def test_skew_stats_detects_the_planted_hot_keys(spark, skew_dir):
    """The skew diagnostics (operators/skew.py::skew_stats) must actually
    flag this corpus's planted distribution: the hot user (~30% of events)
    yields a skew factor well above balanced and a salt suggestion > 1 —
    the probe a 100 TB pipeline runs BEFORE choosing salted_join vs AQE."""
    from realtime_spark.operators.skew import skew_stats
    from realtime_spark.sources.testdata import load_table

    e = load_table(spark, skew_dir, "events")
    r = skew_stats(e, ["user_id"]).first()
    n = e.count()
    assert r["max_cnt"] >= 0.25 * n  # the planted ~30% hot user
    # factor = max*n_keys/n_rows: ~0.3 * n_keys — bounded by the base
    # fixture's ~15 users at this SF, so >= 4 is already 4x a balanced
    # reducer; the salt suggestion must fire regardless
    assert r["skew_factor_floor"] >= 4
    assert r["suggested_salt"] > 1

    em = load_table(spark, skew_dir, "embeddings")
    # half the corpus in one IVF cluster: assign to the vec_id%50 lattice
    # and probe the centroid_id key the similarity joins shuffle on
    from pyspark.sql import functions as F

    from realtime_spark.operators.similarity import ivf_assign

    cents = em.filter(F.col("vec_id") % 50 == 0)
    asg = ivf_assign(em, cents, "vec_id", "embedding")
    c = skew_stats(asg, ["centroid_id"]).first()
    assert c["max_cnt"] >= 0.4 * em.count()  # the planted half-corpus ball
    assert c["suggested_salt"] > 1
