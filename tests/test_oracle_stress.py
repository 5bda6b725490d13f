"""Replay the entire oracle matrix against the adversarial stress corpus
(tests/stress_corpus.py): apostrophes/unicode/empty text, boundary-equality
prices, timestamp ties, zero/duplicate vectors.

The standard oracle gate (test_oracle.py) proves Spark == DuckDB on the
driver's bland synthetic fixture; a self-consistent pair of queries can
still disagree on content the fixture never contains (the apostrophe
tokenization bug survived three green rounds that way). This suite makes
the data hostile while keeping every schema/enum/key contract intact, so
any failure here is a genuine convention divergence, not a contract breach.

Gated behind SPARK_GRAFT_STRESS_TEST=1 by default purely for suite runtime
(it duplicates the full 261-query matrix); run it every round.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import compare, duckdb_con
from tests.stress_corpus import build_stress_dir

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS_TEST") != "1",
    reason="set SPARK_GRAFT_STRESS_TEST=1 to replay the oracle matrix "
    "on the adversarial corpus",
)

STRESS_DIR = "/tmp/spark_graft_stress_sf"


@pytest.fixture(scope="module")
def stress_dir():
    return build_stress_dir(STRESS_DIR)


@pytest.fixture(scope="module")
def con(stress_dir):
    c = duckdb_con(stress_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_on_stress(spark, con, stress_dir, name):
    df = QUERIES[name](spark, stress_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only: must at least survive the data
        return
    compare(df, con, ORACLES[name], name)
