"""Run every __spark_entry__ query against its duckdb oracle at small SF —
the local replica of the driver's t2 correctness gate.

Since r11 the whole matrix is computed ONCE by a module fixture that
overlaps the independent comparisons in a small thread pool
(oracle_utils.run_oracle_matrix — guide section 2.6 applied to the
harness: the serial one-test-per-query form left the box mostly idle and
had outgrown the driver's pytest budget, VERIFY_r10 tests_ok:false). The
parametrized tests keep per-query granularity: each asserts its own
precomputed result and re-raises the original comparison failure."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import run_oracle_matrix

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_results(spark):
    return run_oracle_matrix(
        spark, SF_DIR_ORACLE, sorted(QUERIES), QUERIES, ORACLES
    )


def test_every_query_has_oracle_or_is_declared():
    missing = [k for k in ORACLES if k not in QUERIES]
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(oracle_results, name):
    err = oracle_results[name]
    if err is not None:
        raise err


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
