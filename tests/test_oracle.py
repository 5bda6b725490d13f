"""Run every __spark_entry__ query against its duckdb oracle at small SF —
the local replica of the driver's t2 correctness gate."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import compare, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    # sf0.01 — the driver's correctness gate runs there, so the local gate
    # must too (a smaller SF can miss value-boundary rows, e.g. rounding
    # halves that only occur in the larger corpus)
    c = duckdb_con(SF_DIR_ORACLE)
    yield c
    c.close()


def test_every_query_has_oracle_or_is_declared():
    missing = [k for k in ORACLES if k not in QUERIES]
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare(df, con, ORACLES[name], name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
