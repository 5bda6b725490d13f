"""Run every __spark_entry__ query against its duckdb oracle at small SF —
the local replica of the driver's t2 correctness gate."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def test_every_query_has_oracle_or_is_declared():
    missing = [k for k in ORACLES if k not in QUERIES]
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare(df, con, ORACLES[name], name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
