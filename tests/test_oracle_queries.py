"""Runs every queries()/oracle_sql() pair against DuckDB at sf0.001 —
the same comparison shape as the driver's correctness gate."""

from __future__ import annotations

import pytest

from database_fragmentation_and_query_processor_spark import entry_queries as EQ

from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


def test_registry_consistency():
    assert set(EQ.ORACLE_SQL) <= set(EQ.QUERIES)


@pytest.mark.parametrize("name", sorted(EQ.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    if name not in EQ.ORACLE_SQL:
        df = EQ.QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare(EQ.QUERIES[name](spark, sf_dir), con, EQ.ORACLE_SQL[name], name)
    assert ok, msg
