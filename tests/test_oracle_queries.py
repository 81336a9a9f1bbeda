"""Differential test: every oracle-bearing query in the registry must match
DuckDB exactly (row count + schema + values) — the local mirror of the
driver's CORRECTNESS gate, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from mapreduce_infrastructure_spark.registry import all_queries

from .helpers import check_query

_QUERIES = all_queries()
_ORACLE_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, name):
    q = _QUERIES[name]
    check_query(spark, sf_dir, name, q.fn, q.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    """Non-SQL-expressible operators must at least execute with a stable
    schema (their semantic invariants are asserted in dedicated tests)."""
    df = _QUERIES[name].fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
