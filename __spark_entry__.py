"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduce_infrastructure_spark``; this module is
a thin adapter over its query registry (one entry per operator from
SURVEY.md §2, each with matching DuckDB oracle SQL where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_infrastructure_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: word count over
    documents.text — the reference's demo query (test/user_tasks.cc:9-35)
    re-expressed as explode/split/groupBy."""
    from mapreduce_infrastructure_spark.llm.text import wordcount

    return wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approximate/UDF-backed operators
    (LSH, SimHash, ANN, stubs) are intentionally omitted → driver applies
    its rows-only check, and tests/ assert their invariants instead."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
