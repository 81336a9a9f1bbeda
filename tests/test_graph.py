"""Semantic invariants for the iterative PageRank operator (its exactness
vs DuckDB is covered by the differential oracle test)."""

from __future__ import annotations

from mapreduce_infrastructure_spark.operators.graph import (
    _SUPP_OFFSET,
    pagerank_trade_graph,
)


def test_pagerank_invariants(spark, sf_dir):
    rows = pagerank_trade_graph(spark, sf_dir).collect()
    assert rows
    by_type = {"customer": [], "supplier": []}
    for r in rows:
        assert r["rank"] >= 0.15  # damping floor
        assert (r["node"] >= _SUPP_OFFSET) == (r["node_type"] == "supplier")
        by_type[r["node_type"]].append(r["rank"])
    assert by_type["customer"] and by_type["supplier"]
    # suppliers are far fewer than customers but receive edges from many
    # customers: their mean rank must exceed the customer mean
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(by_type["supplier"]) > mean(by_type["customer"])
    # total rank stays near N (damped leakage only): loose sanity bound
    total = sum(r["rank"] for r in rows)
    assert 0.5 * len(rows) <= total <= 1.5 * len(rows)


def test_pagerank_deterministic_rerun(spark, sf_dir):
    a = {(r["node"], r["rank"]) for r in pagerank_trade_graph(spark, sf_dir).collect()}
    b = {(r["node"], r["rank"]) for r in pagerank_trade_graph(spark, sf_dir).collect()}
    assert a == b
