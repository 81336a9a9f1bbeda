"""Bounds for the approximate statistics tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_infrastructure_spark.catalog import load_table
from mapreduce_infrastructure_spark.operators.stats import approx_percentiles_price


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    got = {r.o_orderpriority: r for r in approx_percentiles_price(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for k, e in exact.items():
        g = got[k]
        for p in ("p50", "p95"):
            rel = abs(getattr(g, p) - getattr(e, p)) / max(getattr(e, p), 1e-9)
            assert rel < 0.02, f"{k}.{p}: approx={getattr(g, p)} exact={getattr(e, p)}"
