"""Bucketed-join plan property: the join itself runs with no Exchange."""

from __future__ import annotations

from mapreduce_infrastructure_spark.plans.checks import explain_str
from mapreduce_infrastructure_spark.sources import bucketing


def test_bucketed_join_has_no_join_side_exchange(spark, sf_dir):
    o = bucketing.bucketed_table(spark, sf_dir, "orders", "o_custkey")
    c = bucketing.bucketed_table(spark, sf_dir, "customer", "c_custkey")
    joined = o.hint("merge").join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name"
    )
    plan = explain_str(joined, "simple")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table

    got = bucketing.bucketed_join_orders_customer(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    want = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    assert {(r.c_mktsegment, r.n_orders) for r in got.collect()} == {
        (r.c_mktsegment, r.n_orders) for r in want.collect()
    }
