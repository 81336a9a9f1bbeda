"""Statistical aggregates with DETERMINISTIC cross-engine results.

Spark's built-in `corr`/`stddev`/`covar_samp` accumulate doubles in shuffle
order, so two runs (or two engines) disagree in the last ulps — fine for
analytics, fatal for a differential-correctness gate and for reproducible
pipelines. This module computes the same statistics from EXACT decimal power
sums (Σx, Σy, Σx², Σy², Σxy are associative in DECIMAL, so every
partitioning yields identical bits), applying the textbook closed forms in
double only at the very end:

    var   = (n·Σx² − (Σx)²) / (n·(n−1))
    corr  = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))

The same expressions run in DuckDB over the same decimal sums → the check is
exact, no rounding slop needed beyond display rounding.

Scale note: a decimal power-sum aggregate is a single partial+final
HashAggregate pass (one shuffle), identical cost to the double version; at
100 TB the determinism additionally means re-runs and stragglers can't
produce drifting results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..functions.exact import dec, rnd
from ..registry import query

# Power sums in DECIMAL(28,4): products of two DECIMAL(18,2) values are
# DECIMAL(·,4); 28 integer digits absorb 100 TB-scale row counts.
_PROD = "decimal(28,4)"


@query(
    "stats_moments_by_status",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxx
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           floor((CAST(sx AS DOUBLE) / n) * 100 + 0.5) / 100 AS mean_price,
           floor(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * (n - 1))) * 100 + 0.5) / 100 AS stddev_price
    FROM s
    """,
    tags=("agg", "stats"),
)
def stats_moments_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean and sample stddev of order totals per status, via exact decimal
    power sums (see module docstring — bit-identical across partitionings
    and engines, unlike the built-in stddev_samp)."""
    o = load_table(spark, sf_dir, "orders")
    x = dec("o_totalprice")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum((x * x).cast(_PROD)).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    return agg.select(
        "o_orderstatus",
        "n",
        rnd(sx / n, 2).alias("mean_price"),
        rnd(
            F.sqrt((n * sxx - sx * sx) / (n.cast("double") * (n - 1))), 2
        ).alias("stddev_price"),
    )


@query(
    "stats_corr_qty_price",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxx,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS syy,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           floor(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1000000 + 0.5) / 1000000 AS corr_qty_price
    FROM s
    """,
    tags=("agg", "stats"),
)
def stats_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag, from exact
    decimal power sums — the deterministic form of F.corr."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast(_PROD)).alias("sxx"),
        F.sum((y * y).cast(_PROD)).alias("syy"),
        F.sum((x * y).cast(_PROD)).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return agg.select("l_returnflag", "n", rnd(corr, 6).alias("corr_qty_price"))


@query("approx_percentiles_price", tags=("agg", "approx", "stats"))
def approx_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of order totals per priority via
    percentile_approx (Greenwald-Khanna sketch, accuracy 10000).

    The sketch tier for quantiles at 100 TB: mergeable per-partition state,
    one shuffle, no global sort — exact percentile_disc would sort the
    column. No SQL oracle (sketch results are engine-specific);
    tests/test_stats.py bounds the error against the exact quantiles."""
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", [0.5, 0.95, 0.99], 10000
    )
    return o.groupBy("o_orderpriority").agg(
        pct.getItem(0).alias("p50"),
        pct.getItem(1).alias("p95"),
        pct.getItem(2).alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "exact_percentiles_disc",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS cd
      FROM orders
    )
    SELECT o_orderpriority,
           MIN(CASE WHEN cd >= 0.5 THEN o_totalprice END) AS p50,
           MIN(CASE WHEN cd >= 0.95 THEN o_totalprice END) AS p95,
           MIN(CASE WHEN cd >= 0.99 THEN o_totalprice END) AS p99,
           COUNT(*) AS n_orders
    FROM ranked
    GROUP BY o_orderpriority
    """,
    tags=("agg", "stats", "percentile"),
)
def exact_percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles (the ground truth the approx sketch is
    bounded against): percentile_disc(q) = the smallest actual value whose
    cume_dist reaches q. Discrete selection returns a REAL data value — no
    interpolation arithmetic, so no cross-engine float drift by
    construction (cume_dist is an exact rational rank/n in both engines,
    compared against exact decimal literals; ties broken by o_orderkey).

    Scale: one window sort per group + one aggregation — the cost exact
    quantiles fundamentally require; use approx_percentiles_price when a
    bounded-error sketch is acceptable at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    cd = F.cume_dist().over(w)
    ranked = o.select("o_orderpriority", "o_totalprice", cd.alias("cd"))
    return ranked.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("cd") >= 0.5, F.col("o_totalprice"))).alias("p50"),
        F.min(F.when(F.col("cd") >= 0.95, F.col("o_totalprice"))).alias("p95"),
        F.min(F.when(F.col("cd") >= 0.99, F.col("o_totalprice"))).alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )
