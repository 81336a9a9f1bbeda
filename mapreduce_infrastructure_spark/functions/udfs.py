"""User-defined-function surface: the vectorized (Arrow) Python tier.

The reference's ENTIRE user API is a UDF pair — ``BaseMapper::map`` (1→N
rows) and ``BaseReducer::reduce`` (grouped fold), registered per ``user_id``
(``external/include/mr_task_factory.h:14-48``). The engine's equivalents span
four tiers, fastest first:

1. built-in expressions (everything else in this package — no Python at all),
2. ``pandas_udf`` scalar — Arrow batches, NumPy vectorized (here),
3. ``pandas_udf`` GROUPED_AGG — a black-box aggregate over a grouped column
   (here: median, which no algebraic combinator expresses),
4. ``applyInPandas`` / ``mapInPandas`` — arbitrary (keyed) table functions
   (mr/runner.py, llm/multimodal.py).

Row-at-a-time ``F.udf`` is deliberately absent: at 100 TB the per-row
pickle/GIL round-trip is a 10-100× tax; every Python boundary in this engine
crosses via Arrow.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import load_table
from ..registry import query
from .exact import rnd


# DataType instances (not DDL strings) so the decorators don't need an
# active SparkContext at import time.
@pandas_udf(DoubleType())
def _price_per_unit(price: pd.Series, qty: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: one Arrow batch in, one out. The
    arithmetic is NumPy — no per-row Python. (Expressible as a plain column
    expression too; kept as the tier-2 reference implementation.) Returns
    the raw ratio; rounding convention is applied by the caller so both
    engines share the exact floor(x·10⁴+0.5) expression."""
    return price / qty


@pandas_udf(DoubleType())
def _median_agg(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: the whole group's column arrives as ONE
    series (Arrow-shipped). Median is order-statistic, not algebraic — no
    partial/final combinator exists, so this is the honest tier for it.
    Deterministic across partitionings: the full group is materialized
    per key (same hot-key bound as any true holistic aggregate)."""
    return float(v.median())


@query(
    "udf_price_per_unit",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice / l_quantity) * 10000 + 0.5) / 10000 AS unit_price
    FROM lineitem
    WHERE l_quantity >= 45
    """,
    tags=("udf", "pandas"),
)
def udf_price_per_unit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over lineitem (filter still pushes down to parquet
    — only the UDF's Arrow batches pay the Python boundary)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    unit = _price_per_unit("l_extendedprice", "l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (rnd(unit, 4)).alias("unit_price"),
    )


@query(
    "udaf_median_price",
    oracle="""
    SELECT o_orderpriority,
           MEDIAN(o_totalprice) AS median_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("udf", "pandas", "agg"),
)
def udaf_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (GROUPED_AGG pandas UDF): per-priority median order
    price. Median of an even group averages the two middle doubles — the
    same IEEE operation in NumPy and DuckDB, so the check is exact."""
    o = load_table(spark, sf_dir, "orders")
    # A GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — compute the two and join on the
    # (tiny, broadcast) group key.
    med = o.groupBy("o_orderpriority").agg(
        _median_agg("o_totalprice").alias("median_price")
    )
    cnt = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    return med.join(cnt, "o_orderpriority")
