"""Bucketed tables: co-located (shuffle-free) joins.

The reference's hash partitioner routes every key to `hash(key) % R`
intermediate files so each reducer reads co-located data
(``src/mr_tasks.h:64-80``). Bucketing is the persistent version of the same
idea: both tables are written pre-hashed into N buckets on the join key, so
the join needs NO Exchange on either side — the decisive layout optimization
for repeated fact-fact joins at 100 TB (a lineitem⋈orders shuffle of the
full fact tables is the single largest cost in a naive plan; bucketing pays
it once at write time and never again).

tests/test_bucketing.py asserts the plan property: a merge join over the
bucketed tables contains zero Exchange operators.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table, scratch_dir
from ..functions.exact import dsum, lcount
from ..registry import query

_SCRATCH = scratch_dir("bucketed")

N_BUCKETS = 8


def _tbl(sf_dir: str, name: str) -> str:
    """Catalog-safe table name keyed by the FULL fixture path (an 8-hex
    digest), not just the basename — two datasets whose directories share a
    basename (e.g. /a/sf0.1 and /b/sf0.1) must never alias each other's
    cached bucketed table."""
    import hashlib

    sf = re.sub(r"[^A-Za-z0-9]", "_", os.path.basename(sf_dir.rstrip("/")))
    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"bkt_{sf}_{digest}_{name}"


def bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """Write (once) and load the fixture table bucketed+sorted by `key`.

    saveAsTable is required — bucket metadata lives in the catalog, not the
    files; the explicit path keeps data under the repo's .scratch dir
    regardless of the session's warehouse location. A NEW session whose
    catalog is empty but whose scratch files already exist re-registers the
    existing data with CREATE TABLE ... CLUSTERED BY instead of re-paying
    the bucketed write ("pays it once at write time" means once, not once
    per session)."""
    tbl = _tbl(sf_dir, name)
    path = os.path.join(_SCRATCH, tbl)
    # Reuse requires the writer's COMMIT marker, not bare existence: a
    # crashed bucketed write leaves a partial directory (possibly with
    # committed bucket files under a v2 committer) that bare isdir would
    # re-register as the complete table forever.
    committed = os.path.isfile(os.path.join(path, "_SUCCESS"))
    if spark.catalog.tableExists(tbl) and committed:
        return spark.table(tbl)
    if committed:
        # Files exist from a prior session: register, don't rewrite.
        # (StructType.toDDL is JVM-only; build the column DDL by hand.)
        schema = load_table(spark, sf_dir, name).schema
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema)
        spark.sql(
            f"CREATE TABLE {tbl} ({ddl}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
            f"LOCATION '{path}'"
        )
        return spark.table(tbl)
    (
        load_table(spark, sf_dir, name)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(tbl)
    )
    return spark.table(tbl)


@query(
    "bucketed_join_orders_customer",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           floor((CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "bucketing", "layout"),
)
def bucketed_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables BUCKETED on the join key: zero shuffles for the join
    itself (merge join reads co-located, pre-sorted buckets). The aggregate
    after it is the only Exchange in the whole plan."""
    o = bucketed_table(spark, sf_dir, "orders", "o_custkey")
    c = bucketed_table(spark, sf_dir, "customer", "c_custkey")
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(lcount("n_orders"), dsum("o_totalprice", "total"))
    )
