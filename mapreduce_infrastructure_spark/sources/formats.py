"""Source/sink connectors (SURVEY.md §2B "Scans / sources / sinks").

The reference reads exactly one format — newline-delimited text, split into
byte-range shards (``src/file_shard.h:37-114``) — and writes one — appended
``key, value`` lines (``src/mr_tasks.h:112-115``). The engine's connector
surface is Spark's DataSource V2 readers/writers: text, CSV, JSON lines and
parquet, each exercised here as a *roundtrip* query (write the fixture table
through the sink, read it back through the scan, aggregate) so the oracle
check covers both directions, not just the read.

Conventions (the 100 TB defaults):
- **Explicit schemas on every read.** ``inferSchema``/sampling costs a full
  extra pass over the data and can mis-type partitions it didn't sample;
  schema-on-read here means *declared* schema, parquet's self-description,
  or a text line parsed by expression (the reference's model).
- **Partitioned parquet is the canonical table layout**: hive-style
  ``col=value`` directories so equality predicates prune whole directories
  before any I/O (tests assert ``PartitionFilters`` in the scan plan).
- Sinks write under ``<repo>/.scratch/io/<sf>/`` — per-scale-factor so
  concurrent runs at different SFs don't collide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.exact import dsum, lcount
from ..registry import query

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch", "io")


def sink_dir(sf_dir: str, name: str) -> str:
    """Scratch sink path, keyed by scale-factor directory basename."""
    return os.path.join(_SCRATCH, os.path.basename(sf_dir.rstrip("/")), name)


NATION_DDL = "n_nationkey int, n_name string, n_regionkey int"
EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


@query(
    "csv_roundtrip_nation",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "sink", "csv"),
)
def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV scan with a DECLARED schema (no inferSchema pass).

    Header on so the files are self-describing for humans; the read still
    trusts the DDL schema, which is the only scalable contract — sampling
    inference is O(data) before the query even starts.
    """
    out = sink_dir(sf_dir, "nation_csv")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return spark.read.schema(NATION_DDL).option("header", True).csv(out)


@query(
    "json_roundtrip_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           floor((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY event_type
    """,
    tags=("source", "sink", "json"),
)
def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → JSON scan with declared schema → aggregate.

    Round-trips the full typed row (bigint, timestamp, double, and the
    nested-JSON ``props`` string) through newline-delimited JSON, the
    interchange format of every log pipeline the engine would ingest at
    scale. The declared-schema read skips Spark's sampling pass and keeps
    malformed rows visible (PERMISSIVE puts them in every-column-null rows
    rather than silently dropping)."""
    out = sink_dir(sf_dir, "events_json")
    # Default JSON timestampFormat truncates to milliseconds; declare
    # microsecond precision on BOTH sides so the roundtrip is lossless.
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    load_table(spark, sf_dir, "events").write.mode("overwrite").option(
        "timestampFormat", ts_fmt
    ).json(out)
    back = spark.read.schema(EVENTS_DDL).option("timestampFormat", ts_fmt).json(out)
    return back.groupBy("event_type").agg(
        lcount("n_events"), dsum("value", "sum_value")
    )


@query(
    "text_scan_doc_langs",
    oracle="SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang",
    tags=("source", "sink", "text"),
)
def text_scan_doc_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-line sink → text scan → expression parse (schema-on-read).

    The reference's whole data model: opaque ``\\n``-delimited lines whose
    schema lives in the parsing map function
    (``external/include/mr_task_factory.h:20``, ``src/file_shard.h:37-114``).
    Here the "map" is a codegen'd split() — Spark's text splits are already
    newline-aligned byte ranges, so the reference's shard planner is the scan
    itself."""
    out = sink_dir(sf_dir, "documents_txt")
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        F.concat_ws("\t", F.col("doc_id"), F.col("lang")).alias("value")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.split("value", "\t").getItem(0).cast("bigint").alias("doc_id"),
        F.split("value", "\t").getItem(1).alias("lang"),
    )
    return parsed.groupBy("lang").agg(lcount("n_docs"))


@query(
    "parquet_partitioned_prune",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("source", "sink", "parquet", "pruning"),
)
def parquet_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink → scan with partition pruning.

    ``partitionBy(o_orderstatus)`` lays out ``o_orderstatus=F/`` directories;
    the equality filter then prunes to ONE directory before any file I/O
    (``PartitionFilters`` in the scan node — asserted in tests/test_sources).
    At 100 TB this is the difference between scanning a shard and scanning
    the lake; the same mechanism backs date-partitioned event logs."""
    out = sink_dir(sf_dir, "orders_part")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(lcount("n_orders"), dsum("o_totalprice", "total"))
    )
