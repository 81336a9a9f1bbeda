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

from ..catalog import load_table, scratch_dir
from ..functions.exact import dsum, lcount
from ..registry import query

_SCRATCH = scratch_dir("io")


def sink_dir(sf_dir: str, name: str) -> str:
    """Scratch sink path keyed by the FULL fixture path (basename + 8-hex
    abspath digest, the same no-aliasing rule as bucketing._tbl): two
    datasets whose directories share a basename (/a/sf0.1 and /b/sf0.1)
    must never write/read each other's roundtrip sinks — an overwrite from
    one concurrent gate run would race the other's read."""
    import hashlib

    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_SCRATCH, f"{base}_{digest}", name)


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
    "orc_roundtrip_orders",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
    tags=("source", "sink", "orc"),
)
def orc_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC scan → filtered aggregate: the second columnar format
    next to parquet. ORC self-describes its schema and supports the same
    predicate pushdown + column pruning contract; the plan test asserts the
    priority filter reaches the ORC reader as a pushed filter, so the scan
    skips stripes by min/max statistics exactly as parquet skips row groups
    at 100 TB."""
    out = sink_dir(sf_dir, "orders_orc")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    return (
        spark.read.orc(out)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(lcount("n_orders"), dsum("o_totalprice", "sum_price"))
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


@query(
    "schema_evolution_read",
    oracle="""
    SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
    FROM nation WHERE n_nationkey < 13
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_nationkey >= 13
    """,
    tags=("source", "schema-evolution", "parquet"),
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written under the same
    table root with DIFFERENT schemas (v1 lacks ``n_regionkey``; v2 added
    it), unified by ``mergeSchema`` — old rows surface the new column as
    NULL. This is the additive-column contract every long-lived event-log
    table needs; the declared-NULL oracle states it exactly.

    Scale note: mergeSchema footer reconciliation is O(files) at planning
    time — production tables pin the merged schema in a catalog instead of
    re-deriving it per query; the read path (and this query's result) is
    identical either way."""
    n = load_table(spark, sf_dir, "nation")
    out = sink_dir(sf_dir, "nation_evolved")
    v1 = n.filter(F.col("n_nationkey") < 13).select("n_nationkey", "n_name")
    v2 = n.filter(F.col("n_nationkey") >= 13).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "v=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "v=2"))
    return (
        spark.read.option("mergeSchema", True)
        .parquet(os.path.join(out, "v=1"), os.path.join(out, "v=2"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


_COMPACT_TARGET_ROWS = 50000


@query(
    "compact_small_files",
    oracle=f"""
    SELECT 'small' AS stage, 64 AS n_files, COUNT(*) AS n_rows FROM events
    UNION ALL
    SELECT 'compacted' AS stage,
           CAST(greatest(1, ceil(CAST(COUNT(*) AS DOUBLE) / {_COMPACT_TARGET_ROWS})) AS INTEGER) AS n_files,
           COUNT(*) AS n_rows
    FROM events
    """,
    tags=("source", "sink", "compaction", "layout"),
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance op every streaming
    ingest needs: a fragmented stage (64 tiny files, the shape a per-minute
    micro-batch writer leaves behind) is rewritten to
    ceil(rows/{_COMPACT_TARGET_ROWS}) right-sized files. The engine COUNTS
    the actual part-files it produced at each stage; the oracle PREDICTS
    both counts from the row count — measurement vs contract.

    At 100 TB the same op sizes by bytes (maxRecordsPerFile /
    file-size-target); rows are used here because parquet byte sizes are
    codec- and row-order-dependent, and the oracle must be exact. Reading
    64 small files costs 64 footer reads + 64 scan tasks; the compacted
    table costs ceil(rows/target) — that ratio is the whole point."""
    import glob

    ev = load_table(spark, sf_dir, "events")
    root = sink_dir(sf_dir, "events_compaction")
    small_dir, compact_dir = os.path.join(root, "small"), os.path.join(root, "big")
    ev.repartition(64).write.mode("overwrite").parquet(small_dir)
    back = spark.read.parquet(small_dir)
    n_rows = back.count()
    n_target = max(1, -(-n_rows // _COMPACT_TARGET_ROWS))
    back.repartition(n_target).write.mode("overwrite").parquet(compact_dir)

    def n_parts(d: str) -> int:
        return len(glob.glob(os.path.join(d, "part-*")))

    rows = [
        ("small", n_parts(small_dir), n_rows),
        ("compacted", n_parts(compact_dir), n_rows),
    ]
    return spark.createDataFrame(rows, "stage string, n_files int, n_rows long")


# ---------------------------------------------------------------------------
# Avro (guarded: the spark-avro connector is an external module)
# ---------------------------------------------------------------------------


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro DataSource is on the classpath. Avro is a
    built-in-but-external module since Spark 2.4 — this container ships the
    avro core jars but not spark-avro, so the helpers below raise a clear
    error instead of registering a query that could never pass here (same
    policy as the Kafka source, streaming/stream.py:kafka_available)."""
    # A Class.forName probe is NOT sufficient: Spark 4 ships some
    # org.apache.spark.sql.avro classes in the main jars while the
    # DataSource registration still lives in the external spark-avro
    # module — so resolve through the real DataSource lookup instead.
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception as e:
        msg = str(e)
        # Only a definitive "the source is not registered" answer may say
        # absent; any OTHER failure here means the private lookup API
        # itself broke (Py4J path / renamed internals in a future Spark),
        # which says nothing about the connector.
        if (
            "Failed to find data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "ClassNotFoundException" in msg
        ):
            return False
    # Lookup API unusable — fall back to a READ-PLAN probe on a path that
    # cannot exist: planning resolves the DataSource before touching any
    # files, so a present connector fails with a path error while an absent
    # one fails with the not-found/ClassNotFound family. Plan-only and
    # driver-side — no executor write, so the probe answers identically on
    # a multi-node cluster without shared scratch storage (a write probe
    # to a driver-local tempdir would not).
    try:
        spark.read.format("avro").load(
            "/nonexistent-avro-probe-path/definitely-absent"
        )
        return True  # unreachable in practice, but a success means present
    except Exception as e:
        msg = str(e)
        return not (
            "Failed to find data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "ClassNotFoundException" in msg
        )


def avro_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro sink → Avro scan roundtrip over nation (row-oriented container
    format — the ingest/wire tier next to the columnar ORC/parquet tiers;
    reference has a single text format, ``src/file_shard.h:37-114``).
    Raises RuntimeError with the exact dependency when spark-avro is not
    deployed; in a deployment that ingests Avro, add
    ``org.apache.spark:spark-avro_2.13`` to spark.jars.packages and this
    becomes a registered roundtrip query like orc_roundtrip_orders."""
    if not avro_available(spark):
        raise RuntimeError(
            "Avro source requested but spark-avro is not on the classpath; "
            "add org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    out = sink_dir(sf_dir, "nation_avro")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").format(
        "avro"
    ).save(out)
    return (
        spark.read.format("avro")
        .load(out)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "xml_roundtrip_region",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("source", "sink", "xml"),
)
def xml_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink → XML scan with a DECLARED schema — the document/feed
    interchange format next to CSV/JSON (Spark 4 ships the former
    spark-xml as a built-in source). Same schema-on-read contract as
    `csv_roundtrip_nation`: the read trusts the DDL instead of paying an
    O(data) inference pass, and rowTag scoping means a 100 TB feed of
    concatenated documents splits by element, not by line. The
    dimension-sized region table keeps the roundtrip cheap; the format
    machinery is identical for a fact-sized feed."""
    out = sink_dir(sf_dir, "region_xml")
    load_table(spark, sf_dir, "region").write.mode("overwrite").format(
        "xml"
    ).option("rootTag", "regions").option("rowTag", "region").save(out)
    return (
        spark.read.format("xml")
        .schema("r_regionkey int, r_name string")
        .option("rowTag", "region")
        .load(out)
        .select("r_regionkey", "r_name")
    )


_BINARYFILE_N = 50  # bounded staging: doc_id < 50 written as one file each


@query(
    "binaryfile_ingest_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents WHERE doc_id < {_BINARYFILE_N}
    """,
    tags=("source", "multimodal", "binary"),
)
def binaryfile_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source ingestion — the entry point for multimodal
    corpora: a directory of opaque media files read as (path, length,
    content) rows, here reduced to per-file byte counts and md5
    fingerprints with the doc id recovered from the file name. This is
    the scan that feeds `multimodal_frame_sample`/`extract_features` in
    a real pipeline (images/audio land as FILES, not parquet); at
    100 TB the reader parallelizes over files and
    `maxPartitionBytes`-sized batches of small files, content never
    touches the driver. Staging note: the fixture has no media files,
    so the query stages a BOUNDED set (doc_id < 50, one file per doc)
    from the documents table via a driver loop — scaffolding that
    simulates the external file drop, bounded by construction and
    allowlisted; the distributed part is the binaryFile scan itself.
    """
    import hashlib

    out = sink_dir(sf_dir, "payload_files")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BINARYFILE_N)
        .select("doc_id", "text")
        .collect()
    )
    os.makedirs(out, exist_ok=True)
    # Content-addressed staging marker: skip the rewrite when the staged
    # set is already complete and current (same no-partial-write rule as
    # the bucketing/zorder layout caches). The digest covers doc_ids AND
    # texts (a pure renumbering must restage — file NAMES change), and a
    # restage first clears every previously staged .bin so a regenerated
    # fixture with fewer/renumbered docs cannot leave stale files that
    # the *.bin glob would scan into the result.
    digest = hashlib.md5(
        b"\x00".join(
            f"{r.doc_id}:".encode() + r.text.encode()
            for r in sorted(docs, key=lambda r: r.doc_id)
        )
    ).hexdigest()
    marker = os.path.join(out, "_STAGED")
    if not (
        os.path.exists(marker) and open(marker).read() == digest
    ):
        for stale in os.listdir(out):
            if stale.endswith(".bin"):
                os.unlink(os.path.join(out, stale))
        for r in docs:
            with open(os.path.join(out, f"doc_{r.doc_id}.bin"), "wb") as f:
                f.write(r.text.encode())
        with open(marker, "w") as f:
            f.write(digest)
    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.bin"
    ).load(out)
    return files.select(
        F.regexp_extract(
            F.element_at(F.split(F.input_file_name(), "/"), -1),
            r"doc_(\d+)\.bin",
            1,
        )
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("payload_md5"),
    )
