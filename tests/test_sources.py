"""Source/sink connector tests: roundtrip fidelity + scan-plan shape.

The oracle comparison (tests/test_oracle_queries.py) already checks the
values of every sources query; this file asserts the *plan* properties the
docstrings promise — partition pruning actually pruning, declared schemas
actually skipping inference — which a value check can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_infrastructure_spark.plans.checks import explain_str
from mapreduce_infrastructure_spark.sources import formats


def test_csv_roundtrip_preserves_rows(spark, sf_dir):
    from mapreduce_infrastructure_spark.catalog import load_table

    back = formats.csv_roundtrip_nation(spark, sf_dir)
    orig = load_table(spark, sf_dir, "nation")
    assert back.count() == orig.count()
    assert sorted(back.columns) == sorted(orig.columns)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in orig.collect()}


def test_json_roundtrip_typed(spark, sf_dir):
    out = formats.sink_dir(sf_dir, "events_json")
    formats.json_roundtrip_events(spark, sf_dir).collect()  # writes the sink
    back = spark.read.schema(formats.EVENTS_DDL).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(out)
    # Timestamp and double types survive the JSON roundtrip exactly.
    assert dict(back.dtypes)["ts"] == "timestamp"
    from mapreduce_infrastructure_spark.catalog import load_table

    orig = load_table(spark, sf_dir, "events")
    o = orig.select(F.max("ts"), F.sum("event_id")).first()
    b = back.select(F.max("ts"), F.sum("event_id")).first()
    assert (b[0], b[1]) == (o[0], o[1])


def test_partitioned_parquet_prunes(spark, sf_dir):
    formats.parquet_partitioned_prune(spark, sf_dir).collect()  # writes sink
    out = formats.sink_dir(sf_dir, "orders_part")
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # And the partition column never reaches the data files: scanning just
    # the one hive directory yields exactly the filtered row set.
    only_f = spark.read.parquet(out + "/o_orderstatus=F")
    assert back.count() == only_f.count() > 0


def test_text_scan_schema_on_read(spark, sf_dir):
    parsed = formats.text_scan_doc_langs(spark, sf_dir)
    rows = {r.lang: r.n_docs for r in parsed.collect()}
    from mapreduce_infrastructure_spark.catalog import load_table

    orig = {
        r.lang: r.cnt
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert rows == orig


def test_json_scan_malformed_rows_visible(spark, sf_dir, tmp_path):
    """PERMISSIVE JSON scan: malformed lines must surface (corrupt-record
    column), never silently drop — at 100 TB silent data loss is the worst
    failure mode a connector can have."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"event_id": 1, "event_type": "click"}\n'
        "this is not json\n"
        '{"event_id": 2, "event_type": "purchase"}\n'
        '{"event_id": "not a number", "event_type": "x"}\n'
    )
    df = spark.read.schema(
        "event_id bigint, event_type string, _corrupt_record string"
    ).json(str(p))
    rows = df.collect()
    assert len(rows) == 4  # nothing dropped
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 2  # the non-JSON line and the type-mismatch line
    good = {r.event_id for r in rows if r._corrupt_record is None}
    assert good == {1, 2}


def test_orc_roundtrip_pushes_filter(spark, sf_dir):
    """The ORC scan must receive the priority predicate as a pushed filter
    (stripe-level min/max skipping at scale), like the parquet path does."""
    from mapreduce_infrastructure_spark.plans import checks
    from mapreduce_infrastructure_spark.sources.formats import (
        orc_roundtrip_orders,
    )

    df = orc_roundtrip_orders(spark, sf_dir)
    checks.assert_pushed_filter(df, "EqualTo(o_orderpriority,1-URGENT)")


def test_avro_guard_raises_clear_error(spark, sf_dir):
    """spark-avro is absent in this container; the helper must say exactly
    what to deploy rather than failing inside the DataSource lookup."""
    import pytest

    from mapreduce_infrastructure_spark.sources import formats

    if formats.avro_available(spark):
        out = formats.avro_roundtrip_nation(spark, sf_dir)
        assert out.count() == 25
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            formats.avro_roundtrip_nation(spark, sf_dir)


def test_xml_roundtrip_preserves_region(spark, sf_dir):
    """The XML sink→scan roundtrip returns exactly the source rows (the
    declared-schema read neither drops nor coerces), and rowTag scoping
    yields one row per element."""
    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.sources.formats import xml_roundtrip_region

    got = sorted(
        (r.r_regionkey, r.r_name) for r in xml_roundtrip_region(spark, sf_dir).collect()
    )
    want = sorted(
        (r.r_regionkey, r.r_name)
        for r in load_table(spark, sf_dir, "region").collect()
    )
    assert got == want


def test_binaryfile_ingest_checksums_and_restage_skip(spark, sf_dir):
    """binaryFile ingestion returns one row per staged file with exact
    byte counts and md5s (scalar reference), and a second invocation
    reuses the staged set (the content-addressed marker) instead of
    rewriting — files keep their mtimes."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.sources.formats import (
        _BINARYFILE_N,
        binaryfile_ingest_stats,
        sink_dir,
    )

    rows = {r.doc_id: r for r in binaryfile_ingest_stats(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    expect = {
        d: t for d, t in zip(tbl["doc_id"], tbl["text"]) if d < _BINARYFILE_N
    }
    assert set(rows) == set(expect)
    for d, t in expect.items():
        payload = t.encode()
        assert rows[d].n_bytes == len(payload)
        assert rows[d].payload_md5 == hashlib.md5(payload).hexdigest()
    out = sink_dir(sf_dir, "payload_files")
    sample = os.path.join(out, f"doc_{min(expect)}.bin")
    mtime = os.path.getmtime(sample)
    again = binaryfile_ingest_stats(spark, sf_dir).count()
    assert again == len(expect)
    assert os.path.getmtime(sample) == mtime  # restage skipped
