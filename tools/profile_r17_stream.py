#!/usr/bin/env python3
"""Round-17 streaming state-store probe (guide §1 measure-first, §5).

Runs the tumbling-hourly streaming aggregation to completion repeatedly,
alternating the state-store provider between the default HDFS-backed one and
RocksDB, and prints per-run wall time plus the micro-batch progress metrics
(addBatch / stateOperators commit times). Fresh checkpoint every run; the
memory sink table is replaced every run — nothing crosses runs.

Usage: python tools/profile_r17_stream.py [reps_per_provider]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_infrastructure_spark.catalog import scratch_dir
from mapreduce_infrastructure_spark.functions.exact import dsum
from mapreduce_infrastructure_spark.session import get_spark
from mapreduce_infrastructure_spark.streaming.stream import stream_events

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def run_once(spark, sf_dir: str, provider: str, tag: str) -> dict:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("wstart"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    ckpt = os.path.join(scratch_dir("checkpoints"), f"probe_{tag}")
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory")
        .queryName(f"probe_{tag}")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n_rows = spark.table(f"probe_{tag}").count()
    batches = []
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
        pj = p if isinstance(p, dict) else json.loads(p.json)
        ops = pj.get("stateOperators") or []
        batches.append(
            {
                "addBatch": d.get("addBatch"),
                "commitOffsets": d.get("commitOffsets"),
                "queryPlanning": d.get("queryPlanning"),
                "triggerExecution": d.get("triggerExecution"),
                "stateCommitMs": [o.get("commitTimeMs") for o in ops],
                "stateRows": [o.get("numRowsTotal") for o in ops],
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    return {"wall": round(wall, 3), "rows": n_rows, "batches": batches}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r17-stream-probe")
    # one trivial action + one warmup stream so neither provider is billed
    # for one-time streaming-machinery init
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_once(spark, "/root/testdata/sf0.001", HDFS, "warm_h")
    run_once(spark, "/root/testdata/sf0.001", ROCKSDB, "warm_r")
    for i in range(reps):
        for name, prov in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            r = run_once(spark, sf_dir, prov, f"{name}_{i}")
            print(
                json.dumps({"provider": name, "rep": i, **r}), flush=True
            )


if __name__ == "__main__":
    main()
