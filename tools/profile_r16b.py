#!/usr/bin/env python3
"""Round-16 optimization profiler, wave 4: fine-grained phase timings for
the remaining heavy headline queries (minhash_lsh_pairs, neardup_cosine_ivf,
ann_ivf_topk, stream_tumbling_hourly), separating plan construction, each
intermediate job, and the final noop execution — guide §1 (measure first).

Usage: python tools/profile_r16b.py [minhash ivf stream all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_infrastructure_spark.registry import all_queries
from mapreduce_infrastructure_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:58s} {dt:8.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    want = set(sys.argv[1:]) or {"all"}
    spark = get_spark(app_name="profile-r16b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q = all_queries()

    if want & {"minhash", "all"}:
        from mapreduce_infrastructure_spark.llm import cache as C
        from mapreduce_infrastructure_spark.llm import dedup as D
        from pyspark.sql import functions as F

        for rep in (1, 2):
            C._CACHE.clear()
            spark.catalog.clearCache()
            sht = t(f"minhash[{rep}]: shingle build+persist+count", lambda: (
                lambda df: (df.count(), df)[1]
            )(D._shingle_table(spark, SF)))
            sig = D._signatures(sht)
            t(f"minhash[{rep}]: signatures noop", lambda: noop(sig))
            bands = q["minhash_lsh_pairs"].fn  # full query from here
            t(f"minhash[{rep}]: full plan construct", lambda: bands(spark, SF))
            df = bands(spark, SF)
            t(f"minhash[{rep}]: full exec (noop)", lambda: noop(df))

    if want & {"ivf", "all"}:
        from mapreduce_infrastructure_spark.llm import cache as C
        from mapreduce_infrastructure_spark.llm import similarity as S
        from pyspark.sql import functions as F

        for rep in (1, 2):
            C._CACHE.clear()
            spark.catalog.clearCache()
            vecs = t(f"ivf[{rep}]: _vectors plan", lambda: S._vectors(spark, SF))
            t(f"ivf[{rep}]: vecs.count() job", lambda: vecs.count())
            t(f"ivf[{rep}]: fit sample", lambda: S._fit_centroids_sample(vecs))
            Cm = S._fit_centroids_sample(vecs)
            assigned = vecs.select(
                "vec_id", F.explode(S._cells_topk_udf(Cm, 2)("d")).alias("cell")
            )
            t(f"ivf[{rep}]: 2-cell assignment noop", lambda: noop(assigned))
            t(f"ivf[{rep}]: neardup plan construct",
              lambda: q["neardup_cosine_ivf"].fn(spark, SF))
            df = q["neardup_cosine_ivf"].fn(spark, SF)
            t(f"ivf[{rep}]: neardup exec (noop)", lambda: noop(df))
            t(f"ivf[{rep}]: ann_ivf plan construct",
              lambda: q["ann_ivf_topk"].fn(spark, SF))
            df2 = q["ann_ivf_topk"].fn(spark, SF)
            t(f"ivf[{rep}]: ann_ivf exec (noop)", lambda: noop(df2))

    if want & {"stream", "all"}:
        for rep in (1, 2, 3):
            t(f"stream[{rep}]: tumbling full", lambda: noop(
                q["stream_tumbling_hourly"].fn(spark, SF)))
        # last progress breakdown
        for sq in spark.streams.active:
            print(sq.lastProgress)


if __name__ == "__main__":
    main()
