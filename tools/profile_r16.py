#!/usr/bin/env python3
"""Round-16 optimization profiler: per-phase wall times for the heavy
headline queries, separating DRIVER plan-construction time from EXECUTION
time (noop sink), per the optimization guide §1 (measure first, label jobs).

Usage: python tools/profile_r16.py [phase ...]
Phases: minhash ivf stream fits all
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
    print(f"{label:55s} {dt:8.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    want = set(sys.argv[1:]) or {"all"}
    spark = get_spark(app_name="profile-r16")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q = all_queries()

    if want & {"minhash", "all"}:
        from mapreduce_infrastructure_spark.llm import dedup as D
        from mapreduce_infrastructure_spark.llm import cache as C

        spark.sparkContext.setJobDescription("profile: shingle table")
        # fresh shingle table (drop the shared slot so cost is visible)
        C._CACHE.clear()
        sht = t("minhash: _doc_shingles build+persist+count", lambda: (
            lambda df: (df.count(), df)[1]
        )(D._shingle_table(spark, SF)))
        t("minhash: signatures noop", lambda: noop(D._signatures(sht)))
        t("minhash: signatures noop (2nd)", lambda: noop(D._signatures(sht)))
        t("minhash: full query exec", lambda: noop(q["minhash_lsh_pairs"].fn(spark, SF)))
        t("minhash: full query exec (warm)", lambda: noop(q["minhash_lsh_pairs"].fn(spark, SF)))

    if want & {"ivf", "all"}:
        from mapreduce_infrastructure_spark.llm import similarity as S

        vecs = t("ivf: _vectors plan", lambda: S._vectors(spark, SF))
        t("ivf: fit sample (collect+numpy)", lambda: S._fit_centroids_sample(vecs))
        t("ivf: fit sample (2nd)", lambda: S._fit_centroids_sample(vecs))
        C2 = S._fit_centroids_sample(vecs)
        t("ivf: neardup plan construct", lambda: q["neardup_cosine_ivf"].fn(spark, SF))
        df = q["neardup_cosine_ivf"].fn(spark, SF)
        t("ivf: neardup exec (noop)", lambda: noop(df))
        df2 = q["neardup_cosine_ivf"].fn(spark, SF)
        t("ivf: neardup exec (2nd)", lambda: noop(df2))
        # candidate count
        from pyspark.sql import functions as F
        two_cells = F.slice(F.array_sort(S._cell_dists(C2, "d")), 1, 2)
        assigned = vecs.select(
            "vec_id", F.explode(F.transform(two_cells, lambda s: s["cell"])).alias("cell")
        )
        a, b = assigned.alias("a"), assigned.alias("b")
        cand = a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        n_raw = cand.count()
        n_d = cand.dropDuplicates(["va", "vb"]).count()
        print(f"ivf: candidates raw={n_raw} dedup={n_d}")
        t("ivf: ann_ivf_topk plan construct", lambda: q["ann_ivf_topk"].fn(spark, SF))
        df3 = q["ann_ivf_topk"].fn(spark, SF)
        t("ivf: ann_ivf_topk exec", lambda: noop(df3))

    if want & {"stream", "all"}:
        t("stream: tumbling full", lambda: noop(q["stream_tumbling_hourly"].fn(spark, SF)))
        t("stream: tumbling full (2nd)", lambda: noop(q["stream_tumbling_hourly"].fn(spark, SF)))

    if want & {"fits", "all"}:
        from mapreduce_infrastructure_spark.llm import similarity as S

        vecs = S._vectors(spark, SF)
        t("fits: vecs.count() job", lambda: vecs.count())


if __name__ == "__main__":
    main()
