#!/usr/bin/env python3
"""Isolate the _cell_dists assignment pass (the round-16 backlog item 1):
warmed noop timings for each stage of the IVF queries, min of N reps."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_infrastructure_spark.session import get_spark
from mapreduce_infrastructure_spark.llm import similarity as S

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "4"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    print(f"{label:50s} min {min(best):7.3f}s  reps {['%.3f' % x for x in best]}", flush=True)


def main() -> None:
    spark = get_spark(app_name="profile-cells")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    vecs = S._vectors(spark, SF)
    n = vecs.count()
    print(f"embeddings rows at {SF}: {n}")
    t("vectors scan (cast+norm) noop", lambda: noop(vecs))
    C = S._fit_centroids_sample(vecs)

    # assignment passes, isolated
    top1 = vecs.select(
        "vec_id", "d", "nrm",
        F.array_min(S._cell_dists(C, "d"))["cell"].alias("cell"),
    )
    t("top1 assignment (HOF _cell_dists) noop", lambda: noop(top1))

    two = vecs.select(
        "vec_id",
        F.explode(
            F.transform(
                F.slice(F.array_sort(S._cell_dists(C, "d")), 1, 2),
                lambda s: s["cell"],
            )
        ).alias("cell"),
    )
    t("top2 assignment (HOF sort+slice) noop", lambda: noop(two))


if __name__ == "__main__":
    main()


def plan_construct() -> None:
    spark = get_spark(app_name="profile-cells2")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from mapreduce_infrastructure_spark.registry import all_queries
    q = all_queries()
    for name in ("neardup_cosine_ivf", "ann_ivf_topk", "minhash_lsh_pairs"):
        t(f"{name} PLAN CONSTRUCT", lambda n=name: q[n].fn(spark, SF))


def ab() -> None:
    """A/B the HOF assignment expressions against the Arrow kernels."""
    spark = get_spark(app_name="profile-cells-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    vecs = S._vectors(spark, SF)
    print(f"embeddings rows at {SF}: {vecs.count()}")
    C = S._fit_centroids_sample(vecs)
    unit = vecs.select("vec_id", S._unit().alias("u"))
    books = S._fit_pq_codebooks(unit)

    top1_hof = vecs.select(
        "vec_id", F.array_min(S._cell_dists(C, "d"))["cell"].alias("cell")
    )
    top1_udf = vecs.select(
        "vec_id", F.element_at(S._cells_topk_udf(C, 1)("d"), 1).alias("cell")
    )
    two_hof = vecs.select(
        "vec_id",
        F.explode(
            F.transform(
                F.slice(F.array_sort(S._cell_dists(C, "d")), 1, 2),
                lambda s: s["cell"],
            )
        ).alias("cell"),
    )
    two_udf = vecs.select(
        "vec_id", F.explode(S._cells_topk_udf(C, 2)("d")).alias("cell")
    )
    codes_hof = unit.select(
        "vec_id",
        F.transform(
            S._sub_dists(books, "u"), lambda per_m: F.array_min(per_m)["code"]
        ).alias("codes"),
    )
    codes_udf = unit.select("vec_id", S._pq_codes_udf(books)("u").alias("codes"))
    for label, df in (
        ("top1 HOF", top1_hof), ("top1 UDF", top1_udf),
        ("top2 HOF", two_hof), ("top2 UDF", two_udf),
        ("pqcodes HOF", codes_hof), ("pqcodes UDF", codes_udf),
    ):
        t(label, lambda d=df: noop(d))
