"""Round-17 optimization equivalence pins.

The round-17 optimization pass (OPTIMIZATION_r17.md) rewrote two pieces of
`ann_ivf_topk`'s construction:

- the probe-cell ranking — crossJoin(broadcast(centroids)) + interpreted
  zip_with squared-L2 + row_number window — now reuses the corpus
  assignment's Arrow kernel (`_cells_topk_udf(C, _IVF_PROBES)` + explode),
  which computes the identical (dist, cell) ordering (same left-to-right
  IEEE accumulation; sqrt is strictly monotone so ranking by sqrt(dist)
  equals ranking by dist);
- the fit='auto' corpus-row count comes from the parquet FOOTER metadata
  (driver-side, no Spark job) instead of a distributed count().

These tests pin both claims directly against the original formulations.
The query-level pure-python partial oracle
(test_dedup_similarity.py::test_ann_ivf_topk_partial_oracle_pure_python)
stands alongside, re-deriving the end-to-end result token-for-token.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from mapreduce_infrastructure_spark.llm import similarity as S

SF = "/root/testdata/sf0.01"


def _old_probes(spark, vecs, C):
    """The pre-round-17 probe formulation, verbatim."""
    centroids = spark.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(len(C))],
        "cell int, center array<double>",
    )
    q = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("d").alias("qd"),
        F.col("nrm").alias("qnrm"),
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with("qd", "center", lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cell")
    return (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qd", "qnrm", "cell", l2.alias("dist"))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= S._IVF_PROBES)
        .select("query_id", "qd", "qnrm", F.col("cell").alias("pcell"))
    )


def test_probe_cells_kernel_matches_crossjoin_window(spark):
    """The Arrow-kernel probe ranking is row-for-row identical (probe cell
    SET and order-insensitive multiset, qd/qnrm payload included) to the
    crossJoin + window formulation it replaced."""
    vecs = S._vectors(spark, SF)
    C = S._fit_centroids_sample(vecs)
    old = _old_probes(spark, vecs, C)
    new = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("d").alias("qd"),
        F.col("nrm").alias("qnrm"),
        F.explode(S._cells_topk_udf(C, S._IVF_PROBES)("d")).alias("pcell"),
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_parquet_footer_rows_matches_spark_count(spark, tmp_path):
    """Footer-metadata row count equals the distributed count for both
    fixture layouts: a single parquet file and a directory of part files."""
    n_spark = S._vectors(spark, SF).count()
    assert S._parquet_footer_rows(SF, "embeddings") == n_spark

    # directory-of-parts layout (the tools/scale_check.py replica shape)
    d = tmp_path / "embeddings.parquet"
    spark.range(137).selectExpr("id AS vec_id").repartition(4).write.mode(
        "overwrite"
    ).parquet(str(d))
    assert S._parquet_footer_rows(str(tmp_path), "embeddings") == 137
