"""Distributed k-means over the embedding corpus, exact-trajectory checked.

Third member of the iterative-fixpoint family (connected components in
``llm/dedup.py``, PageRank in ``operators/graph.py``): Lloyd's algorithm
where every iteration is two DataFrame passes — a broadcast-centroid
assignment and a per-dimension centroid mean — driven by a driver loop that
never touches data. Unlike the ANN-IVF tier (``llm/similarity.py``), whose
centroid FIT is a justified driver-side sample fit, this k-means is fully
distributed: centroids live in a K-row DataFrame, broadcast into the
assignment crossJoin, and are re-estimated with shuffle aggregation.

Determinism contract (same design as PageRank's, see
``operators/graph.py`` module docstring): coordinates are grain-rounded to
1e-9 on load (pure-IEEE floor form); per-dimension squared differences are
grain-rounded and summed in DECIMAL(28,9) — exact and associative, so
partitioning cannot change a distance; ties in the argmin break on the
smallest centroid id; centroid means divide an exact DECIMAL sum by an
integer count as one double division, grain-rounded once. Both engines
therefore walk the IDENTICAL centroid trajectory, and the DuckDB oracle —
the same recurrence unrolled into generated CTEs — matches bit-for-bit.

Scale (100 TB): assignment is a BroadcastNestedLoopJoin of N rows × K
centroids (the canonical K·N·D cost, all JVM-side array arithmetic inside
one codegen stage); the update is one posexplode + (cid, dim) hash
aggregate — shuffle rows bounded by K·D, not N. Nothing collects to the
driver; iteration count is a fixed hyperparameter.

Reference parity: the reference has no numeric-iteration surface at all
(``external/include/mr_task_factory.h:20-43``); this is north-star scope
(training-data pipeline: clustering for semantic dedup / data mixing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..registry import query

K = 8
N_ITERS = 3
_G = 1_000_000_000  # 1e-9 grain, as an exact integer literal


def _pts_sql() -> str:
    """Exploded (vec_id, d, x) points with grain-rounded double coords.

    DuckDB lists are 1-indexed; the Spark side uses ``posexplode`` (0-based)
    internally, which is invisible cross-engine because dims never appear in
    the output."""
    return f"""
    pts AS (
      SELECT e.vec_id, g.i AS d,
             floor(CAST(list_extract(e.embedding, g.i) AS DOUBLE) * {_G} + 0.5) / {_G} AS x
      FROM embeddings e
      CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) g
    ),
    c0 AS (
      SELECT vec_id AS cid, d, x AS c FROM pts WHERE vec_id < {K}
    )"""


def _kmeans_oracle(iters: int = N_ITERS) -> str:
    """Unrolled Lloyd iterations: assignment (exact-decimal distances,
    min-cid tie-break) then grain-rounded centroid means."""
    blocks = [f"WITH {_pts_sql()}"]
    for k in range(1, iters + 1):
        blocks.append(f"""
    , dist{k} AS (
      SELECT p.vec_id, c.cid,
             SUM(CAST(floor((p.x - c.c) * (p.x - c.c) * {_G} + 0.5) / {_G}
                      AS DECIMAL(28,9))) AS dist
      FROM pts p JOIN c{k - 1} c ON p.d = c.d
      GROUP BY 1, 2
    ),
    m{k} AS (SELECT vec_id, MIN(dist) AS md FROM dist{k} GROUP BY vec_id),
    a{k} AS (
      SELECT d.vec_id, MIN(d.cid) AS cid
      FROM dist{k} d JOIN m{k} m ON d.vec_id = m.vec_id AND d.dist = m.md
      GROUP BY d.vec_id
    )""")
        if k < iters:
            blocks.append(f"""
    , c{k} AS (
      SELECT a.cid, p.d,
             floor(CAST(SUM(CAST(p.x AS DECIMAL(28,9))) AS DOUBLE)
                   / COUNT(*) * {_G} + 0.5) / {_G} AS c
      FROM a{k} a JOIN pts p ON a.vec_id = p.vec_id
      GROUP BY 1, 2
    )""")
    blocks.append(f"""
    SELECT a.vec_id, a.cid, CAST(m.md AS DOUBLE) AS dist
    FROM a{iters} a JOIN m{iters} m ON a.vec_id = m.vec_id
    """)
    return "".join(blocks)


# Grain-rounded squared-difference fold, summed in DECIMAL(28,9). The
# accumulator is re-cast each step so the lambda's return type stays fixed
# (decimal addition widens the type otherwise).
_DIST_EXPR = f"""
aggregate(
  zip_with(x, c, (a, b) ->
    CAST(floor((a - b) * (a - b) * {_G} + 0.5) / {_G} AS DECIMAL(28,9))),
  CAST(0 AS DECIMAL(28,9)),
  (acc, v) -> CAST(acc + v AS DECIMAL(28,9)))
"""


@query(
    "kmeans_embeddings",
    oracle=_kmeans_oracle(),
    tags=("ml", "iterative", "clustering", "embeddings"),
)
def kmeans_embeddings(
    spark: SparkSession, sf_dir: str, iters: int = N_ITERS
) -> DataFrame:
    """K-means (K=8, 3 Lloyd iterations, seeds = vec_id < K) over the 64-d
    embedding corpus; returns each vector's final cluster assignment and
    its exact squared distance to that centroid."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(
            f"transform(CAST(embedding AS ARRAY<DOUBLE>),"
            f" e -> floor(e * {_G} + 0.5) / {_G})"
        ).alias("x"),
    )
    # Every iteration's assignment re-derives from pts; persist once so the
    # corpus is scanned once, not once per iteration (PageRank does the same
    # with its edge list). Iteration-scoped scratch; unpersist left to GC.
    pts = pts.persist()
    centroids = pts.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("x").alias("c")
    )
    assign = None
    for it in range(1, iters + 1):
        dists = (
            pts.crossJoin(F.broadcast(centroids))
            .withColumn("dist", F.expr(_DIST_EXPR))
            .select("vec_id", "x", "cid", "dist")
        )
        # struct-min = (smallest dist, then smallest cid): the deterministic
        # tie-break, in one aggregate.
        assign = (
            dists.groupBy("vec_id")
            .agg(
                F.min(F.struct("dist", "cid")).alias("best"),
                F.first("x").alias("x"),
            )
            .select(
                "vec_id",
                F.col("best.cid").alias("cid"),
                F.col("best.dist").alias("dist"),
                "x",
            )
        )
        if it < iters:
            dims = assign.select(
                "cid", F.posexplode("x").alias("pos", "xd")
            )
            cdims = dims.groupBy("cid", "pos").agg(
                F.floor(
                    F.sum(F.col("xd").cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1))
                    * _G
                    + F.lit(0.5)
                ).cast("double")
                .alias("cnum")
            ).select(
                "cid", "pos", (F.col("cnum") / F.lit(_G)).alias("cd")
            )
            centroids = (
                cdims.groupBy("cid")
                .agg(
                    F.expr(
                        "transform(array_sort(collect_list(struct(pos, cd))),"
                        " s -> s.cd)"
                    ).alias("c")
                )
            )
    return assign.select(
        "vec_id", "cid", F.col("dist").cast("double").alias("dist")
    )
