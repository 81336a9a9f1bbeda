"""Z-order layout: the 2-D box predicate must skip more files than the
naturally-ordered layout, and the z-value must be a correct Morton code."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_infrastructure_spark.sources import zorder


def _morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_is_morton_code(spark):
    rows = [(a, b) for a in (0, 1, 5, 1023) for b in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder.zvalue(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == _morton(r.a, r.b, zorder.Z_BITS), (r.a, r.b, r.z)


def test_zorder_skips_more_files(spark, sf_dir):
    stats = {
        r.layout: (r.files_overlapping, r.files_total)
        for r in zorder.zorder_pruning_stats(spark, sf_dir).collect()
    }
    z_hit, z_tot = stats["zorder"]
    n_hit, n_tot = stats["natural"]
    assert z_tot == n_tot > 0
    # The box predicate covers ~1/64 of the 2-D domain: a natural layout
    # spreads it across (nearly) all files; z-order confines it.
    assert z_hit < n_hit, stats


def test_hilbert_curve_invariants():
    """The properties that make Hilbert the liquid-clustering curve:
    bijective on the grid, unit Manhattan steps between consecutive
    indexes (Z-order jumps diagonally), and xy2d/d2xy round-trip."""
    import numpy as np

    from mapreduce_infrastructure_spark.sources import hilbert

    for bits in (1, 2, 3, 6):
        n = 1 << bits
        d = np.arange(n * n, dtype=np.int64)
        x, y = hilbert.hilbert_d2xy_np(d, bits)
        assert len(set(zip(x.tolist(), y.tolist()))) == n * n
        assert (hilbert.hilbert_index_np(x, y, bits) == d).all()
        steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
        assert (steps == 1).all(), f"bits={bits}"
    import pytest

    with pytest.raises(ValueError):
        hilbert.hilbert_index_np(np.array([0]), np.array([0]), 32)


def test_hilbert_prunes_like_zorder_and_beats_natural(spark, sf_dir):
    """At the 16-file fixture granularity Hilbert and Z-order prune
    comparably (Hilbert's asymptotic edge needs more files to show); both
    must beat the natural layout by a wide margin on the 2-D box."""
    from mapreduce_infrastructure_spark.sources import hilbert

    stats = {
        r.layout: (r.files_overlapping, r.files_total)
        for r in hilbert.hilbert_pruning_stats(spark, sf_dir).collect()
    }
    h_hit, h_tot = stats["hilbert"]
    z_hit, _ = stats["zorder"]
    n_hit, n_tot = stats["natural"]
    assert h_tot == n_tot > 0
    assert h_hit <= n_hit // 2, stats
    assert abs(h_hit - z_hit) <= 2, stats
