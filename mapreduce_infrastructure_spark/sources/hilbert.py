"""Hilbert-curve clustering: the liquid-clustering layout.

Z-order (zorder.py) interleaves bits, but the Z curve takes long diagonal
jumps between quadrants, so a file of consecutive z-values can span a wide
box in key space. The Hilbert curve visits every cell of the 2^bits grid
with UNIT steps only — consecutive indexes are always Manhattan-adjacent —
so equal-size runs of the curve have tighter bounding boxes and a 2-D box
predicate overlaps fewer files. This is why Delta's liquid clustering
replaced ZORDER BY with a Hilbert index; same idea here from first
principles (Hilbert 1891 curve; Hamilton's compact-index construction).

The per-bit rotation state machine is a poor fit for nested Column
expressions: each level references the previous x/y several times, and
projection collapse would inline them into an exponentially-sized tree.
The index is instead computed in a vectorized-numpy Pandas UDF — an
Arrow-batched, linear, embarrassingly-parallel map over the table, used
once at layout-write time (not in any query hot path). The layout write
itself stays declarative: repartitionByRange + sortWithinPartitions on the
index, one shuffle, identical cost shape to any sorted write.

`hilbert_pruning_stats` writes lineitem in the Hilbert layout and reports
footer-stats file overlap for the same 2-D box predicate next to the
z-ordered and natural layouts. At the 16-file fixture granularity the two
curves prune comparably (measured: avg 3.75 vs 3.62 files over an 8×8 box
sweep, both ~4× better than the natural layout); Hilbert's asymptotic edge
(Moon et al., "Analysis of the Clustering Properties of the Hilbert
Space-Filling Curve", TKDE 2001) shows up as file counts grow.
tests/test_zorder.py asserts the curve invariants (bijective, unit-step,
round-trip) and that hilbert prunes ≫ natural and ≈ zorder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..catalog import load_table
from ..registry import query
from .zorder import (
    BOX_COLS,
    _layout_ready,
    files_overlapping_box,
    layout_context,
    write_layout,
    zvalue,
)


def hilbert_index_np(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized (x, y) -> Hilbert curve index on the 2^bits × 2^bits
    grid. Classic quadrant-rotation construction: walk bit planes from the
    top; each plane contributes s·s·(3·rx ⊕ ry) cells, then the lower
    planes are rotated/reflected into the quadrant's frame.

    ``bits`` ≤ 31 (index spans 2·bits bits of an int64, same cap as
    zvalue). Inputs must be non-negative and < 2^bits.
    """
    if bits > 31:
        raise ValueError(f"hilbert_index: bits={bits} > 31 overflows int64")
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    n = np.int64(1) << bits
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # Rotate the subgrid so the next bit plane is in canonical frame.
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_d2xy_np(d: np.ndarray, bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse map (index -> cell) — used only by tests to verify the
    unit-step property that distinguishes Hilbert from Z-order."""
    t = d.astype(np.int64).copy()
    x = np.zeros(len(d), dtype=np.int64)
    y = np.zeros(len(d), dtype=np.int64)
    n = np.int64(1) << bits
    s = np.int64(1)
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # Inverse rotation at this scale (uses s, the subgrid size).
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_col(a: str, b: str, bits: int):
    """Column expression: Hilbert index of (a, b) via an Arrow-batched
    Pandas UDF (see module docstring for why not nested JVM columns)."""

    @pandas_udf(LongType())
    def _h(xa: pd.Series, xb: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_index_np(xa.to_numpy(), xb.to_numpy(), bits)
        )

    return _h(F.col(a), F.col(b))


@query("hilbert_pruning_stats", tags=("layout", "hilbert", "pruning"))
def hilbert_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem range-partitioned + sorted on the Hilbert index of
    (l_partkey, l_suppkey) and report footer-stats file overlap for the
    standard 2-D box predicate, next to the z-ordered and natural layouts
    (sharing zorder_pruning_stats' cache keys BY CONSTRUCTION via
    zorder.layout_context). Smaller is better; tests assert hilbert ≪
    natural and ≈ zorder. Rows-only (file layout is engine-specific; no
    SQL oracle exists for footers) — round-10 re-audit: non-graduable for
    the same reason as zorder_pruning_stats (RangePartitioner boundaries
    come from reservoir sampling, so per-file stats are not SQL-derivable;
    the inequality + curve invariants in tests are the contract).
    """
    li, bits, paths, (lo, hi) = layout_context(spark, sf_dir)
    if not _layout_ready(paths["hilbert"]):
        write_layout(
            li, hilbert_col("l_partkey", "l_suppkey", bits), paths["hilbert"]
        )
    if not _layout_ready(paths["z"]):
        write_layout(
            li, zvalue(F.col("l_partkey"), F.col("l_suppkey"), bits), paths["z"]
        )
    if not _layout_ready(paths["natural"]):
        write_layout(li, F.col("l_orderkey"), paths["natural"])
    rows = []
    for layout, path in [
        ("hilbert", paths["hilbert"]),
        ("zorder", paths["z"]),
        ("natural", paths["natural"]),
    ]:
        n_overlap, n_total = files_overlapping_box(path, BOX_COLS, lo, hi)
        rows.append((layout, n_overlap, n_total))
    return spark.createDataFrame(
        rows, "layout string, files_overlapping int, files_total int"
    )
