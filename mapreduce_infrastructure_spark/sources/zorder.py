"""Z-order (Morton) clustering: multi-dimensional data skipping.

Hive partitioning prunes on ONE column hierarchy; sorting prunes file-level
min/max stats on ONE leading column. When queries filter on TWO independent
columns (part AND supplier, lat AND lon), neither layout helps the second
column. Interleaving the bits of both keys (Morton / Z-order curve) and
range-partitioning + sorting on that single z-value gives every file a
small min/max BOX in both dimensions, so a 2-D box predicate overlaps few
files — the ZORDER BY of Delta/Iceberg, built from plain Spark expressions.

`zorder_pruning_stats` writes lineitem twice — z-ordered on
(l_partkey, l_suppkey) vs naturally ordered on l_orderkey — and measures,
from the parquet footers, how many files a 2-D box predicate can skip in
each layout. tests/test_zorder.py asserts the z-ordered layout skips more.

Scale note: the z-value is one codegen'd expression; the layout write is a
single repartitionByRange (one shuffle), identical cost to any sorted
write. At 100 TB this decides whether a 2-D selective query reads 1% or
100% of the files.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..catalog import load_table, scratch_dir
from ..registry import query

_SCRATCH = scratch_dir("zorder")

Z_BITS = 10  # default per-dimension bits (tests); real layouts derive from domain
N_FILES = 16


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative int
    columns (a even positions, b odd) — pure bitwise expressions.

    ``bits`` is capped at 31: the top interleaved position is 2*bits+1,
    and shiftleft past bit 62 would wrap into the sign bit and corrupt the
    ordering silently. Wider keys need two longs (interleave high and low
    halves separately)."""
    if bits > 31:
        raise ValueError(
            f"zvalue: bits={bits} > 31 would overflow the 64-bit z-value; "
            "interleave into two longs for wider keys"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return z


def write_layout(df: DataFrame, order_col: Column, path: str, n: int = N_FILES) -> None:
    """Range-partition + sort on `order_col`, write n parquet files."""
    (
        df.withColumn("_ord", order_col)
        .repartitionByRange(n, "_ord")
        .sortWithinPartitions("_ord")
        .drop("_ord")
        .write.mode("overwrite")
        .parquet(path)
    )


def _file_minmax(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for `cols` from parquet footers (driver-side; the
    same stats a data-skipping reader consults)."""
    import pyarrow.parquet as pq

    out = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        stats: dict = {"file": fname}
        for c in cols:
            lo = hi = None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == c and col.statistics is not None:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            stats[c] = (lo, hi)
        out.append(stats)
    return out


def files_overlapping_box(
    path: str, cols: list[str], lo: list[int], hi: list[int]
) -> tuple[int, int]:
    """(#files whose min/max box overlaps the predicate box, #files total)."""
    stats = _file_minmax(path, cols)
    n_overlap = 0
    for s in stats:
        ok = True
        for c, l, h in zip(cols, lo, hi):
            cmin, cmax = s[c]
            if cmin is None:
                # No stats -> a data-skipping reader MUST read the file;
                # counting it skippable would overstate pruning.
                continue
            if cmax < l or cmin > h:
                ok = False
                break
        if ok:
            n_overlap += 1
    return n_overlap, len(stats)


# The 2-D box predicate used for the measurement: ~1/64 of each key domain.
BOX_COLS = ["l_partkey", "l_suppkey"]


def _layout_ready(path: str) -> bool:
    """A cached layout is reusable only when the writer COMMITTED it — the
    _SUCCESS marker. A bare isdir check would resurrect a partial layout
    from an interrupted write forever, and these queries are rows-only (no
    SQL oracle exists for footer stats), so the wrong overlap counts would
    go unnoticed."""
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def layout_context(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, dict[str, str], tuple[list[int], list[int]]]:
    """Shared derivation for the layout-pruning queries (zorder + hilbert):
    ONE lineitem max-aggregation supplies the interleave bit width, the
    layout-cache digest AND the box predicate, so the two queries share
    cache keys by construction (they previously copy-pasted the
    derivation, coupled only by a comment, and re-scanned lineitem a
    second time for the box).

    Bits are sized to the ACTUAL key domain: truncating (e.g. 10 bits vs
    partkey max 19999) would interleave only the low bits and collapse
    that dimension's clustering to noise. The cache digest keys on full
    fixture path + bits so stale layouts from a different dataset or an
    older bit-width are never reused."""
    import hashlib

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    m = li.agg(
        F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
    ).first()
    bits = max(int(m.p).bit_length(), int(m.s).bit_length())
    digest = hashlib.md5(f"{os.path.abspath(sf_dir)}|{bits}".encode()).hexdigest()[:8]
    sfb = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(_SCRATCH, f"{sfb}_{digest}")
    paths = {k: os.path.join(root, k) for k in ("z", "natural", "hilbert")}
    box = ([0, 0], [int(m.p) // 8, int(m.s) // 8])
    return li, bits, paths, box


@query("zorder_pruning_stats", tags=("layout", "zorder", "pruning"))
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem z-ordered on (l_partkey, l_suppkey) and naturally
    ordered on l_orderkey; report, per layout, how many of the N files a
    2-D box predicate overlaps according to footer min/max stats. Smaller
    is better; the z-ordered layout must overlap fewer (asserted in
    tests/test_zorder.py). Rows-only — and re-audited as such in round
    10: even a partial oracle on the overlap COUNTS would require DuckDB
    to reproduce Spark's file assignment, and repartitionByRange picks
    its boundaries by reservoir SAMPLING (RangePartitioner), so the
    per-file min/max boxes are not a deterministic function of the data
    that SQL could re-derive; the cross-layout inequality and the curve
    invariants are the checkable contract, and tests pin them."""
    li, bits, paths, (lo, hi) = layout_context(spark, sf_dir)
    if not _layout_ready(paths["z"]):
        write_layout(
            li, zvalue(F.col("l_partkey"), F.col("l_suppkey"), bits), paths["z"]
        )
    if not _layout_ready(paths["natural"]):
        write_layout(li, F.col("l_orderkey"), paths["natural"])
    rows = []
    for layout, path in [("zorder", paths["z"]), ("natural", paths["natural"])]:
        n_overlap, n_total = files_overlapping_box(path, BOX_COLS, lo, hi)
        rows.append((layout, n_overlap, n_total))
    return spark.createDataFrame(
        rows, "layout string, files_overlapping int, files_total int"
    )
