"""Scale-safe exact rank / percentile / prefix-sum building blocks.

The naive exact form of these operators is a window partitioned by a
LOW-CARDINALITY stratum (source, lang, order priority, …) over the full
fact table — which routes every row of a volume-scaled stratum through
ONE task: at 100 TB a 20-language corpus gives each task ~1/20 of the
data to sort serially, with zero intra-stratum parallelism (the
partitioned cousin of the single-partition q15/q11 shape; see
tests/test_plans.py). The helpers here compute the SAME exact answers
with bounded window inputs:

* ``hist_cume_counts`` / ``hist_percent_rank`` — the count-value
  HISTOGRAM closed form (the ``source_vocab_gini`` trick): group rows by
  (stratum, value) first, run the cumulative window over the DISTINCT
  VALUE histogram — |domain| rows per stratum, never |rows| (token
  counts and 2-decimal prices are domain-bounded however large the
  corpus grows) — then derive per-row ranks by adding a within-VALUE
  row_number, whose window key (stratum, value) has histogram-scale
  cardinality so group sizes shrink as 1/|domain|.
* ``bucketed_prefix_sum`` — two-pass distributed running sum for
  genuinely positional quantities (packing cumsums, intake ranks):
  deterministic contiguous ORDER-KEY RANGE buckets (no sampling, no
  spark_partition_id — reproducible across runs and cluster sizes),
  per-(stratum, bucket) subtotals, a cumulative offset window over the
  |strata|×|buckets| subtotal table (tiny), then a running sum within
  each (stratum, bucket) — every window group is ~1/n_buckets of a
  stratum, and n_buckets scales with the cluster.

All arithmetic is exact-integer until the single final division the
caller makes, so results are bit-identical to the naive window forms
(both engines compute the same ints and the same one IEEE division).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window, functions as F

# Default order-key range buckets for the two-pass prefix sum. At test SF
# this exceeds parallelism already; a 1000-executor deployment raises it —
# each window group is stratum_rows / n_buckets.
PREFIX_SUM_BUCKETS = 32

# Driver-side row budget for one narrowing-census round (round 17). The
# narrowers' per-round census is ≤ |active tasks| · (branching + 1) rows,
# so when few tasks are active the branching factor can be thousands wide
# instead of 32 at the same driver cost — and every extra unit of width
# divides the number of rounds, where each round is a full pushed-filter
# scan of the source at 100 TB (locally, a fixed job/broadcast overhead).
# 64k rows of (stratum, label, bucket, count) is a few MB collected — far
# inside any driver budget. The k-th value found is branching-invariant
# (exact rank descent), so results are bit-identical at any width.
_CENSUS_ROW_BUDGET = 65536


def hist_cume_counts(
    df: DataFrame,
    stratum_cols: list[str],
    value_col: str,
    descending: bool = False,
    m_col: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-value histogram with cumulative counts per stratum.

    Returns one row per distinct (strata, value): ``m`` (rows at this
    value), ``cumb`` (rows at strictly earlier values in the given
    order), ``cum`` (rows at this value or earlier) and ``n_stratum``
    (stratum total). The cumulative window runs over the HISTOGRAM —
    |distinct values| rows per stratum, domain-bounded — so the
    low-cardinality partition key is safe (the plan guard's
    histogram-input exemption recognises this shape by the upstream
    aggregate keyed on the window's order column).

    ``m_col``: when given, ``df`` is treated as PRE-FOLDED histogram
    cells — one row per distinct (strata, value) with ``m_col`` holding
    the rows-in-cell count — and the internal count fold is skipped (the
    streaming twins' sink tables and the weighted-percentile queries
    arrive as cells already; re-folding would add a redundant shuffle).
    The uniqueness contract is ENFORCED: a duplicate (strata, value)
    cell raises at evaluation time via a lag-based ``assert_true`` that
    rides the same window exchange. The guard is threaded through the
    ``m`` and ``wm`` outputs ONLY — and thus through ``cum``/``cumw``,
    which sum the guarded ``m``/``wm`` — so any consumer reading at
    least one of ``m``/``wm``/``cum``/``cumw`` evaluates it. The
    remaining outputs (``cumb``/``cumwb``/``n_stratum``/``w_stratum``)
    are window sums over the RAW input columns; a consumer selecting
    only those would bypass the check (a nested-window sum over the
    guarded ``m`` is not expressible, so this asymmetry is inherent).
    Every current consumer reads ``m``/``cum``/``cumw``.

    ``weight_col``: optional second MEASURE on the cells (requires
    ``m_col``; an int64 per-cell mass such as token or revenue totals).
    Adds ``wm`` (mass at this value), ``cumwb``/``cumw`` (strictly-earlier
    / inclusive cumulative mass) and ``w_stratum`` (stratum mass total)
    over the SAME two window specs — the weighted-rank selection
    (smallest value whose cumulative mass share reaches q) reads
    ``cumw / w_stratum`` exactly as the count form reads
    ``cum / n_stratum``.
    """
    if m_col is None:
        if weight_col is not None:
            raise ValueError(
                "hist_cume_counts: weight_col requires pre-folded cells (m_col)"
            )
        hist = df.groupBy(*stratum_cols, value_col).agg(
            F.count(F.lit(1)).alias("m")
        )
    else:
        keep = [F.col(m_col).cast("long").alias("m")]
        if weight_col is not None:
            keep.append(F.col(weight_col).cast("long").alias("wm"))
        hist = df.select(*stratum_cols, value_col, *keep)
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    m_out: Column = F.col("m")
    if m_col is not None:
        # Contract guard: the m_col path trusts that input cells are
        # UNIQUE per (strata, value) — a non-folded frame would produce
        # wrong cumulative sums silently. Detect duplicates with a lag
        # over the SAME partition/order spec as the cumulative windows
        # below (merged into the same physical Window — no extra
        # shuffle) and fail loudly at evaluation time. Folded into the
        # ``m`` output so column pruning cannot drop the check. NULL
        # values pass unconditionally (both disjuncts below — lag's
        # first-row NULL is indistinguishable from a NULL value, and
        # under descending order NULLS sort LAST so a NULL cell's lag is
        # non-null); every current call site feeds non-null histogram
        # values.
        prev = F.lag(F.col(value_col)).over(
            Window.partitionBy(*stratum_cols).orderBy(order)
        )
        guard = F.assert_true(
            prev.isNull()
            | F.col(value_col).isNull()
            | (prev != F.col(value_col)),
            F.lit(
                "hist_cume_counts: m_col requires pre-folded cells — "
                f"duplicate (stratum, {value_col}) cell found"
            ),
        )
        m_out = F.col("m") + F.coalesce(guard.cast("long"), F.lit(0))
    before = (
        Window.partitionBy(*stratum_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    whole = Window.partitionBy(*stratum_cols)
    cols = [
        *stratum_cols,
        value_col,
        m_out.cast("long").alias("m"),
        F.coalesce(F.sum("m").over(before), F.lit(0)).cast("long").alias("cumb"),
        F.sum("m").over(whole).cast("long").alias("n_stratum"),
    ]
    if weight_col is not None:
        # Thread the duplicate-cell guard through ``wm`` too, so a
        # weighted consumer that reads only cumw/w_stratum still
        # evaluates it (weight_col implies m_col, so m_out carries it).
        cols += [
            (m_out - F.col("m") + F.col("wm")).cast("long").alias("wm"),
            F.coalesce(F.sum("wm").over(before), F.lit(0))
            .cast("long")
            .alias("cumwb"),
            F.sum("wm").over(whole).cast("long").alias("w_stratum"),
        ]
    out = hist.select(*cols).withColumn(
        "cum", (F.col("cumb") + F.col("m")).cast("long")
    )
    if weight_col is not None:
        out = out.withColumn("cumw", (F.col("cumwb") + F.col("wm")).cast("long"))
    return out


def hist_disc_percentile(value_col: str, q: float, alias: str) -> Column:
    """Aggregate expression selecting the exact *discrete* percentile
    from ``hist_cume_counts`` output (ascending order): the smallest
    value whose cume_dist = cum/n reaches ``q`` — exactly
    ``MIN(CASE WHEN cume_dist >= q THEN value END)`` over the raw rows,
    because cume_dist at a value's last tied row is cum/n (same exact
    integers, same one IEEE division in both engines). Use inside
    ``hist_cume_counts(...).groupBy(strata).agg(...)``.
    """
    cd = F.col("cum").cast("double") / F.col("n_stratum")
    return F.min(F.when(cd >= q, F.col(value_col))).alias(alias)


def hist_disc_weighted_percentile(value_col: str, q: float, alias: str) -> Column:
    """Weighted companion of :func:`hist_disc_percentile`: the smallest
    value whose cumulative MASS share ``cumw / w_stratum`` reaches ``q``
    (ties block-inclusive — a tie block is a single histogram cell, so
    the histogram cumulative IS the RANGE-framed sum an oracle states
    over raw rows). Reads the ``cumw``/``w_stratum`` columns that
    ``hist_cume_counts(..., weight_col=...)`` adds; same exact int64s,
    same one IEEE division per comparison on both engines.
    """
    md = F.col("cumw").cast("double") / F.col("w_stratum")
    return F.min(F.when(md >= q, F.col(value_col))).alias(alias)


def hist_triangular_cume(
    h: DataFrame,
    value_col: str,
    count_col: str,
    cum_alias: str,
) -> DataFrame:
    """Ascending cumulative of ``count_col`` over ``value_col`` order via
    a broadcast TRIANGULAR self-join over a (persisted, domain-bounded)
    histogram — NOT a global window: an UNPARTITIONED cumulative window
    plans an ``Exchange SinglePartition`` over the keyed aggregate,
    exactly the squeeze the repo-wide plan guard bans, while O(k²) join
    work over a bounded k-row histogram is free at any SF. ``h`` must be
    one row per distinct ``value_col`` (a global histogram); returns
    ``h`` with ``cum_alias`` added (long, inclusive). Callers with a
    STRATIFIED histogram want :func:`hist_cume_counts`' window form
    instead — its partition key makes the window safe.
    """
    prev = h.select(
        F.col(value_col).alias("_tc_v"), F.col(count_col).alias("_tc_n")
    )
    cum = (
        h.join(F.broadcast(prev), F.col("_tc_v") <= F.col(value_col))
        .groupBy(value_col)
        .agg(F.sum("_tc_n").cast("long").alias(cum_alias))
    )
    return h.join(F.broadcast(cum), value_col)


def hist_percent_rank(
    df: DataFrame,
    stratum_cols: list[str],
    value_col: str,
    id_col: str,
    descending: bool = False,
) -> DataFrame:
    """Per-row exact ``percent_rank() OVER (PARTITION BY strata ORDER BY
    value [DESC], id)`` without a per-stratum window: rank = (rows at
    strictly earlier values, from the histogram) + (row_number within
    this value block by id). The only data-scale window is keyed by
    (strata, value) — histogram-cardinality groups whose sizes shrink as
    1/|domain|. Adds ``pr`` (double). percent_rank of a 1-row stratum is
    0.0, matching both engines' convention for (rank-1)/(n-1).

    NULL handling: the histogram join is null-safe, so rows with a NULL
    value (or NULL stratum) are RANKED, not dropped — they sort where
    Spark's own window would put them (NULLS FIRST ascending, NULLS LAST
    descending). Callers pairing this with a DuckDB oracle on nullable
    values must align the oracle's NULL ordering explicitly (DuckDB
    defaults to NULLS LAST ascending); every current call site feeds a
    non-null value_col.
    """
    cume = hist_cume_counts(df, stratum_cols, value_col, descending=descending)
    order = F.col(id_col).asc()
    within = Window.partitionBy(*stratum_cols, value_col).orderBy(order)
    cume_sel = cume.select(
        *[F.col(c).alias(f"_hpr_{c}") for c in stratum_cols],
        F.col(value_col).alias("_hpr_v"),
        "cumb",
        "n_stratum",
    )
    cond = F.col(value_col).eqNullSafe(F.col("_hpr_v"))
    for c in stratum_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_hpr_{c}"))
    joined = df.join(cume_sel, cond).drop(
        "_hpr_v", *[f"_hpr_{c}" for c in stratum_cols]
    )
    rank = F.col("cumb") + F.row_number().over(within)
    pr = F.when(
        F.col("n_stratum") > 1,
        (rank - F.lit(1)).cast("double") / (F.col("n_stratum") - F.lit(1)),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("pr", pr).drop("cumb")


def bucketed_prefix_sum(
    df: DataFrame,
    stratum_cols: list[str],
    order_col: str,
    value_col: Column | str,
    n_buckets: int = PREFIX_SUM_BUCKETS,
    cum_alias: str = "cum",
) -> DataFrame:
    """Exact running sum of ``value_col`` over ``order_col`` order within
    each stratum, two-pass distributed: (1) deterministic contiguous
    range buckets over the GLOBAL order-key span (one 2-value aggregate,
    broadcast — no sampling, so bucket ids are reproducible across runs
    and cluster layouts), (2) per-(stratum, bucket) subtotals and a
    cumulative-offset window over that |strata|×n_buckets table, (3) a
    running-sum window within each (stratum, bucket) — group size
    ~stratum_rows/n_buckets, parallelism scales with the bucket knob
    instead of collapsing to one task per stratum. Integer-exact, so
    bit-identical to the naive single-window form.

    PRECONDITION: ``order_col`` must be unique within each stratum (all
    current call sites order by a unique id or a (ts, id)-derived key).
    With tied order keys the within-bucket ROWS frame assigns tied rows a
    nondeterministic relative order, so their individual ``cum`` values
    are not reproducible (the per-group TOTAL still is); pre-compose a
    unique tiebreak into ``order_col`` if ties are possible.

    The precondition is ENFORCED when ``SPARK_GRAFT_CHECK_PRECONDITIONS``
    is set (tests/conftest.py sets it for every pytest run): one extra
    count-vs-countDistinct aggregate per call, so a violating future call
    site fails loudly in CI instead of shipping silently nondeterministic
    per-row cums. Off by default — production/bench paths pay nothing.

    Adds ``cum_alias`` (inclusive running sum) and keeps all input
    columns; the internal ``_psb`` bucket column is dropped.
    """
    if os.environ.get("SPARK_GRAFT_CHECK_PRECONDITIONS"):
        chk = df.agg(
            F.count(F.lit(1)).alias("_n"),
            F.count_distinct(*[F.col(c) for c in stratum_cols], F.col(order_col))
            .alias("_nd"),
        ).first()
        if chk["_n"] != chk["_nd"]:
            raise ValueError(
                "bucketed_prefix_sum precondition violated: order_col "
                f"{order_col!r} is not unique within strata {stratum_cols} "
                f"(rows={chk['_n']}, distinct keys={chk['_nd']}); per-row "
                "cum values would be nondeterministic — pre-compose a "
                "unique tiebreak into order_col"
            )
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    bounds = df.agg(
        F.min(order_col).cast("long").alias("_lo"),
        F.max(order_col).cast("long").alias("_hi"),
    )
    # Bucket math entirely in DOUBLE: long forms (key - lo, hi - lo + 1)
    # overflow/throw under ANSI for order-key spans near 2^63 (hash-derived
    # keys, microsecond epochs with outliers). (key - lo)/span < 1 up to FP
    # rounding, so floor(ratio * n) <= n - 1 with the least() guard catching
    # the top edge. Bucket ids only need determinism, not integer exactness
    # — IEEE doubles are deterministic.
    span = F.col("_hi").cast("double") - F.col("_lo").cast("double") + F.lit(1.0)
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(order_col).cast("double") - F.col("_lo").cast("double"))
                / span
                * F.lit(float(n_buckets))
            ).cast("int"),
        ),
    )
    b = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_psv", val.cast("long"))
        .withColumn("_psb", bucket)
        .drop("_lo", "_hi")
    )
    subtotals = b.groupBy(*stratum_cols, "_psb").agg(F.sum("_psv").alias("_bsum"))
    off_w = (
        Window.partitionBy(*stratum_cols)
        .orderBy("_psb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subtotals.select(
        *stratum_cols,
        "_psb",
        F.coalesce(F.sum("_bsum").over(off_w), F.lit(0)).alias("_off"),
    )
    run_w = (
        Window.partitionBy(*stratum_cols, "_psb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(offsets), [*stratum_cols, "_psb"])
        .withColumn(cum_alias, (F.col("_off") + F.sum("_psv").over(run_w)).cast("long"))
        .drop("_psb", "_psv", "_off")
    )


def bucketed_prefix_max(
    df: DataFrame,
    stratum_cols: list[str],
    order_col: str,
    value_col: Column | str,
    n_buckets: int = PREFIX_SUM_BUCKETS,
    strict_alias: str = "prefix_max_before",
) -> DataFrame:
    """Exact running max of ``value_col`` over STRICTLY-EARLIER rows in
    ``order_col`` order within each stratum (``stratum_cols`` may be empty
    for a global prefix — the shape a global window would squeeze through
    one task). Same two-pass range-bucket discipline as
    :func:`bucketed_prefix_sum`: deterministic contiguous buckets over the
    global order-key span, a per-(stratum, bucket) max table, cross-bucket
    offsets via a bounded broadcast inequality self-join over the
    |strata|×n_buckets rows (NO global window — a ``rowsBetween`` offset
    window with empty strata would be an ``Exchange SinglePartition`` over
    a keyed aggregate, the exact shape the repo-wide plan guard bans),
    then a strictly-preceding running max within each (stratum, bucket) —
    group size ~stratum_rows/n_buckets, parallelism scales with the
    bucket knob. Max is idempotent/associative on longs, so the result is
    bit-identical to the naive single-window form.

    Ties on ``order_col``: "strictly earlier" means a strictly SMALLER
    order key — equal-key rows do not see each other (the semantics a
    2-D skyline sweep needs: equal-x points must not dominate each other
    through the prefix). Because max is idempotent, tied order keys are
    SAFE here (unlike :func:`bucketed_prefix_sum`'s per-row cum): every
    tied row sees the same strictly-smaller-key prefix regardless of
    physical order. Adds ``strict_alias`` (nullable long: NULL when no
    strictly-earlier row exists) and keeps all input columns.
    """
    val = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "long"
    )
    bounds = df.agg(
        F.min(order_col).cast("long").alias("_lo"),
        F.max(order_col).cast("long").alias("_hi"),
    )
    # Same all-double bucket math as bucketed_prefix_sum (long forms
    # overflow under ANSI on ultra-wide order-key domains).
    span = F.col("_hi").cast("double") - F.col("_lo").cast("double") + F.lit(1.0)
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(order_col).cast("double") - F.col("_lo").cast("double"))
                / span
                * F.lit(float(n_buckets))
            ).cast("int"),
        ),
    )
    b = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_pmv", val)
        .withColumn("_pmb", bucket)
        .drop("_lo", "_hi")
    )
    # Cross-bucket offset = max over ALL strictly-earlier buckets: every
    # order key in an earlier bucket is strictly smaller by range-bucket
    # construction, so bucket k's offset may include the whole of buckets
    # < k without violating "strictly earlier".
    subtotals = b.groupBy(*stratum_cols, "_pmb").agg(F.max("_pmv").alias("_bmax"))
    lhs = subtotals.select(*stratum_cols, "_pmb")
    rhs_cols = [F.col(c).alias(f"_r_{c}") for c in stratum_cols]
    rhs = subtotals.select(*rhs_cols, F.col("_pmb").alias("_rb"), "_bmax")
    cond = F.col("_rb") < F.col("_pmb")
    for c in stratum_cols:
        cond = cond & (F.col(f"_r_{c}") == F.col(c))
    offsets = (
        lhs.join(F.broadcast(rhs), cond, "left")
        .groupBy(*stratum_cols, "_pmb")
        .agg(F.max("_bmax").alias("_off"))
    )
    run_w = (
        Window.partitionBy(*stratum_cols, "_pmb")
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), [*stratum_cols, "_pmb"])
        # greatest() skips NULLs: NULL only when there is no strictly-earlier
        # row in this bucket (window max NULL) AND no earlier bucket (_off
        # NULL from the left join) — i.e. no strictly-earlier row at all.
        .withColumn(
            strict_alias, F.greatest(F.max("_pmv").over(run_w), F.col("_off"))
        )
        .drop("_pmb", "_pmv", "_off")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """``ntile(k)`` bucket from a 1-based rank and the stratum size n —
    the closed form of the window function (first n % k buckets take
    ceil(n/k) rows, the rest floor(n/k)), so a distributed rank can
    replace an ``ntile OVER (PARTITION BY low-card stratum)`` window.
    Integer arithmetic only; matches both engines' ntile exactly.
    """
    q = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    big = (q + 1) * rem  # rows living in the first `rem` (larger) buckets
    return (
        F.when(rank <= big, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((rank - big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("long")
    )


def kth_order_statistic(
    df: DataFrame,
    value_col: str,
    k: int,
    n_buckets: int = PREFIX_SUM_BUCKETS,
) -> int:
    """EXACT k-th smallest value (1-indexed) of an int64 column with an
    UNBOUNDED domain — the primitive the count-value-histogram closed
    forms cannot cover (they need |distinct values| bounded; a
    per-customer monetary sum or a hash-derived key has row-scale
    cardinality).

    Iterative range narrowing: each round buckets the surviving value
    range [lo, hi] into contiguous sub-ranges, folds ONE
    partial-aggregatable count per bucket (a driver-bounded aggregate —
    the only thing the driver ever sees), descends into the bucket
    containing rank k, and rebases k. The branching factor is the larger
    of ``n_buckets`` and the ``_CENSUS_ROW_BUDGET`` (a single task can
    afford the whole budget), so the range shrinks ≥65536× per round and
    rounds ≤ ⌈log₆₅₅₃₆(range)⌉ ≤ 4 for the full int64 span — each a
    filtered scan whose predicate pushes down to the source. The found
    value is branching-invariant, so widening the census changes no
    result. No sort, no single partition, no row-scale collect anywhere:
    the 100 TB cost is ≤4 pushed-filter scans (cache the projected column
    upstream if the source re-scan dominates).

    PRECONDITION: hi − lo must fit int64 (asserted) — true for any
    cents/count/epoch measure; a full-span ±2^63 domain would need the
    double-split bucket math ``bucketed_prefix_sum`` uses.

    Bucket assignment uses SQL ``div`` (exact int64 floor division — both
    operands fit int64 under the span assert), NOT float division: a
    double-rounded ``(v - lo) / width`` mis-buckets values near a bucket
    boundary once the surviving span exceeds 2^53, and the driver's
    range-rebasing math assumes exact integer boundaries (the repo's 2^53
    conversion ceiling applies to any int routed through a double).
    """
    row = df.agg(
        F.min(value_col).cast("long").alias("_lo"),
        F.max(value_col).cast("long").alias("_hi"),
        F.count(value_col).alias("_n"),
    ).first()
    lo, hi, n = row["_lo"], row["_hi"], row["_n"]
    if n == 0:
        raise ValueError("kth_order_statistic: empty input")
    if not 1 <= k <= n:
        raise ValueError(f"kth_order_statistic: k={k} out of range 1..{n}")
    assert hi - lo < 2**62, "value span too wide for integer bucket math"
    v = F.col(value_col).cast("long")
    eff = max(n_buckets, _CENSUS_ROW_BUDGET)  # one task owns the budget
    while lo < hi:
        width = (hi - lo) // eff + 1  # python int: exact, no overflow
        counts = dict(
            df.filter((v >= lo) & (v <= hi))
            .select((v - F.lit(lo)).alias("_d"))
            .groupBy(F.expr(f"_d div {width}").alias("_b"))
            .agg(F.count(F.lit(1)).alias("_m"))
            .collect()
        )
        cum = 0
        for b in range(eff + 1):
            m = counts.get(b, 0)
            if cum + m >= k:
                k -= cum
                lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
                break
            cum += m
        else:  # pragma: no cover - unreachable when k <= n
            raise AssertionError("rank k not found in bucket census")
    return int(lo)


def kth_order_statistics(
    df: DataFrame,
    value_col: str,
    qs: "dict[str, float]",
    n_buckets: int = PREFIX_SUM_BUCKETS,
) -> "dict[str, int]":
    """GLOBAL multi-rank exact order statistics: every quantile in ``qs``
    ({label: q}, rank = max(1, ⌈q·n⌉) over the column's non-null count)
    narrows through ONE census sequence — one scan per round for ALL
    quantiles, where a per-quantile :func:`kth_order_statistic` loop pays
    one sequence each. Implemented as :func:`kth_order_statistics_by`
    over a constant stratum; returns {label: value}. The value column
    must be non-null by construction for the internal F.count(v) to equal
    a caller's own row count (every current call site feeds counts,
    cents or epoch days). Raises ValueError on an empty (or all-null)
    input — the scalar narrower's contract — instead of leaking the
    stratified form's empty dict as an opaque KeyError."""
    tagged = df.select(F.lit(1).alias("_g"), value_col)
    out = kth_order_statistics_by(
        tagged, "_g", value_col, q=qs, n_buckets=n_buckets
    )
    if not out:
        raise ValueError(
            f"kth_order_statistics: empty input (no non-null {value_col!r} "
            "values)"
        )
    return out[1]


def quintile_thresholds(
    df: DataFrame,
    cols: "list[str]",
    n_buckets: int = PREFIX_SUM_BUCKETS,
) -> "dict[str, list[int]]":
    """Four quintile cut points per column — rank max(1, ⌈k/5·n⌉) for
    k = 1..4, with q = k/5.0 the same IEEE multiply the consuming
    oracles state — every column's four ranks riding ONE multi-rank
    census sequence (:func:`kth_order_statistics`). The shared
    threshold derivation of the migration / cross-dimension matrix
    family (it was restated per query before round 14's review pass).
    Returns {col: [t1, t2, t3, t4]}.

    Input columns must be INTEGRAL (byte/short/int/long) — the shared
    unpivot casts every cell to long, so a fractional column would be
    silently truncated before ranking; asserted loudly here instead
    (round-15 advice item). Every current call site feeds int64
    cents/counts/days."""
    qs = {str(k): k / 5.0 for k in (1, 2, 3, 4)}
    integral = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(df.dtypes)
    absent = [c for c in cols if c not in dtypes]
    if absent:
        # Distinguish a typo'd column from a genuinely fractional one —
        # the truncation message would misdiagnose it.
        raise ValueError(
            f"quintile_thresholds: column(s) not in frame: {absent} "
            f"(have: {sorted(dtypes)})"
        )
    bad = [f"{c}:{dtypes[c]}" for c in cols if dtypes[c] not in integral]
    if bad:
        raise TypeError(
            "quintile_thresholds: non-integral column(s) would be "
            f"truncated by the long cast: {bad} (cast explicitly upstream "
            "if truncation is intended)"
        )
    # ALL columns share ONE stratified census sequence: unpivot to
    # (_qt_col, _qt_v) cells and narrow keyed by the column tag — one
    # scan per round for every (column, quantile) task, where a
    # per-column kth_order_statistics loop paid one sequence each
    # (round-14 advice item). Each column's ranks derive from its OWN
    # non-null count (the stratified narrower counts per stratum), so
    # results are value-identical to the per-column form.
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_qt_col"),
                        F.col(c).cast("long").alias("_qt_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_qt")
    ).select("_qt._qt_col", "_qt._qt_v")
    ranks = kth_order_statistics_by(
        tagged, "_qt_col", "_qt_v", q=qs, n_buckets=n_buckets
    )
    missing = [c for c in cols if c not in ranks]
    if missing:
        raise ValueError(
            f"quintile_thresholds: empty input (no non-null values) for "
            f"column(s) {missing}"
        )
    return {c: [ranks[c][str(k)] for k in (1, 2, 3, 4)] for c in cols}


def quintile_ladder(col: str, thresholds: "list[int]") -> Column:
    """``1 + Σₖ (value > tₖ)`` — the strict-greater, VALUE-based quintile
    assignment (long, 1..5) every matrix oracle states as a CASE ladder
    against the four literal thresholds; ties share a quintile by
    construction, never split by engine row order."""
    q = F.lit(1)
    for t in thresholds:
        q = q + F.when(F.col(col) > F.lit(t), 1).otherwise(0)
    return q.cast("long")


def kth_order_statistics_by(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    k_of: "dict | None" = None,
    q: "float | dict[str, float] | None" = None,
    n_buckets: int = PREFIX_SUM_BUCKETS,
) -> dict:
    """STRATIFIED exact k-th order statistics: for every stratum value,
    the k-th smallest of an int64 column with an UNBOUNDED domain —
    `kth_order_statistic` generalized so ALL strata narrow together, ONE
    Spark job per round (a (stratum, bucket) census bounded by
    max(|tasks|·(n_buckets+1), _CENSUS_ROW_BUDGET + |tasks|) rows — the
    row budget is split across live tasks, so few tasks get a wide
    branching and few rounds while many tasks keep the 32-way floor),
    not one loop per stratum. Pass either ``k_of`` (stratum →
    explicit rank) or ``q`` (each stratum's rank = max(1, ⌈q·n_s⌉) — the
    percentile_disc rank, computed with the same IEEE multiply an oracle
    states). Returns {stratum: value}.

    MULTI-RANK: ``q`` may be a dict {label: quantile} — every (stratum,
    label) narrowing task then advances through the SAME census sequence
    (each round's census carries one row-range per active task; a fact
    row falling in several tasks' surviving ranges is counted once per
    task by the broadcast range join), so a p50+p90 report pays ONE scan
    per round instead of one per quantile. Returns {stratum: {label:
    value}}. Ranks within a stratum derive from the same n_s, so the
    scalar and multi forms are value-identical per quantile.

    PRECONDITION: the stratum column must be driver-small (event types,
    priorities, nations — the census collect is |strata|-bounded;
    asserted ≤ 10_000). The VALUE domain needs no bound — that is the
    point. Rounds ≤ ⌈log_{n_buckets}(max stratum range)⌉; each is one
    pushed-filter scan of the (stratum, value) projection (cache it
    upstream when the source re-scan dominates).

    NULL handling: rows whose VALUE is null are excluded from every
    stratum's count/rank (``F.count(v)`` semantics — callers pairing this
    with a count(*) oracle must filter nulls or state a non-null
    premise); an all-null stratum is skipped. A NULL STRATUM KEY raises
    ValueError — the census equi-join can never match it, so admitting it
    would fail rounds later as an opaque rank-not-found assertion.

    Bucket ids use SQL ``div`` (exact int64 floor division), not float
    division — see :func:`kth_order_statistic`.
    """
    import math

    assert (k_of is None) != (q is None), "pass exactly one of k_of / q"
    multi = isinstance(q, dict)
    labels = q if multi else {"_": q}
    v = F.col(value_col).cast("long")
    s = F.col(stratum_col)
    init = {
        r["_s"]: (r["_lo"], r["_hi"], r["_n"])
        for r in df.groupBy(s.alias("_s")).agg(
            F.min(v).alias("_lo"), F.max(v).alias("_hi"), F.count(v).alias("_n")
        ).collect()
    }
    assert len(init) <= 10_000, "stratum cardinality too high for the census"
    if None in init:
        raise ValueError(
            "kth_order_statistics_by: NULL stratum key present — the census "
            "join cannot match it; filter null strata (or impute a sentinel) "
            "before calling"
        )
    # Narrowing tasks keyed by (stratum, label): the scalar q / k_of forms
    # are the single-label ("_") case of the same loop.
    active: dict = {}
    for st, (lo, hi, n) in init.items():
        if n == 0:
            continue
        assert hi - lo < 2**62, "value span too wide for integer bucket math"
        for lbl, ql in labels.items():
            k = k_of[st] if k_of is not None else max(1, math.ceil(ql * n))
            if not 1 <= k <= n:
                raise ValueError(
                    f"rank {k} out of range 1..{n} for stratum {st!r}"
                )
            active[(st, lbl)] = (lo, hi, k)
    done: dict = {}
    spark = df.sparkSession
    while active:
        for key in [k_ for k_, (lo, hi, _k) in active.items() if lo == hi]:
            done[key] = int(active.pop(key)[0])
        if not active:
            break
        # Split the census row budget across the active tasks: fewer live
        # tasks → wider branching → fewer rounds (each round is one full
        # scan of the projection at scale). Value-identical at any width.
        eff = max(n_buckets, _CENSUS_ROW_BUDGET // len(active))
        ranges = spark.createDataFrame(
            [
                (st, lbl, lo, hi, (hi - lo) // eff + 1)
                for (st, lbl), (lo, hi, _k) in active.items()
            ],
            f"_s {df.schema[stratum_col].dataType.simpleString()}, "
            "_l string, _lo long, _hi long, _w long",
        )
        counts: dict = {}
        rows = (
            df.join(F.broadcast(ranges), s == F.col("_s"))
            .filter((v >= F.col("_lo")) & (v <= F.col("_hi")))
            .withColumn("_d", v - F.col("_lo"))
            .groupBy(F.col("_s"), F.col("_l"), F.expr("_d div _w").alias("_b"))
            .agg(F.count(F.lit(1)).alias("_m"))
            .collect()
        )
        for r in rows:
            counts[(r["_s"], r["_l"], r["_b"])] = r["_m"]
        nxt: dict = {}
        for (st, lbl), (lo, hi, k) in active.items():
            width = (hi - lo) // eff + 1
            cum = 0
            for b in range(eff + 1):
                m = counts.get((st, lbl, b), 0)
                if cum + m >= k:
                    nxt[(st, lbl)] = (
                        lo + b * width,
                        min(hi, lo + (b + 1) * width - 1),
                        k - cum,
                    )
                    break
                cum += m
            else:  # pragma: no cover - unreachable when k <= n_s
                raise AssertionError(f"rank not found for stratum {st!r}")
        active = nxt
    if multi:
        out: dict = {}
        for (st, lbl), val in done.items():
            out.setdefault(st, {})[lbl] = val
        return out
    return {st: val for (st, _lbl), val in done.items()}
