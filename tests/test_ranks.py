"""functions/ranks.py — the scale-safe exact rank/percentile/prefix-sum
building blocks must be BIT-IDENTICAL to the naive per-stratum window
forms they replace (the round-9 rewrite's correctness contract), across
ties, single-row strata, empty inputs, and hostile bucket counts."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from mapreduce_infrastructure_spark.functions.ranks import (
    bucketed_prefix_sum,
    hist_cume_counts,
    hist_disc_percentile,
    hist_percent_rank,
    ntile_from_rank,
)


def _fixture(spark, seed_rows):
    return spark.createDataFrame(seed_rows, "stratum string, id long, v long")


def _rows(seed=0):
    """Deterministic synthetic strata with heavy ties, a singleton stratum
    and skewed sizes (no RNG — content-addressed like the house style)."""
    rows = []
    rid = 0
    for s, n in (("a", 37), ("b", 11), ("c", 1), ("d", 101)):
        for i in range(n):
            # many ties: v cycles through a small domain, offset per stratum
            rows.append((s, rid, (i * i + seed) % 7))
            rid += 1
    return rows


def test_hist_percent_rank_matches_window_percent_rank(spark):
    df = _fixture(spark, _rows())
    for desc in (False, True):
        order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
        w = Window.partitionBy("stratum").orderBy(*order)
        naive = {
            (r.stratum, r.id): r.pr
            for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
        }
        fast = {
            (r.stratum, r.id): r.pr
            for r in hist_percent_rank(
                df, ["stratum"], "v", "id", descending=desc
            ).collect()
        }
        assert fast == naive  # bit-identical, including the n=1 stratum -> 0.0


def test_hist_disc_percentile_matches_cume_dist_selection(spark):
    df = _fixture(spark, _rows(seed=3))
    w = Window.partitionBy("stratum").orderBy("v", "id")
    naive = (
        df.withColumn("cd", F.cume_dist().over(w))
        .groupBy("stratum")
        .agg(
            *[
                F.min(F.when(F.col("cd") >= q, F.col("v"))).alias(f"p{int(q*100)}")
                for q in (0.05, 0.5, 0.95, 0.99)
            ]
        )
    )
    cume = hist_cume_counts(df, ["stratum"], "v")
    fast = cume.groupBy("stratum").agg(
        *[
            hist_disc_percentile("v", q, f"p{int(q*100)}")
            for q in (0.05, 0.5, 0.95, 0.99)
        ]
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


@pytest.mark.parametrize("n_buckets", [1, 2, 7, 32, 1000])
def test_bucketed_prefix_sum_matches_window_cumsum(spark, n_buckets):
    df = _fixture(spark, _rows(seed=5))
    w = (
        Window.partitionBy("stratum")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r.stratum, r.id): r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    fast = {
        (r.stratum, r.id): r.cum
        for r in bucketed_prefix_sum(
            df, ["stratum"], "id", "v", n_buckets=n_buckets
        ).collect()
    }
    assert fast == naive


def test_bucketed_prefix_sum_empty_input(spark):
    df = _fixture(spark, []).limit(0)
    assert bucketed_prefix_sum(df, ["stratum"], "id", "v").count() == 0


def test_bucketed_prefix_sum_rejects_tied_order_keys(spark, monkeypatch):
    """ADVICE r10: the order-key uniqueness PRECONDITION was
    documentation-only; with SPARK_GRAFT_CHECK_PRECONDITIONS set
    (conftest sets it for every pytest run) a tied-key call site now
    fails loudly instead of producing silently nondeterministic per-row
    cums."""
    monkeypatch.setenv("SPARK_GRAFT_CHECK_PRECONDITIONS", "1")
    df = _fixture(
        spark,
        [("a", 1, 10), ("a", 1, 20), ("a", 2, 5)],  # tied id=1 in stratum a
    )
    with pytest.raises(ValueError, match="not unique within strata"):
        bucketed_prefix_sum(df, ["stratum"], "id", "v")
    # Same keys tied ACROSS strata are fine — uniqueness is per-stratum.
    ok = _fixture(spark, [("a", 1, 10), ("b", 1, 20), ("a", 2, 5)])
    assert bucketed_prefix_sum(ok, ["stratum"], "id", "v").count() == 3


@pytest.mark.parametrize("k", [1, 2, 4, 7, 10])
def test_ntile_from_rank_matches_window_ntile(spark, k):
    df = _fixture(spark, _rows(seed=9))
    w = Window.partitionBy("stratum").orderBy("id")
    naive = {
        (r.stratum, r.id): r.t
        for r in df.withColumn("t", F.ntile(k).over(w).cast("long")).collect()
    }
    sizes = df.groupBy("stratum").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .join(sizes, "stratum")
        .withColumn("t", ntile_from_rank(F.col("rank"), F.col("n"), k))
    )
    fast = {(r.stratum, r.id): r.t for r in ranked.collect()}
    assert fast == naive


def test_bucketed_prefix_sum_plan_has_no_low_card_stratum_window(spark):
    """The whole point: the replacement's own plan must pass the guard
    that bans the shape it replaces (the offset window's input is the
    |strata|x|buckets| subtotal aggregate — exempt by the histogram
    rule), and parallelism must exceed the stratum count (the window
    keys include the bucket id)."""
    from mapreduce_infrastructure_spark.plans import checks

    df = _fixture(spark, _rows()).withColumnRenamed("stratum", "lang")
    out = bucketed_prefix_sum(df, ["lang"], "id", "v")
    assert not checks.low_card_stratum_windows(checks.explain_str(out, "simple"))


@pytest.mark.parametrize("n_buckets", [1, 2, 7, 32, 1000])
def test_bucketed_prefix_max_matches_strict_window_max(spark, n_buckets):
    """Strictly-earlier running max (the 2-D skyline sweep's prefix), with
    heavy ORDER-KEY ties: the naive form is a rangeBetween(-inf, -1)
    window, which equal-key rows must not see each other through."""
    from mapreduce_infrastructure_spark.functions.ranks import bucketed_prefix_max

    # order key = v (heavily tied), value = id (distinct): exercises ties
    df = _fixture(spark, _rows(seed=7))
    w = (
        Window.partitionBy("stratum")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    naive = {
        (r.stratum, r.id): r.pm
        for r in df.withColumn("pm", F.max("id").over(w)).collect()
    }
    fast = {
        (r.stratum, r.id): r.prefix_max_before
        for r in bucketed_prefix_max(
            df, ["stratum"], "v", "id", n_buckets=n_buckets
        ).collect()
    }
    assert fast == naive  # includes NULL for each stratum's smallest-v ties


@pytest.mark.parametrize("n_buckets", [1, 3, 32])
def test_bucketed_prefix_max_global_no_strata(spark, n_buckets):
    """Empty stratum list = a GLOBAL strict prefix max with no
    single-partition window (the global-window replacement), and the plan
    must carry no unbounded Exchange SinglePartition."""
    from mapreduce_infrastructure_spark.functions.ranks import bucketed_prefix_max
    from mapreduce_infrastructure_spark.plans import checks

    df = _fixture(spark, _rows(seed=11))
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, -1)
    naive = {
        r.id: r.pm for r in df.withColumn("pm", F.max("id").over(w)).collect()
    }
    out = bucketed_prefix_max(df, [], "v", "id", n_buckets=n_buckets)
    fast = {r.id: r.prefix_max_before for r in out.collect()}
    assert fast == naive
    bad = checks.single_partition_squeezes(checks.explain_str(out, "simple"))
    assert not bad, bad


def test_bucketed_prefix_max_empty_input(spark):
    from mapreduce_infrastructure_spark.functions.ranks import bucketed_prefix_max

    df = _fixture(spark, []).limit(0)
    assert bucketed_prefix_max(df, [], "v", "id").count() == 0


def test_hist_percent_rank_ranks_null_values_instead_of_dropping(spark):
    """Round-10 advice fix: the histogram join is null-safe, so rows with
    a NULL ranking statistic are RANKED (where Spark's own window puts
    them: NULLS FIRST asc / NULLS LAST desc), never silently dropped."""
    rows = [("a", 0, 5), ("a", 1, None), ("a", 2, 3), ("a", 3, None), ("b", 4, 1)]
    df = spark.createDataFrame(rows, "stratum string, id long, v long")
    for desc in (False, True):
        order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
        w = Window.partitionBy("stratum").orderBy(*order)
        naive = {
            (r.stratum, r.id): r.pr
            for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
        }
        out = hist_percent_rank(df, ["stratum"], "v", "id", descending=desc)
        fast = {(r.stratum, r.id): r.pr for r in out.collect()}
        assert len(fast) == len(rows)  # nothing dropped
        assert fast == naive


@pytest.mark.parametrize("fn_name", ["sum", "max"])
def test_bucketed_prefix_ultra_wide_order_domain(spark, fn_name):
    """Round-10 advice fix: bucket math runs in double, so an order-key
    domain wider than 2^63/n_buckets (hash-derived keys) must not wrap
    into negative buckets; results stay identical to the naive window."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        bucketed_prefix_max,
        bucketed_prefix_sum,
    )

    big = 2**62
    # NOTE: keys must be unique — the original fixture's i=4 first-batch key
    # (-2^62 + 4·2^61 = 2^62) collided with the second batch's (big - 0),
    # giving those two rows nondeterministic per-row cums; the new
    # precondition guard caught it. Offset the second batch by 1.
    rows = [
        ("a", -big + i * (big // 2), i + 1) for i in range(5)
    ] + [("a", big - 1 - i, 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "stratum string, k long, v long")
    if fn_name == "sum":
        w = (
            Window.partitionBy("stratum")
            .orderBy("k")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        naive = {r.k: r.c for r in df.withColumn("c", F.sum("v").over(w)).collect()}
        out = bucketed_prefix_sum(df, ["stratum"], "k", "v", n_buckets=32)
        fast = {r.k: r.cum for r in out.collect()}
    else:
        w = (
            Window.partitionBy("stratum")
            .orderBy("k")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        naive = {r.k: r.m for r in df.withColumn("m", F.max("v").over(w)).collect()}
        out = bucketed_prefix_max(df, ["stratum"], "k", "v", n_buckets=32)
        fast = {r.k: r.prefix_max_before for r in out.collect()}
    assert fast == naive


def test_kth_order_statistic_matches_sorted_reference(spark):
    """Property: the iterative range-narrowing k-th order statistic
    equals sorted()[k-1] for adversarial value sets — duplicates, negative
    values, wide gaps, singleton ranges — at several k per set."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistic,
    )

    cases = [
        [5],
        [3, 3, 3, 3],
        [-7, -7, 0, 1, 2**40, 2**40, 2**40 + 1],
        list(range(100)) + [50] * 17 + [-1000] * 5,
        [(i * i * 2654435761) % 100003 - 50000 for i in range(500)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        ref = sorted(vals)
        n = len(vals)
        for k in {1, max(1, n // 4), max(1, n // 2), n}:
            assert kth_order_statistic(df, "v", k) == ref[k - 1], (vals, k)


def test_kth_order_statistic_rejects_bad_k_and_empty(spark):
    import pytest as _pytest

    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistic,
    )

    df = spark.createDataFrame([(1,), (2,)], "v long")
    with _pytest.raises(ValueError, match="out of range"):
        kth_order_statistic(df, "v", 3)
    with _pytest.raises(ValueError, match="empty"):
        kth_order_statistic(df.limit(0), "v", 1)


@pytest.mark.parametrize("n_buckets", [2, 32, 256])
def test_kth_order_statistics_by_matches_sorted_reference(spark, n_buckets):
    """Stratified narrowing vs per-stratum sorted(): explicit ranks and
    the q-derived percentile_disc ranks, across skewed stratum sizes,
    duplicates, negatives and wide gaps."""
    import math

    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics_by,
    )

    data = {
        "a": [5, 5, 5, -2, 2**41, 0, 7],
        "b": [1],
        "c": [(i * 2654435761) % 9973 - 5000 for i in range(200)],
    }
    rows = [(s, v) for s, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "s string, v long")
    ks = {s: max(1, len(vs) // 2) for s, vs in data.items()}
    got = kth_order_statistics_by(df, "s", "v", k_of=ks, n_buckets=n_buckets)
    assert got == {s: sorted(vs)[ks[s] - 1] for s, vs in data.items()}
    for q in (0.5, 0.95):
        got_q = kth_order_statistics_by(df, "s", "v", q=q, n_buckets=n_buckets)
        want_q = {
            s: sorted(vs)[max(1, math.ceil(q * len(vs))) - 1]
            for s, vs in data.items()
        }
        assert got_q == want_q


def test_kth_order_statistics_by_rejects_bad_rank(spark):
    import pytest as _pytest

    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics_by,
    )

    df = spark.createDataFrame([("a", 1), ("a", 2)], "s string, v long")
    with _pytest.raises(ValueError, match="out of range"):
        kth_order_statistics_by(df, "s", "v", k_of={"a": 3})


# Real counterexample to the pre-round-12 FLOAT bucket assignment
# cast(double(v-lo)/double(width) as long): at this 2^58 span the rounded
# numerator/width quotient crosses a bucket boundary, the census assigns a
# value to the wrong bucket, the narrowed range excludes it, and the
# driver loop dies with "rank k not found" at k=3 (found by randomized
# search, reproduced in a pure-python simulation of the old loop; the
# exact-int64 `div` form returns sorted()[k-1] for every k).
_WIDE_SPAN_VALS = [
    -855388833839009651,
    -1022437509969847416,
    -1017217238840758736,
    -985895612066226650,
    -975455069808049286,
    -954573985291694563,
    -860609104968098306,
]


def test_kth_order_statistic_exact_beyond_2pow53(spark):
    """Regression (round-12 ADVICE medium): bucket assignment must use
    exact int64 floor division — the float form violated the repo's 2^53
    conversion ceiling for spans the 2^62 precondition admits."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistic,
    )

    df = spark.createDataFrame([(v,) for v in _WIDE_SPAN_VALS], "v long")
    ref = sorted(_WIDE_SPAN_VALS)
    for k in range(1, len(ref) + 1):
        assert kth_order_statistic(df, "v", k) == ref[k - 1]


def test_kth_order_statistics_by_exact_beyond_2pow53(spark):
    """Stratified twin of the 2^53 regression: the same wide-span stratum
    narrows alongside a boundary-heavy positive-span one."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics_by,
    )

    data = {
        "x": _WIDE_SPAN_VALS,
        "y": [-(2**55), 7 * (2**50 + 3), 2**55, 2**55 + 1],
    }
    rows = [(s, v) for s, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "s string, v long")
    for ks in ({"x": 3, "y": 2}, {"x": 1, "y": 4}, {"x": 7, "y": 1}):
        got = kth_order_statistics_by(df, "s", "v", k_of=ks)
        assert got == {s: sorted(vs)[ks[s] - 1] for s, vs in data.items()}


def test_kth_order_statistics_by_rejects_null_stratum(spark):
    """A NULL stratum key can never match the census equi-join; the call
    must fail fast with a named error, not rounds later as an opaque
    rank-not-found assertion."""
    import pytest as _pytest

    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics_by,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 5)], "s string, v long"
    )
    with _pytest.raises(ValueError, match="NULL stratum"):
        kth_order_statistics_by(df, "s", "v", q=0.5)


def test_kth_order_statistics_by_skips_all_null_value_stratum(spark):
    """All-null-value strata drop out (count(v)=0) instead of raising;
    null values never count toward any rank."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics_by,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], "s string, v long"
    )
    assert kth_order_statistics_by(df, "s", "v", q=0.5) == {"a": 1}


def test_hist_cume_counts_prefolded_cells_match_unfolded(spark):
    """m_col: pre-folded histogram cells (the streaming sinks' shape)
    must yield the exact rows the internal count fold produces."""
    df = _fixture(spark, _rows(seed=7))
    cells = df.groupBy("stratum", "v").agg(F.count(F.lit(1)).alias("n_cell"))
    cols = ["stratum", "v", "m", "cumb", "n_stratum", "cum"]
    a = sorted(map(tuple, hist_cume_counts(df, ["stratum"], "v").select(cols).collect()))
    b = sorted(
        map(
            tuple,
            hist_cume_counts(cells, ["stratum"], "v", m_col="n_cell")
            .select(cols)
            .collect(),
        )
    )
    assert a == b


def test_hist_cume_counts_weight_col_matches_range_window(spark):
    """weight_col: cumw / w_stratum must equal the RANGE-framed window
    sums over raw rows an oracle states (ties block-inclusive), and the
    weighted percentile selector must match the naive selection."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        hist_disc_weighted_percentile,
    )

    rows = [(s, i, v, v * 3 + 1) for s, i, v in _rows(seed=11)]
    df = spark.createDataFrame(rows, "stratum string, id long, v long, w long")
    rng = (
        Window.partitionBy("stratum")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy("stratum")
    naive = (
        df.select(
            "stratum",
            "v",
            F.sum("w").over(rng).alias("cumw"),
            F.sum("w").over(whole).alias("w_stratum"),
        )
        .distinct()
    )
    cells = df.groupBy("stratum", "v").agg(
        F.count(F.lit(1)).alias("m"), F.sum("w").alias("wm")
    )
    fast = hist_cume_counts(cells, ["stratum"], "v", m_col="m", weight_col="wm")
    key_cols = ["stratum", "v", "cumw", "w_stratum"]
    assert sorted(map(tuple, fast.select(key_cols).collect())) == sorted(
        map(tuple, naive.collect())
    )
    # Weighted percentile selection vs the naive cumulative-share form.
    naive_sel = (
        naive.withColumn("md", F.col("cumw").cast("double") / F.col("w_stratum"))
        .groupBy("stratum")
        .agg(
            *[
                F.min(F.when(F.col("md") >= q, F.col("v"))).alias(f"w{int(q*100)}")
                for q in (0.5, 0.9)
            ]
        )
    )
    fast_sel = fast.groupBy("stratum").agg(
        *[
            hist_disc_weighted_percentile("v", q, f"w{int(q*100)}")
            for q in (0.5, 0.9)
        ]
    )
    assert sorted(map(tuple, fast_sel.collect())) == sorted(
        map(tuple, naive_sel.collect())
    )


def test_hist_triangular_cume_matches_window_cumsum(spark):
    """The broadcast triangular cumulative over a global histogram must
    equal the naive unpartitioned window cumsum (computed in python —
    the engine-side global window is exactly what the helper avoids)."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        hist_triangular_cume,
    )

    h_rows = [(v, (v * 7) % 13 + 1) for v in (2, 3, 5, 8, 13, 21, 34)]
    h = spark.createDataFrame(h_rows, "val long, n long")
    got = {
        r["val"]: r["cum"]
        for r in hist_triangular_cume(h, "val", "n", "cum").collect()
    }
    cum = 0
    want = {}
    for v, n in sorted(h_rows):
        cum += n
        want[v] = cum
    assert got == want


@pytest.mark.parametrize("n_buckets", [7, 256])
def test_kth_order_statistics_by_multi_matches_scalar(spark, n_buckets):
    """Multi-rank narrowing (one census sequence for all quantiles) must
    be value-identical to the scalar per-quantile calls."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics_by,
    )

    data = {
        "a": [5, 5, 5, -2, 2**41, 0, 7],
        "b": [1],
        "c": [(i * 2654435761) % 9973 - 5000 for i in range(200)],
    }
    rows = [(s, v) for s, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "s string, v long")
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    multi = kth_order_statistics_by(df, "s", "v", q=qs, n_buckets=n_buckets)
    for lbl, q in qs.items():
        scalar = kth_order_statistics_by(df, "s", "v", q=q, n_buckets=n_buckets)
        assert {s: multi[s][lbl] for s in multi} == scalar


def test_kth_order_statistics_global_empty_raises_and_matches(spark):
    """The global multi-rank wrapper must (a) equal per-quantile sorted()
    selection, (b) raise the scalar narrower's descriptive ValueError on
    empty/all-null input instead of an opaque KeyError."""
    import math

    from mapreduce_infrastructure_spark.functions.ranks import (
        kth_order_statistics,
    )

    vals = [(v,) for v in [5, 5, -2, 2**41, 0, 7, 3]]
    df = spark.createDataFrame(vals, "v long")
    got = kth_order_statistics(df, "v", {"p50": 0.5, "p95": 0.95})
    s = sorted(v for (v,) in vals)
    want = {
        lbl: s[max(1, math.ceil(q * len(s))) - 1]
        for lbl, q in (("p50", 0.5), ("p95", 0.95))
    }
    assert got == want
    empty = df.limit(0)
    with pytest.raises(ValueError, match="empty input"):
        kth_order_statistics(empty, "v", {"p50": 0.5})


def test_quintile_helpers_match_sorted_reference(spark):
    """quintile_thresholds = max(1, ceil(k/5·n)) cut points per column;
    quintile_ladder = 1 + strict-greater CASE count — together they must
    reproduce a python quintile assignment, ties sharing a bucket."""
    import math

    from mapreduce_infrastructure_spark.functions.ranks import (
        quintile_ladder,
        quintile_thresholds,
    )

    vals = [(i, (i * 37) % 11, (i * 13) % 7) for i in range(23)]
    df = spark.createDataFrame(vals, "id long, a long, b long")
    th = quintile_thresholds(df, ["a", "b"])
    for col_idx, col in ((1, "a"), (2, "b")):
        s = sorted(r[col_idx] for r in vals)
        want_th = [s[max(1, math.ceil(k / 5.0 * len(s))) - 1] for k in (1, 2, 3, 4)]
        assert th[col] == want_th
    got = {
        r.id: (r.qa, r.qb)
        for r in df.select(
            "id",
            quintile_ladder("a", th["a"]).alias("qa"),
            quintile_ladder("b", th["b"]).alias("qb"),
        ).collect()
    }
    for i, a, b in vals:
        want = tuple(
            1 + sum(1 for t in th[c] if v > t)
            for c, v in (("a", a), ("b", b))
        )
        assert got[i] == want
        assert all(1 <= q <= 5 for q in got[i])


def test_hist_cume_counts_m_col_rejects_duplicate_cells(spark):
    """m_col path contract guard (round-14 advice): a NON-folded frame
    (duplicate (stratum, value) cells) must fail loudly at evaluation
    time instead of silently producing wrong cumulative sums. The guard
    is threaded through the m and wm outputs, so any consumer of
    m/cum/cumw trips it."""
    dup = spark.createDataFrame(
        [("a", 1, 2), ("a", 1, 3), ("a", 2, 1)], "stratum string, v long, n long"
    )
    with pytest.raises(Exception, match="pre-folded"):
        hist_cume_counts(dup, ["stratum"], "v", m_col="n").select("cum").collect()
    uniq = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 3), ("a", 2, 1)], "stratum string, v long, n long"
    )
    got = {
        (r["stratum"], r["v"]): (r["m"], r["cum"])
        for r in hist_cume_counts(uniq, ["stratum"], "v", m_col="n").collect()
    }
    assert got == {("a", 1): (2, 2), ("a", 2): (1, 3), ("b", 1): (3, 3)}


def test_hist_cume_counts_weight_col_requires_m_col(spark):
    """weight_col without m_col is a caller-contract violation — a
    ValueError (not a bare assert: must survive python -O)."""
    df = spark.createDataFrame([("a", 1)], "stratum string, v long")
    with pytest.raises(ValueError, match="weight_col requires"):
        hist_cume_counts(df, ["stratum"], "v", weight_col="v")


def test_quintile_thresholds_empty_input_raises(spark):
    """The shared-census unpivot form must keep the per-column
    ValueError-on-empty contract (an all-null column has no ranks)."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        quintile_thresholds,
    )

    df = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError, match="empty input"):
        quintile_thresholds(df, ["a", "b"])


def test_quintile_thresholds_rejects_fractional_columns(spark):
    """Round-15 advice item: the shared unpivot casts cells to long, so
    a double column must be rejected loudly instead of silently
    truncating before ranking (int columns still pass)."""
    from mapreduce_infrastructure_spark.functions.ranks import (
        quintile_thresholds,
    )

    df = spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "a long, b double"
    )
    with pytest.raises(TypeError, match="non-integral"):
        quintile_thresholds(df, ["a", "b"])
    # An all-integral request on the same frame is unaffected.
    assert quintile_thresholds(df, ["a"])["a"] == [1, 1, 2, 2]


def test_hist_cume_counts_m_col_null_value_passes_descending(spark):
    """Round-15 review regression: the duplicate-cell guard must NOT
    fire on a NULL histogram value under descending order (NULLS sort
    LAST there, so lag(prev) is non-null and a naive prev != value is
    NULL) — NULL values pass unconditionally per the docstring."""
    df = spark.createDataFrame(
        [("a", 1, 2), ("a", 2, 3), ("a", None, 1)],
        "stratum string, v long, n long",
    )
    for desc in (True, False):
        rows = hist_cume_counts(
            df, ["stratum"], "v", m_col="n", descending=desc
        ).collect()
        assert len(rows) == 3
