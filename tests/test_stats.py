"""Bounds for the approximate statistics tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_infrastructure_spark.catalog import load_table
from mapreduce_infrastructure_spark.operators.stats import approx_percentiles_price


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    got = {r.o_orderpriority: r for r in approx_percentiles_price(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for k, e in exact.items():
        g = got[k]
        for p in ("p50", "p95"):
            rel = abs(getattr(g, p) - getattr(e, p)) / max(getattr(e, p), 1e-9)
            assert rel < 0.02, f"{k}.{p}: approx={getattr(g, p)} exact={getattr(e, p)}"


def test_merge_upsert_semantics(spark, sf_dir):
    """MERGE must behave row-accurately: deleted keys absent, updated
    balances = old + value (2dp), inserts present exactly for unmatched
    upsert keys, untouched base rows byte-identical."""
    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.relational import (
        merge_upsert_customers,
    )
    from pyspark.sql import Window, functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = {
        r.key: (r.event_type, r.value)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select((F.col("user_id") * 11).alias("key"), "event_type", "value")
        .collect()
    }
    base = {
        r.c_custkey: (r.c_name, r.c_acctbal)
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .collect()
    }
    got = {
        r.c_custkey: (r.c_name, r.c_acctbal)
        for r in merge_upsert_customers(spark, sf_dir).collect()
    }

    import math

    def r2(x):
        return math.floor(x * 100 + 0.5) / 100

    for key, (etype, value) in latest.items():
        if etype == "error":
            assert key not in got, key  # matched delete gone, no-op delete absent
        elif key in base:
            assert got[key] == (base[key][0], r2(base[key][1] + value)), key
        else:
            assert got[key] == (f"cdc-{key}", r2(value)), key  # insert
    for key, (name, bal) in base.items():
        if key not in latest:
            assert got[key] == (name, r2(bal)), key  # untouched passthrough
    assert set(got) == (set(base) | {k for k, (t, _) in latest.items() if t != "error"}) - {
        k for k, (t, _) in latest.items() if t == "error"
    }


def test_cohort_retention_invariants(spark, sf_dir):
    """Retention semantics: offset 0 exists for every cohort and equals the
    cohort size ceiling (every cohort member is active in their first
    week by definition), offsets are non-negative, and no cell exceeds
    its cohort's week-0 count."""
    from mapreduce_infrastructure_spark.operators.temporal import cohort_retention

    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[int, dict[int, int]] = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active
    for cw, cells in by_cohort.items():
        assert 0 in cells, cw  # first week always present
        for off, n in cells.items():
            assert n <= cells[0], (cw, off)


def test_user_activity_skew_matches_sorted_rank_reference(spark, sf_dir):
    """The histogram-block Gini and skew stats must match a scalar
    recomputation that actually sorts per-user counts (tie-block
    shortcut is exact), totals must partition the events table, and the
    share/gini values sit in their admissible ranges."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import user_activity_skew

    rows = {r.event_type: r for r in user_activity_skew(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    ).to_pydict()
    per_type: dict[str, dict] = {}
    for et, uid in zip(tbl["event_type"], tbl["user_id"]):
        per_type.setdefault(et, {}).setdefault(uid, 0)
        per_type[et][uid] += 1
    assert set(rows) == set(per_type)
    assert sum(r.n_events for r in rows.values()) == len(tbl["event_type"])
    for et, users in per_type.items():
        ordered = sorted(users.values())
        n, t = len(ordered), sum(ordered)
        s_rank = sum(i * c for i, c in enumerate(ordered, start=1))
        gini = 2.0 * s_rank / (n * t) - (n + 1.0) / n
        got = rows[et]
        assert (got.n_users, got.n_events, got.max_user_events) == (
            n,
            t,
            ordered[-1],
        )
        assert abs(got.top_user_share - ordered[-1] / t) <= 2e-6
        assert 0.0 <= got.gini < 1.0
        assert abs(got.gini - gini) <= 1e-6


def test_event_interarrival_stats_scalar_reference(spark, sf_dir):
    """Gap stats match a scalar recomputation over each user's per-type
    stream (population std), gap totals partition events minus first
    arrivals, and min ≤ mean ≤ max."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        event_interarrival_stats,
    )

    rows = {r.event_type: r for r in event_interarrival_stats(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "ts", "event_id"]
    ).to_pydict()
    from datetime import datetime

    epoch = datetime(1970, 1, 1)
    streams: dict[tuple, list] = {}
    for et, uid, ts, eid in zip(
        tbl["event_type"], tbl["user_id"], tbl["ts"], tbl["event_id"]
    ):
        # Exact integer µs via timedelta arithmetic: tz-naive fixture
        # timestamps REPRESENT UTC, and .timestamp() would reinterpret
        # them in the machine's local timezone (a DST-straddling fixture
        # span would shift one reference gap by 3600 s) with float µs
        # rounding on top.
        td = ts - epoch
        us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        streams.setdefault((uid, et), []).append((us, eid))
    gaps: dict[str, list] = {}
    n_first = 0
    for (uid, et), evs in streams.items():
        evs.sort()
        n_first += 1
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gaps.setdefault(et, []).append(b - a)
    assert set(rows) == set(gaps)
    assert sum(r.n_gaps for r in rows.values()) == len(tbl["event_type"]) - n_first
    for et, gs in gaps.items():
        n = len(gs)
        mean = sum(gs) / n
        var = sum(g * g for g in gs) / n - mean * mean
        got = rows[et]
        assert got.n_gaps == n
        assert abs(got.mean_gap_sec - mean / 1e6) <= 2e-6
        assert abs(got.std_gap_sec - math.sqrt(max(var, 0.0)) / 1e6) <= 2e-6
        assert got.min_gap_sec == min(gs) / 1e6
        assert got.max_gap_sec == max(gs) / 1e6
        assert got.min_gap_sec <= got.mean_gap_sec <= got.max_gap_sec


def test_event_value_winsor_matches_numpy_reference(spark, sf_dir):
    """The winsorized per-type event moments must match a single-machine
    numpy recomputation using the same discrete-percentile definition
    (smallest value whose cume share reaches q), within the 1e-2 display
    rounding; thresholds must be REAL data values of the type."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        event_value_winsor_by_type,
    )

    rows = {r.event_type: r for r in event_value_winsor_by_type(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pydict()
    by_type: dict[str, list[float]] = {}
    for t, v in zip(tbl["event_type"], tbl["value"]):
        by_type.setdefault(t, []).append(v)
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)

        def disc(q):
            for i, v in enumerate(vals, 1):
                if i / n >= q:
                    return v
            return vals[-1]

        p05, p95 = disc(0.05), disc(0.95)
        r = rows[t]
        assert r.p05 == p05 and r.p95 == p95, (t, r.p05, p05, r.p95, p95)
        assert p05 in vals and p95 in vals  # discrete: real data values
        clipped = np.clip(np.asarray(vals), p05, p95)
        assert r.n == n
        assert abs(r.mean_w - clipped.mean()) <= 0.005 + 1e-9
        std = clipped.std(ddof=1) if n >= 2 else None
        if std is None:
            assert r.std_w is None
        else:
            assert abs(r.std_w - std) <= 0.005 + 1e-6, (t, r.std_w, std)


def test_approx_quantile_calibration_within_formal_bound(spark, sf_dir):
    """Every approximate quantile's exact rank error must sit inside the
    GK/KLL bound (n/accuracy), the exact side must match
    exact_percentiles_disc on the shared qs, and within_bound must be
    the comparison's truth (the operator's alarm column)."""
    from mapreduce_infrastructure_spark.operators.stats import (
        approx_vs_exact_quantile_error,
        exact_percentiles_disc,
    )

    rows = approx_vs_exact_quantile_error(spark, sf_dir).collect()
    assert rows
    exact = {r.o_orderpriority: r for r in exact_percentiles_disc(spark, sf_dir).collect()}
    for r in rows:
        assert r.rank_err <= r.rank_err_bound, (r.o_orderpriority, r.q, r.rank_err)
        assert r.within_bound
        e = exact[r.o_orderpriority]
        want = {0.5: e.p50, 0.95: e.p95, 0.99: e.p99}[r.q]
        assert r.exact_value == want
        assert e.n_orders == r.n


def test_funnel_3step_monotone_and_anchored(spark, sf_dir):
    """Funnel counts must be monotone down the steps, ratios exact
    divisions, and the windowed anchoring must be strictly tighter than
    the orderless 2-step funnel's conversion (every windowed convert is
    also an ordered convert)."""
    from mapreduce_infrastructure_spark.operators.temporal import (
        funnel_3step_windowed,
        funnel_click_purchase,
    )

    row = funnel_3step_windowed(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_signup >= row.n_click_7d >= row.n_purchase_30m
    assert row.conv_s1_s2 == row.n_click_7d / row.n_signup
    assert row.conv_s2_s3 == row.n_purchase_30m / row.n_click_7d
    two = funnel_click_purchase(spark, sf_dir).collect()[0]
    assert row.n_users == two.n_users


def test_twap_matches_scalar_reference(spark, sf_dir):
    """TWAP for a handful of users recomputed scalar-side from the raw
    purchase sequence (decimal-exact weighting), plus bound checks: the
    time-weighted mean must sit inside [min, max] of the user's values."""
    from decimal import Decimal

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.temporal import (
        twap_purchase_by_user,
    )

    got = {r.user_id: r for r in twap_purchase_by_user(spark, sf_dir).collect()}
    assert got
    purchases = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id", "value")
        .collect()
    ):
        purchases.setdefault(r.user_id, []).append((r.us, r.event_id, r.value))
    checked = 0
    for uid, seq in purchases.items():
        if len(seq) < 2 or checked >= 25:
            continue
        seq.sort()
        span = seq[-1][0] - seq[0][0]
        if span == 0:
            assert uid not in got
            continue
        wsum = sum(
            (Decimal(str(v)).quantize(Decimal("0.01"))) * (seq[i + 1][0] - us)
            for i, (us, _, v) in enumerate(seq[:-1])
        )
        import math

        want = math.floor(float(wsum) / span * 1e6 + 0.5) / 1e6
        r = got[uid]
        assert (r.n_purchases, r.span_us) == (len(seq), span)
        assert r.twap == want
        vals = [v for _, _, v in seq]
        assert min(vals) - 1e-6 <= r.twap <= max(vals) + 1e-6
        checked += 1
    assert checked >= 10


def test_mom_growth_first_month_null_and_arithmetic(spark, sf_dir):
    """Per nation: exactly one NULL-growth row (the first month), and each
    growth value must equal the rounded ratio of consecutive revenues."""
    import math

    from mapreduce_infrastructure_spark.operators.temporal import (
        revenue_mom_growth_by_nation,
    )

    rows = revenue_mom_growth_by_nation(spark, sf_dir).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    assert len(by_nation) > 1
    for seq in by_nation.values():
        seq.sort(key=lambda r: r.month)
        assert seq[0].mom_growth is None
        assert all(r.mom_growth is not None for r in seq[1:])
        for prev, cur in zip(seq, seq[1:]):
            want = (
                math.floor(
                    (cur.revenue - prev.revenue) / prev.revenue * 1e6 + 0.5
                )
                / 1e6
            )
            assert cur.mom_growth == want


def test_skyline_2d_parts_domination_invariants(spark, sf_dir):
    """Every returned part is undominated and every excluded part is
    dominated by some returned part (the frontier is tight both ways) —
    checked against the raw table by brute force in Python, independent
    of both the oracle SQL and the sweep implementation."""
    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.analytic import skyline_2d_parts

    import math

    parts = [
        (r.p_partkey, math.floor(r.p_retailprice * 100 + 0.5), r.p_size)
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    sky = {r.p_partkey for r in skyline_2d_parts(spark, sf_dir).collect()}

    def dominated(p, by):
        return (
            by[1] <= p[1]
            and by[2] >= p[2]
            and (by[1] < p[1] or by[2] > p[2])
        )

    frontier = [p for p in parts if p[0] in sky]
    assert frontier, "frontier must be non-empty on a non-empty catalog"
    for p in parts:
        is_dominated = any(dominated(p, q) for q in frontier)
        assert (p[0] in sky) == (not is_dominated), p


def test_skyline_docs_vocab_tokens_domination_invariants(spark, sf_dir):
    """Docs frontier is tight both ways (returned = undominated, excluded
    = dominated by a frontier member), brute-forced in Python over the
    raw token statistics, independent of oracle and sweep."""
    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.text import tokens_col
    from mapreduce_infrastructure_spark.operators.analytic import (
        skyline_docs_vocab_tokens,
    )
    from pyspark.sql import functions as F

    docs = [
        (r.doc_id, r.n_tokens, r.n_vocab)
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(tokens_col()).alias("n_tokens"),
            F.size(F.array_distinct(tokens_col())).alias("n_vocab"),
        )
        .collect()
    ]
    sky = {r.doc_id for r in skyline_docs_vocab_tokens(spark, sf_dir).collect()}

    def dominated(p, by):
        return (
            by[1] <= p[1]
            and by[2] >= p[2]
            and (by[1] < p[1] or by[2] > p[2])
        )

    frontier = [d for d in docs if d[0] in sky]
    assert frontier, "frontier must be non-empty on a non-empty corpus"
    for d in docs:
        is_dominated = any(dominated(d, q) for q in frontier)
        assert (d[0] in sky) == (not is_dominated), d


def test_source_dedup_order_sensitivity_set_algebra(spark, sf_dir):
    """Per-source keep-set counts obey the set algebra: both <= each
    policy count, order_sensitive = (A - both) + (B - both), every doc
    counted once, and global keep counts equal the number of clusters
    (each cluster keeps exactly one doc under each policy)."""
    from mapreduce_infrastructure_spark.llm.dedup import (
        dedup_clusters,
        source_dedup_order_sensitivity,
    )

    rows = source_dedup_order_sensitivity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept_both <= min(r.n_kept_intake, r.n_kept_quality)
        assert r.n_order_sensitive == (
            (r.n_kept_intake - r.n_kept_both)
            + (r.n_kept_quality - r.n_kept_both)
        )
        assert r.n_kept_intake <= r.n_docs and r.n_kept_quality <= r.n_docs
    n_clusters = (
        dedup_clusters(spark, sf_dir).select("cluster").distinct().count()
    )
    assert sum(r.n_kept_intake for r in rows) == n_clusters
    assert sum(r.n_kept_quality for r in rows) == n_clusters


def test_exact_percentiles_cont_matches_numpy_linear(spark, sf_dir):
    """The histogram-form continuous percentile equals numpy's 'linear'
    interpolation (the SQL-standard percentile_cont definition) computed
    from the raw values, per stratum and per q."""
    import numpy as np
    import pytest

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.stats import (
        exact_percentiles_cont,
    )

    raw = {}
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        raw.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    out = {r.o_orderpriority: r for r in exact_percentiles_cont(spark, sf_dir).collect()}
    assert set(out) == set(raw)
    for prio, vals in raw.items():
        a = np.sort(np.array(vals, dtype=np.float64))
        r = out[prio]
        assert r.n_orders == len(vals)
        for q, got in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            want = float(np.percentile(a, q * 100, method="linear"))
            assert got == pytest.approx(want, rel=0, abs=1e-9), (prio, q)


def test_mad_matches_numpy_reference(spark, sf_dir):
    """med and mad equal the numpy recomputation (linear-interpolated
    median of values, then of absolute deviations from it)."""
    import numpy as np
    import pytest

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.stats import (
        mad_totalprice_by_priority,
    )

    raw = {}
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        raw.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    out = {
        r.o_orderpriority: r
        for r in mad_totalprice_by_priority(spark, sf_dir).collect()
    }
    assert set(out) == set(raw)
    for prio, vals in raw.items():
        a = np.array(vals, dtype=np.float64)
        med = float(np.percentile(np.sort(a), 50, method="linear"))
        mad = float(np.percentile(np.sort(np.abs(a - med)), 50, method="linear"))
        r = out[prio]
        assert r.n_orders == len(vals)
        assert r.med == pytest.approx(med, rel=0, abs=1e-9)
        assert r.mad == pytest.approx(mad, rel=0, abs=1e-9)


def test_source_doclen_mad_numpy_reference(spark, sf_dir):
    """Per-source median/MAD of token counts vs a numpy recomputation."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.text import tokens_col
    from mapreduce_infrastructure_spark.operators.stats import (
        source_doclen_mad_profile,
    )

    raw = {}
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", F.size(tokens_col()).alias("n_tok"))
        .collect()
    ):
        raw.setdefault(r.source, []).append(r.n_tok)
    out = {r.source: r for r in source_doclen_mad_profile(spark, sf_dir).collect()}
    assert set(out) == set(raw)
    for src, vals in raw.items():
        a = np.array(vals, dtype=np.float64)
        med = float(np.percentile(np.sort(a), 50, method="linear"))
        mad = float(np.percentile(np.sort(np.abs(a - med)), 50, method="linear"))
        r = out[src]
        assert r.n_docs == len(vals)
        assert r.med == pytest.approx(med, rel=0, abs=1e-9)
        assert r.mad == pytest.approx(mad, rel=0, abs=1e-9)


def test_events_hourly_mad_anomaly_reference(spark, sf_dir):
    """med/mad equal the numpy recomputation over the hourly count series,
    and the flag is exactly |n - med| > 3*mad per row."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.stats import (
        events_hourly_mad_anomaly,
    )

    out = [r.asDict() for r in events_hourly_mad_anomaly(spark, sf_dir).collect()]
    assert out
    per = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        per.setdefault(r.event_type, []).append(r.n)
    ref = {}
    for t, vals in per.items():
        a = np.sort(np.array(vals, dtype=np.float64))
        med = float(np.percentile(a, 50, method="linear"))
        mad = float(np.percentile(np.sort(np.abs(a - med)), 50, method="linear"))
        ref[t] = (med, mad)
    assert len(out) == sum(len(v) for v in per.values())
    for r in out:
        med, mad = ref[r["event_type"]]
        assert r["med"] == pytest.approx(med, rel=0, abs=1e-9)
        assert r["mad"] == pytest.approx(mad, rel=0, abs=1e-9)
        assert r["is_anomaly"] == (abs(r["n"] - med) > 3 * mad)


def test_supplier_hhi_scalar_reference(spark, sf_dir):
    """Exact-integer Python recount of the ppm-grid HHI from the raw
    lineitem/supplier fixtures (same floor(x*100+0.5) cents, same
    floor(rev*1e6/total) share grid, same single division by 1e12), plus
    the HHI range law 1/n - quantization <= hhi <= 1."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        supplier_concentration_hhi,
    )

    got = {r.n_name: r for r in supplier_concentration_hhi(spark, sf_dir).collect()}
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"]
    ).to_pydict()
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pydict()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pydict()
    nk = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))
    rev = {}
    for sk, p in zip(li["l_suppkey"], li["l_extendedprice"]):
        rev[sk] = rev.get(sk, 0) + int(math.floor(float(p) * 100 + 0.5))
    by_nation = {}
    for sk, r in rev.items():
        by_nation.setdefault(nk[sk], []).append(r)
    assert set(got) == {nname[k] for k in by_nation}
    for k, revs in by_nation.items():
        total = sum(revs)
        ppms = [r * 1_000_000 // total for r in revs]
        want_hhi = float(sum(p * p for p in ppms)) / 1.0e12
        row = got[nname[k]]
        assert row.n_suppliers == len(revs)
        assert row.total_revenue_cents == total
        assert row.hhi == want_hhi
        assert 1.0 / len(revs) - 2e-6 <= row.hhi <= 1.0


def test_events_dow_hour_profile_scalar_reference(spark, sf_dir):
    """Python recount of the UTC epoch-arithmetic cells ((day+3)%7 dow,
    0=Monday) and the exact share/chi2 float expressions; per-type cell
    counts must sum to the type total and shares to 1.0 within one ulp
    per cell."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        events_dow_hour_profile,
    )

    rows = events_dow_hour_profile(spark, sf_dir).collect()
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"]).to_pydict()
    want = {}
    for et, ts in zip(ev["event_type"], ev["ts"]):
        sec = int(ts.timestamp())  # parquet ts is tz-aware or naive-utc
        day, rem = divmod(sec, 86400)
        cell = (et, (day + 3) % 7, rem // 3600)
        want[cell] = want.get(cell, 0) + 1
    totals = {}
    for (et, _d, _h), n in want.items():
        totals[et] = totals.get(et, 0) + n
    got = {(r.event_type, r.dow, r.hour): r for r in rows}
    assert set(got) == set(want)
    for cell, n in want.items():
        r = got[cell]
        tot = totals[cell[0]]
        assert r.n_events == n
        assert 0 <= r.dow <= 6 and 0 <= r.hour <= 23
        assert r.share == n / tot
        e = tot / 168.0
        assert r.chi2_term == (n - e) * (n - e) / e
    for et, tot in totals.items():
        assert sum(r.n_events for c, r in got.items() if c[0] == et) == tot


def test_customer_rfm_segments_scalar_reference(spark, sf_dir):
    """Full Python recount of the RFM pipeline from the raw parquet:
    per-customer (recency, freq, monetary-cents) with the $100 monetary
    grid, per-mktsegment discrete quartile thresholds (smallest value
    whose cume_dist reaches q), integer class assignment, exact cell
    counts and revenue."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_rfm_segments,
    )

    got = {
        (r.seg, r.r_seg, r.f_seg, r.m_seg): (r.n_customers, r.total_monetary_cents)
        for r in customer_rfm_segments(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pydict()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pydict()
    seg_of = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    cm = {}
    for ck, d, p in zip(o["o_custkey"], o["o_orderdate"], o["o_totalprice"]):
        day = int(d.timestamp()) // 86400
        last, freq, cents = cm.get(ck, (-(10**9), 0, 0))
        cm[ck] = (max(last, day), freq + 1,
                  cents + int(math.floor(float(p) * 100 + 0.5)))
    gmax = max(v[0] for v in cm.values())
    rows = [
        (seg_of[ck], gmax - last, freq, cents, cents // 10000)
        for ck, (last, freq, cents) in cm.items()
    ]

    def disc(vals, q):
        vals = sorted(vals)
        n = len(vals)
        for i, v in enumerate(vals, start=1):
            if i / n >= q:
                return v
        return vals[-1]

    want = {}
    by_seg = {}
    for seg, rec, freq, cents, grid in rows:
        by_seg.setdefault(seg, []).append((rec, freq, grid))
    thr = {
        seg: tuple(
            tuple(disc([t[i] for t in ts], q) for q in (0.25, 0.5, 0.75))
            for i in range(3)
        )
        for seg, ts in by_seg.items()
    }
    for seg, rec, freq, cents, grid in rows:
        (tr, tf, tm) = thr[seg]
        cell = (
            seg,
            1 + sum(rec > t for t in tr),
            1 + sum(freq > t for t in tf),
            1 + sum(grid > t for t in tm),
        )
        n, tot = want.get(cell, (0, 0))
        want[cell] = (n + 1, tot + cents)
    assert got == want
    assert sum(n for n, _ in got.values()) == len(cm)


def test_nation_trade_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the bilateral trade matrix from raw parquet
    (exact cents, exact counts, share = cell/total), plus the matrix
    laws: shares sum to 1.0 within one ulp per cell and the total equals
    the lineitem-wide cents sum."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        nation_trade_balance_matrix,
    )

    got = {
        (r.cust_nation, r.supp_nation): (r.n_lines, r.revenue_cents, r.revenue_share)
        for r in nation_trade_balance_matrix(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice"],
    ).to_pydict()
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pydict()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pydict()
    s = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pydict()
    n = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pydict()
    cust_of = dict(zip(o["o_orderkey"], o["o_custkey"]))
    cnat = dict(zip(c["c_custkey"], c["c_nationkey"]))
    snat = dict(zip(s["s_suppkey"], s["s_nationkey"]))
    nname = dict(zip(n["n_nationkey"], n["n_name"]))
    cells = {}
    for ok, sk, p in zip(li["l_orderkey"], li["l_suppkey"], li["l_extendedprice"]):
        key = (nname[cnat[cust_of[ok]]], nname[snat[sk]])
        nl, cents = cells.get(key, (0, 0))
        cells[key] = (nl + 1, cents + int(math.floor(float(p) * 100 + 0.5)))
    total = sum(v[1] for v in cells.values())
    want = {k: (nl, cents, cents / total) for k, (nl, cents) in cells.items()}
    assert got == want
    assert abs(sum(sh for _, _, sh in got.values()) - 1.0) < 1e-9


def test_customer_spend_percentiles_scalar_reference(spark, sf_dir):
    """Python recount: per-customer cents sums, sorted, the ceil(q*n)-th
    order statistics — the engine's narrowing loop must land on exactly
    these values."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        exact_customer_spend_percentiles,
    )

    row = exact_customer_spend_percentiles(spark, sf_dir).collect()[0]
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pydict()
    cm = {}
    for ck, p in zip(o["o_custkey"], o["o_totalprice"]):
        cm[ck] = cm.get(ck, 0) + int(math.floor(float(p) * 100 + 0.5))
    vals = sorted(cm.values())
    n = len(vals)
    assert row.n_customers == n
    for q, got in (
        (0.5, row.p50_cents),
        (0.95, row.p95_cents),
        (0.99, row.p99_cents),
    ):
        assert got == vals[max(1, math.ceil(q * n)) - 1]
    assert row.p50_cents <= row.p95_cents <= row.p99_cents


def test_event_value_percentiles_by_type_scalar_reference(spark, sf_dir):
    """Python recount: micro-unit grid per type, sorted, the
    max(1, ceil(q*n))-th order statistics."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        event_value_percentiles_by_type,
    )

    got = {r.event_type: r for r in event_value_percentiles_by_type(spark, sf_dir).collect()}
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pydict()
    by = {}
    for et, v in zip(ev["event_type"], ev["value"]):
        by.setdefault(et, []).append(int(math.floor(float(v) * 1000000 + 0.5)))
    assert set(got) == set(by)
    for et, vals in by.items():
        vals.sort()
        n = len(vals)
        r = got[et]
        assert r.n_events == n
        for q, micro in ((0.5, r.p50_micro), (0.95, r.p95_micro), (0.99, r.p99_micro)):
            assert micro == vals[max(1, math.ceil(q * n)) - 1]
        assert r.p50_micro <= r.p95_micro <= r.p99_micro


def test_supplier_leadtime_percentiles_scalar_reference(spark, sf_dir):
    """Python recount of per-supplier exact ship-lag percentiles: same
    epoch-day integer lags, same discrete selection (smallest lag whose
    cume_dist — the SAME float cum/n division — reaches q). Plus the
    order law p50 <= p90 <= p99 and the partition law (per-supplier line
    counts sum to the joined line count)."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        supplier_leadtime_percentiles,
    )

    got = {
        r.s_suppkey: r
        for r in supplier_leadtime_percentiles(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).to_pydict()
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pydict()
    dopen = {
        k: int(d.timestamp()) // 86400
        for k, d in zip(o["o_orderkey"], o["o_orderdate"])
    }
    lags = {}
    for ok, sk, d in zip(li["l_orderkey"], li["l_suppkey"], li["l_shipdate"]):
        lags.setdefault(sk, []).append(int(d.timestamp()) // 86400 - dopen[ok])

    def disc(sorted_vals, q):
        n = len(sorted_vals)
        cum = 0
        for i, v in enumerate(sorted_vals):
            if i + 1 < n and sorted_vals[i + 1] == v:
                continue  # only value-block ends carry cume_dist
            cum = i + 1
            if cum / n >= q:  # same one IEEE division both engines state
                return v
        return sorted_vals[-1]

    assert set(got) == set(lags)
    total_lines = 0
    for sk, vs in lags.items():
        vs.sort()
        row = got[sk]
        assert row.n_lines == len(vs)
        total_lines += row.n_lines
        assert row.p50_lag_days == disc(vs, 0.5)
        assert row.p90_lag_days == disc(vs, 0.9)
        assert row.p99_lag_days == disc(vs, 0.99)
        assert row.p50_lag_days <= row.p90_lag_days <= row.p99_lag_days
    assert total_lines == len(li["l_orderkey"])


def test_customer_order_gap_percentiles_scalar_reference(spark, sf_dir):
    """Python recount of per-segment inter-order gap percentiles: same
    (day, o_orderkey) lag order per customer, same discrete selection
    with the same float cum/n division, plus the order law and the gap
    count identity n_gaps = n_orders - n_customers_with_orders (each
    customer's first order yields no gap)."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_order_gap_percentiles,
    )

    got = {
        r.c_mktsegment: r
        for r in customer_order_gap_percentiles(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).to_pydict()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pydict()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    per_cust = {}
    for ok, ck, d in zip(o["o_orderkey"], o["o_custkey"], o["o_orderdate"]):
        per_cust.setdefault(ck, []).append((int(d.timestamp()) // 86400, ok))
    gaps = {}
    for ck, rows in per_cust.items():
        rows.sort()
        for (d0, _), (d1, _) in zip(rows, rows[1:]):
            gaps.setdefault(seg[ck], []).append(d1 - d0)

    def disc(sorted_vals, q):
        n = len(sorted_vals)
        for i, v in enumerate(sorted_vals):
            if i + 1 < n and sorted_vals[i + 1] == v:
                continue
            if (i + 1) / n >= q:
                return v
        return sorted_vals[-1]

    assert set(got) == set(gaps)
    for sg, vs in gaps.items():
        vs.sort()
        row = got[sg]
        assert row.n_gaps == len(vs)
        assert row.p50_gap_days == disc(vs, 0.5)
        assert row.p90_gap_days == disc(vs, 0.9)
        assert row.p99_gap_days == disc(vs, 0.99)
        assert row.p50_gap_days <= row.p90_gap_days <= row.p99_gap_days
    assert sum(r.n_gaps for r in got.values()) == len(o["o_orderkey"]) - len(
        per_cust
    )


def test_order_volume_weekly_trend_scalar_reference(spark, sf_dir):
    """Python recount of the weekly trend from the raw orders fixture:
    same epoch-week integers, same exact cents, same left-join WoW
    convention (NULL after a gap week), same one IEEE ratio division."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        order_volume_weekly_trend,
    )

    got = {r.week: r for r in order_volume_weekly_trend(spark, sf_dir).collect()}
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pydict()
    weeks = {}
    for d, p in zip(o["o_orderdate"], o["o_totalprice"]):
        wk = int(d.timestamp()) // 86400 // 7
        n, cents = weeks.get(wk, (0, 0))
        weeks[wk] = (n + 1, cents + int(math.floor(float(p) * 100 + 0.5)))
    assert set(got) == set(weeks)
    for wk, (n, cents) in weeks.items():
        row = got[wk]
        assert (row.n_orders, row.revenue_cents) == (n, cents)
        prev = weeks.get(wk - 1)
        if prev is None:
            assert row.prev_n_orders is None
            assert row.wow_delta_orders is None
            assert row.wow_ratio is None
        else:
            assert row.prev_n_orders == prev[0]
            assert row.wow_delta_orders == n - prev[0]
            assert row.wow_ratio == n / prev[0]


def test_session_duration_percentiles_scalar_reference(spark, sf_dir):
    """Python recount: 30-min-gap sessionization in pure python over the
    events fixture, then percentile_disc ranks max(1, ceil(q*n)) against
    the sorted duration list — the same rank formula (same IEEE multiply)
    the engine and oracle state."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        session_duration_percentiles,
    )

    row = session_duration_percentiles(spark, sf_dir).collect()[0]
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).to_pydict()
    per_user = {}
    for u, t in zip(ev["user_id"], ev["ts"]):
        per_user.setdefault(u, []).append(
            int(t.timestamp() * 1_000_000)
            if not hasattr(t, "value")
            else int(t.value) // 1000
        )
    durs = []
    gap = 30 * 60 * 1_000_000
    for ts in per_user.values():
        ts.sort()
        start = prev = ts[0]
        for x in ts[1:]:
            if x - prev >= gap:
                durs.append(prev - start)
                start = x
            prev = x
        durs.append(prev - start)
    durs.sort()
    n = len(durs)
    assert row.n_sessions == n
    for q, got in ((0.5, row.p50_us), (0.95, row.p95_us), (0.99, row.p99_us)):
        assert got == durs[max(1, math.ceil(q * n)) - 1]


def test_event_mix_weekly_drift_scalar_reference(spark, sf_dir):
    """Python recount of the weekly event-mix drift cells: same epoch-week
    grid, same left-associative expectation
    double(prev_n)·week_total/prev_week_total, NULL chi2 exactly when the
    type was absent the previous week (or it is the first week)."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        event_mix_weekly_drift,
    )

    got = {
        (r.week, r.event_type): r
        for r in event_mix_weekly_drift(spark, sf_dir).collect()
    }
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pydict()
    cells = {}
    for t, et in zip(ev["ts"], ev["event_type"]):
        us = int(t.value) // 1000 if hasattr(t, "value") else int(
            t.timestamp() * 1_000_000
        )
        wk = us // 1_000_000 // 86400 // 7
        cells[(wk, et)] = cells.get((wk, et), 0) + 1
    totals = {}
    for (wk, _et), n in cells.items():
        totals[wk] = totals.get(wk, 0) + n
    assert set(got) == set(cells)
    for (wk, et), n in cells.items():
        row = got[(wk, et)]
        assert (row.n_events, row.week_total) == (n, totals[wk])
        assert row.share == n / totals[wk]
        prev = cells.get((wk - 1, et))
        if prev is None:
            assert row.prev_n is None and row.chi2_term is None
        else:
            assert row.prev_n == prev
            e = float(prev) * totals[wk] / totals[wk - 1]
            assert row.chi2_term == (n - e) * (n - e) / e


def test_return_rate_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the (supplier nation × part type) return-rate
    matrix, plus the mass law: cell line counts sum to |lineitem|."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        return_rate_by_nation_parttype,
    )

    got = {
        (r.supp_nation, r.p_type): r
        for r in return_rate_by_nation_parttype(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_returnflag"],
    ).to_pydict()
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pydict()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pydict()
    prt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pydict()
    nk = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    nn = dict(zip(nat["n_nationkey"], nat["n_name"]))
    pt = dict(zip(prt["p_partkey"], prt["p_type"]))
    want = {}
    for sk, pk, rf in zip(li["l_suppkey"], li["l_partkey"], li["l_returnflag"]):
        key = (nn[nk[sk]], pt[pk])
        n, r = want.get(key, (0, 0))
        want[key] = (n + 1, r + (1 if rf == "R" else 0))
    assert set(got) == set(want)
    for key, (n, r) in want.items():
        row = got[key]
        assert (row.n_lines, row.n_returned) == (n, r)
        assert row.return_rate == r / n
    assert sum(r.n_lines for r in got.values()) == len(li["l_suppkey"])


def test_discount_band_margin_scalar_reference(spark, sf_dir):
    """Python recount of the discount-band report with exact-integer
    cents/quantity folds and the DECIMAL cost numerator recomputed on an
    exact cents×bp integer grid, plus the band-axis law (bands are the
    observed 2-decimal discount grid)."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        discount_band_margin_report,
    )

    got = {
        r.discount_pct: r
        for r in discount_band_margin_report(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_discount", "l_quantity", "l_extendedprice"],
    ).to_pydict()
    want = {}
    for d, q, p in zip(li["l_discount"], li["l_quantity"], li["l_extendedprice"]):
        band = int(math.floor(float(d) * 100 + 0.5))
        cents = int(math.floor(float(p) * 100 + 0.5))
        qty = int(math.floor(float(q) + 0.5))
        # DECIMAL(18,2)*DECIMAL(18,2): exact product of the 2-decimal
        # representations — reconstruct on the integer cents×bp grid.
        n, tq, gc, cost4 = want.get(band, (0, 0, 0, 0))
        want[band] = (n + 1, tq + qty, gc + cents, cost4 + cents * band)
    assert set(got) == set(want)
    for band, (n, tq, gc, cost4) in want.items():
        row = got[band]
        assert (row.n_lines, row.total_qty, row.gross_cents) == (n, tq, gc)
        # cost4 is cents·(discount·100): cost in units of 1e-4 dollars
        want_pct = (cost4 / 10000) / (gc / 100) * 100 if gc else None
        assert abs(row.discount_cost_pct - want_pct) < 1e-9


def test_customer_revenue_concentration_scalar_reference(spark, sf_dir):
    """Python recount of the concentration report: same exact per-customer
    cents, same max(1, ceil(pct/100·n)) threshold ranks over the sorted
    spend list, same value-based membership and one-division share. Plus
    the monotone laws: thresholds rise and shares fall as pct rises, and
    pct=50 covers at most all customers."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_revenue_concentration,
    )

    got = {
        r.pct: r for r in customer_revenue_concentration(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pydict()
    spend = {}
    for ck, p in zip(o["o_custkey"], o["o_totalprice"]):
        spend[ck] = spend.get(ck, 0) + int(math.floor(float(p) * 100 + 0.5))
    vals = sorted(spend.values())
    n, total = len(vals), sum(vals)
    assert set(got) == {50, 75, 90, 95, 99}
    prev_threshold, prev_share = None, None
    for pct in (50, 75, 90, 95, 99):
        row = got[pct]
        t = vals[max(1, math.ceil(pct / 100.0 * n)) - 1]
        above = [v for v in vals if v >= t]
        assert row.threshold_cents == t
        assert row.n_customers == len(above)
        assert row.revenue_cents == sum(above)
        assert row.revenue_share == sum(above) / total
        if prev_threshold is not None:
            assert row.threshold_cents >= prev_threshold
            assert row.revenue_share <= prev_share
        prev_threshold, prev_share = row.threshold_cents, row.revenue_share


def test_events_user_value_concentration_scalar_reference(spark, sf_dir):
    """Python recount of the user-axis value concentration: same exact
    per-user micro-unit masses, same max(1, ceil(pct/100·n)) threshold
    ranks over the sorted mass list, same value-based membership and
    one-division share. Plus the monotone laws (thresholds rise, shares
    fall) and the share floor: the top-decile checkpoint must carry at
    least its population share of the mass."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        events_user_value_concentration,
    )

    got = {
        r.pct: r
        for r in events_user_value_concentration(spark, sf_dir).collect()
    }
    e = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).to_pydict()
    mass: dict = {}
    for uid, v in zip(e["user_id"], e["value"]):
        if v is None:
            continue
        mass[uid] = mass.get(uid, 0) + int(
            math.floor(float(v) * 1000000 + 0.5)
        )
    vals = sorted(mass.values())
    n, total = len(vals), sum(vals)
    assert set(got) == {50, 75, 90, 95, 99}
    prev_threshold, prev_share = None, None
    for pct in (50, 75, 90, 95, 99):
        row = got[pct]
        t = vals[max(1, math.ceil(pct / 100.0 * n)) - 1]
        above = [v for v in vals if v >= t]
        assert row.threshold_micro == t
        assert row.n_users == len(above)
        assert row.value_micro == sum(above)
        assert row.value_share == sum(above) / total
        # Concentration floor: the at-or-above cohort's mass share is at
        # least its population share (they hold the largest masses).
        assert row.value_share >= len(above) / n
        if prev_threshold is not None:
            assert row.threshold_micro >= prev_threshold
            assert row.value_share <= prev_share
        prev_threshold, prev_share = row.threshold_micro, row.value_share


def test_customer_priority_mix_by_value_quintile_scalar(spark, sf_dir):
    """Python recount of the priority-mix matrix from the raw orders
    parquet: same exact cents spends, same max(1, ceil(k/5·n)) quintile
    cuts, same strict-greater ladder, same per-quintile shares — and
    each quintile's mix must sum to 1 over exact counts."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_priority_mix_by_value_quintile,
    )

    got = {
        (r.value_quintile, r.o_orderpriority): r
        for r in customer_priority_mix_by_value_quintile(
            spark, sf_dir
        ).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    ).to_pydict()
    spend: dict = {}
    for ck, p in zip(o["o_custkey"], o["o_totalprice"]):
        spend[ck] = spend.get(ck, 0) + int(math.floor(float(p) * 100 + 0.5))
    vals = sorted(spend.values())
    n = len(vals)
    cuts = [vals[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)]
    vq = {ck: 1 + sum(s > t for t in cuts) for ck, s in spend.items()}
    want: dict = {}
    for ck, pr in zip(o["o_custkey"], o["o_orderpriority"]):
        key = (vq[ck], pr)
        want[key] = want.get(key, 0) + 1
    row_tot: dict = {}
    for (q, _pr), c in want.items():
        row_tot[q] = row_tot.get(q, 0) + c
    assert set(got) == set(want)
    for key, c in want.items():
        row = got[key]
        assert row.n_orders == c
        assert row.n_row == row_tot[key[0]]
        assert row.row_share == c / row_tot[key[0]]
    for q in row_tot:
        assert sum(r.n_orders for k, r in got.items() if k[0] == q) == row_tot[q]


def test_leadtime_weekly_trend_scalar_reference(spark, sf_dir):
    """Python recount of the per-week ship-lag percentiles (same epoch
    integers, same discrete selection), plus consistency with the
    per-supplier view: total line counts agree."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        leadtime_weekly_trend,
    )

    got = {r.week: r for r in leadtime_weekly_trend(spark, sf_dir).collect()}
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pydict()
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pydict()
    dopen = {
        k: int(d.timestamp()) // 86400
        for k, d in zip(o["o_orderkey"], o["o_orderdate"])
    }
    lags = {}
    for ok, d in zip(li["l_orderkey"], li["l_shipdate"]):
        dship = int(d.timestamp()) // 86400
        lags.setdefault(dship // 7, []).append(dship - dopen[ok])

    def disc(sorted_vals, q):
        n = len(sorted_vals)
        for i, v in enumerate(sorted_vals):
            if i + 1 < n and sorted_vals[i + 1] == v:
                continue
            if (i + 1) / n >= q:
                return v
        return sorted_vals[-1]

    assert set(got) == set(lags)
    for wk, vs in lags.items():
        vs.sort()
        row = got[wk]
        assert row.n_lines == len(vs)
        assert row.p50_lag_days == disc(vs, 0.5)
        assert row.p90_lag_days == disc(vs, 0.9)
    assert sum(r.n_lines for r in got.values()) == len(li["l_orderkey"])


def test_customer_value_migration_matrix_scalar_reference(spark, sf_dir):
    """Full python recount of the migration matrix: same median split
    day (rank ceil(0.5·n) over order days), same both-halves population,
    same value-based quintile thresholds and CASE-ladder assignment,
    same one-division row shares. Plus the mass laws: cells sum to the
    population and each row's cells sum to its n_q1."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_value_migration_matrix,
    )

    got = {
        (r.quintile_h1, r.quintile_h2): r
        for r in customer_value_migration_matrix(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pydict()
    rows = [
        (ck, int(d.timestamp()) // 86400, int(math.floor(float(p) * 100 + 0.5)))
        for ck, d, p in zip(o["o_custkey"], o["o_orderdate"], o["o_totalprice"])
    ]
    days = sorted(d for _, d, _ in rows)
    mid = days[max(1, math.ceil(0.5 * len(days))) - 1]
    s1, s2 = {}, {}
    for ck, d, c in rows:
        tgt = s1 if d <= mid else s2
        tgt[ck] = tgt.get(ck, 0) + c
    both = sorted(set(s1) & set(s2))
    th = {}
    for name, s in (("s1", s1), ("s2", s2)):
        vals = sorted(s[c] for c in both)
        th[name] = [
            vals[max(1, math.ceil(k / 5.0 * len(vals))) - 1] for k in (1, 2, 3, 4)
        ]
    want = {}
    for c in both:
        q1 = 1 + sum(1 for t in th["s1"] if s1[c] > t)
        q2 = 1 + sum(1 for t in th["s2"] if s2[c] > t)
        want[(q1, q2)] = want.get((q1, q2), 0) + 1
    row_tot = {}
    for (q1, _q2), n in want.items():
        row_tot[q1] = row_tot.get(q1, 0) + n
    assert set(got) == set(want)
    for (q1, q2), n in want.items():
        r = got[(q1, q2)]
        assert r.n_customers == n
        assert r.n_q1 == row_tot[q1]
        assert r.row_share == n / row_tot[q1]
    assert sum(r.n_customers for r in got.values()) == len(both)


def test_event_value_concentration_scalar_reference(spark, sf_dir):
    """Python recount of per-type value concentration: same micro grid,
    same max(1, ceil(0.9·n)) threshold rank, same value-based membership
    and one-division share; the top share must be ≥ the top count share
    (the tail carries disproportionate mass by construction)."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        event_value_concentration_by_type,
    )

    got = {
        r.event_type: r
        for r in event_value_concentration_by_type(spark, sf_dir).collect()
    }
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pydict()
    per_type = {}
    for et, v in zip(ev["event_type"], ev["value"]):
        if v is None:
            continue
        per_type.setdefault(et, []).append(
            int(math.floor(float(v) * 1000000 + 0.5))
        )
    assert set(got) == set(per_type)
    for et, vs in per_type.items():
        vs.sort()
        n = len(vs)
        t = vs[max(1, math.ceil(0.9 * n)) - 1]
        top = [v for v in vs if v >= t]
        row = got[et]
        assert row.n_events == n
        assert row.threshold_micro == t
        assert row.n_top == len(top)
        assert row.top_value_micro == sum(top)
        assert row.top_value_share == sum(top) / sum(vs)
        assert row.top_value_share >= len(top) / n - 1e-12


def test_supplier_leadtime_migration_scalar_reference(spark, sf_dir):
    """Python recount of the lead-time migration matrix: same epoch-day
    lags, same median split day (rank ceil(0.5*n) over joined-row order
    days), same per-(supplier, half) discrete median, same both-halves
    population, same value-based quintile thresholds and CASE-ladder
    assignment, same one-division row shares. Plus the mass laws: cells
    sum to the population and each row's cells sum to its n_q1."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        supplier_leadtime_migration,
    )

    got = {
        (r.quintile_h1, r.quintile_h2): r
        for r in supplier_leadtime_migration(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).to_pydict()
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pydict()
    dopen = {
        k: int(d.timestamp()) // 86400
        for k, d in zip(o["o_orderkey"], o["o_orderdate"])
    }
    rows = [
        (sk, dopen[ok], int(d.timestamp()) // 86400 - dopen[ok])
        for ok, sk, d in zip(
            li["l_orderkey"], li["l_suppkey"], li["l_shipdate"]
        )
    ]
    days = sorted(d for _, d, _ in rows)
    mid = days[max(1, math.ceil(0.5 * len(days))) - 1]
    lags = {}
    for sk, d, lag in rows:
        lags.setdefault((sk, 1 if d <= mid else 2), []).append(lag)

    def p50(vs):
        vs.sort()
        return vs[max(1, math.ceil(0.5 * len(vs))) - 1]

    v1 = {sk: p50(vs) for (sk, h), vs in lags.items() if h == 1}
    v2 = {sk: p50(vs) for (sk, h), vs in lags.items() if h == 2}
    both = sorted(set(v1) & set(v2))
    th = {}
    for name, s in (("v1", v1), ("v2", v2)):
        vals = sorted(s[c] for c in both)
        th[name] = [
            vals[max(1, math.ceil(k / 5.0 * len(vals))) - 1]
            for k in (1, 2, 3, 4)
        ]
    want = {}
    for c in both:
        q1 = 1 + sum(1 for t in th["v1"] if v1[c] > t)
        q2 = 1 + sum(1 for t in th["v2"] if v2[c] > t)
        want[(q1, q2)] = want.get((q1, q2), 0) + 1
    row_tot = {}
    for (q1, _q2), n in want.items():
        row_tot[q1] = row_tot.get(q1, 0) + n
    assert set(got) == set(want)
    for (q1, q2), n in want.items():
        r = got[(q1, q2)]
        assert r.n_suppliers == n
        assert r.n_q1 == row_tot[q1]
        assert r.row_share == n / row_tot[q1]
    assert sum(r.n_suppliers for r in got.values()) == len(both)


def test_events_user_lifetime_span_scalar_reference(spark, sf_dir):
    """Python recount of the first-touch lifetime-span percentiles: same
    unix_micros spans, same (ts_us, event_id) first-touch tie-break as
    the engine's struct-min / the oracle's row_number, same
    percentile_disc ranks max(1, ceil(q*n)). Plus the partition law:
    per-cohort user counts sum to the distinct-user count."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        events_user_lifetime_span_percentiles,
    )

    got = {
        r.first_type: r
        for r in events_user_lifetime_span_percentiles(spark, sf_dir).collect()
    }
    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pydict()
    per_user = {}
    for u, t, i, et in zip(
        ev["user_id"], ev["ts"], ev["event_id"], ev["event_type"]
    ):
        us = (
            int(t.timestamp() * 1_000_000)
            if not hasattr(t, "value")
            else int(t.value) // 1000
        )
        lo, hi, fst = per_user.get(u, (None, None, None))
        if lo is None:
            per_user[u] = (us, us, (us, i, et))
        else:
            per_user[u] = (
                min(lo, us), max(hi, us), min(fst, (us, i, et))
            )
    spans = {}
    for lo, hi, fst in per_user.values():
        spans.setdefault(fst[2], []).append(hi - lo)
    assert set(got) == set(spans)
    for et, vs in spans.items():
        vs.sort()
        n = len(vs)
        r = got[et]
        assert r.n_users == n
        assert r.p50_span_us == vs[max(1, math.ceil(0.5 * n)) - 1]
        assert r.p90_span_us == vs[max(1, math.ceil(0.9 * n)) - 1]
        assert r.p50_span_us <= r.p90_span_us
    assert sum(r.n_users for r in got.values()) == len(per_user)


def test_part_demand_concentration_scalar_reference(spark, sf_dir):
    """Python recount of the part-demand concentration: same per-part
    line counts, same percentile_disc ranks max(1, ceil(q*m)), same
    >= p90 membership and one-division share. Plus the tail-dominance
    law (top-decile parts carry at least their headcount share) and the
    threshold order law p50 <= p90."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        part_demand_concentration,
    )

    r = part_demand_concentration(spark, sf_dir).collect()[0]
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    ).to_pydict()
    counts = {}
    for p in li["l_partkey"]:
        counts[p] = counts.get(p, 0) + 1
    vs = sorted(counts.values())
    m = len(vs)
    p50 = vs[max(1, math.ceil(0.5 * m)) - 1]
    p90 = vs[max(1, math.ceil(0.9 * m)) - 1]
    top = [v for v in vs if v >= p90]
    assert r.n_parts == m
    assert r.p50_lines == p50
    assert r.p90_lines == p90
    assert r.p50_lines <= r.p90_lines
    assert r.n_top_parts == len(top)
    assert r.top_lines == sum(top)
    assert r.top_line_share == sum(top) / sum(vs)
    assert r.top_line_share >= r.n_top_parts / r.n_parts


def test_customer_order_gap_migration_scalar_reference(spark, sf_dir):
    """Full python recount of the cadence migration matrix: same
    (day, o_orderkey) gap tie-break, same median split day over ALL
    order rows, same per-(customer, half) discrete median gap, same
    both-halves population, value-based quintile thresholds, CASE-ladder
    assignment and one-division row shares. Plus the mass laws."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_order_gap_migration,
    )

    got = {
        (r.quintile_h1, r.quintile_h2): r
        for r in customer_order_gap_migration(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    ).to_pydict()
    rows = sorted(
        (ck, int(d.timestamp()) // 86400, ok)
        for ck, ok, d in zip(
            o["o_custkey"], o["o_orderkey"], o["o_orderdate"]
        )
    )
    days = sorted(d for _, d, _ in rows)
    mid = days[max(1, math.ceil(0.5 * len(days))) - 1]
    per_cust = {}
    for ck, d, ok in rows:
        per_cust.setdefault(ck, []).append((d, ok))
    gaps = {}
    for ck, os_ in per_cust.items():
        os_.sort()
        for (d0, _), (d1, _) in zip(os_, os_[1:]):
            half = 1 if d1 <= mid else 2
            gaps.setdefault((ck, half), []).append(d1 - d0)

    def p50(vs):
        vs.sort()
        return vs[max(1, math.ceil(0.5 * len(vs))) - 1]

    v1 = {ck: p50(vs) for (ck, h), vs in gaps.items() if h == 1}
    v2 = {ck: p50(vs) for (ck, h), vs in gaps.items() if h == 2}
    both = sorted(set(v1) & set(v2))
    th = {}
    for name, s in (("v1", v1), ("v2", v2)):
        vals = sorted(s[c] for c in both)
        th[name] = [
            vals[max(1, math.ceil(k / 5.0 * len(vals))) - 1]
            for k in (1, 2, 3, 4)
        ]
    want = {}
    for c in both:
        q1 = 1 + sum(1 for t in th["v1"] if v1[c] > t)
        q2 = 1 + sum(1 for t in th["v2"] if v2[c] > t)
        want[(q1, q2)] = want.get((q1, q2), 0) + 1
    row_tot = {}
    for (q1, _q2), n in want.items():
        row_tot[q1] = row_tot.get(q1, 0) + n
    assert set(got) == set(want)
    for (q1, q2), n in want.items():
        r = got[(q1, q2)]
        assert r.n_customers == n
        assert r.n_q1 == row_tot[q1]
        assert r.row_share == n / row_tot[q1]
    assert sum(r.n_customers for r in got.values()) == len(both)


def test_supplier_return_rate_migration_scalar_reference(spark, sf_dir):
    """Python recount of the return-rate migration: same median ship-day
    split, same exact ppm-grid rates (returned*1e6 // lines — integer
    floor division, no FP rate anywhere), same both-halves population,
    value-based quintile thresholds, CASE ladder and row shares. Plus
    the mass laws."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        supplier_return_rate_migration,
    )

    got = {
        (r.quintile_h1, r.quintile_h2): r
        for r in supplier_return_rate_migration(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_returnflag"],
    ).to_pydict()
    rows = [
        (sk, int(d.timestamp()) // 86400, 1 if rf == "R" else 0)
        for sk, d, rf in zip(
            li["l_suppkey"], li["l_shipdate"], li["l_returnflag"]
        )
    ]
    days = sorted(d for _, d, _ in rows)
    mid = days[max(1, math.ceil(0.5 * len(days))) - 1]
    agg = {}
    for sk, d, ret in rows:
        half = 1 if d <= mid else 2
        n, r = agg.get((sk, half), (0, 0))
        agg[(sk, half)] = (n + 1, r + ret)
    ppm = {k: (r * 1000000) // n for k, (n, r) in agg.items()}
    v1 = {sk: v for (sk, h), v in ppm.items() if h == 1}
    v2 = {sk: v for (sk, h), v in ppm.items() if h == 2}
    both = sorted(set(v1) & set(v2))
    th = {}
    for name, s in (("v1", v1), ("v2", v2)):
        vals = sorted(s[c] for c in both)
        th[name] = [
            vals[max(1, math.ceil(k / 5.0 * len(vals))) - 1]
            for k in (1, 2, 3, 4)
        ]
    want = {}
    for c in both:
        q1 = 1 + sum(1 for t in th["v1"] if v1[c] > t)
        q2 = 1 + sum(1 for t in th["v2"] if v2[c] > t)
        want[(q1, q2)] = want.get((q1, q2), 0) + 1
    row_tot = {}
    for (q1, _q2), n in want.items():
        row_tot[q1] = row_tot.get(q1, 0) + n
    assert set(got) == set(want)
    for (q1, q2), n in want.items():
        r = got[(q1, q2)]
        assert r.n_suppliers == n
        assert r.n_q1 == row_tot[q1]
        assert r.row_share == n / row_tot[q1]
    assert sum(r.n_suppliers for r in got.values()) == len(both)


def test_orders_priority_mix_drift_scalar_reference(spark, sf_dir):
    """Python recount of the priority-mix drift: same epoch-week cells,
    same share and chi2 expressions over exact counts (stated
    left-associatively like both engines), same NULL-prev convention."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        orders_priority_mix_weekly_drift,
    )

    got = {
        (r.week, r.o_orderpriority): r
        for r in orders_priority_mix_weekly_drift(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderpriority"]
    ).to_pydict()
    cells = {}
    for d, pri in zip(o["o_orderdate"], o["o_orderpriority"]):
        w = int(d.timestamp()) // 86400 // 7
        cells[(w, pri)] = cells.get((w, pri), 0) + 1
    totals = {}
    for (w, _pri), n in cells.items():
        totals[w] = totals.get(w, 0) + n
    assert set(got) == set(cells)
    for (w, pri), n in cells.items():
        r = got[(w, pri)]
        assert r.n_orders == n
        assert r.week_total == totals[w]
        assert r.share == n / totals[w]
        prev = cells.get((w - 1, pri))
        if prev is None or (w - 1) not in totals:
            assert r.prev_n is None and r.chi2_term is None
        else:
            assert r.prev_n == prev
            e = float(prev) * totals[w] / totals[w - 1]
            assert r.chi2_term == (n - e) * (n - e) / e


def test_order_linecount_distribution_scalar_reference(spark, sf_dir):
    """Python recount of the l_orderkey fan-out distribution: same
    per-order counts, same histogram cells, same one-division shares and
    ascending cumulative."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        order_linecount_distribution,
    )

    got = {
        r.lines_per_order: r
        for r in order_linecount_distribution(spark, sf_dir).collect()
    }
    keys = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).to_pydict()["l_orderkey"]
    per_order: dict = {}
    for k in keys:
        per_order[k] = per_order.get(k, 0) + 1
    hist: dict = {}
    for _ok, k in per_order.items():
        hist[k] = hist.get(k, 0) + 1
    tot_orders = sum(hist.values())
    tot_lines = sum(k * c for k, c in hist.items())
    assert tot_lines == len(keys)
    assert set(got) == set(hist)
    cum = 0
    for k in sorted(hist):
        c = hist[k]
        cum += c
        r = got[k]
        assert r.n_orders == c
        assert r.n_lines == k * c
        assert r.order_share == c / tot_orders
        assert r.line_share == (k * c) / tot_lines
        assert r.cum_order_share == cum / tot_orders


def test_customer_balance_spend_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the cross-dimension quintile matrix: same cents
    grids (negative balances floor the same way), same max(1, ceil(q*n))
    thresholds, same value-based assignment, never-ordered customers as
    spend 0, mass law: cells sum to |customers|."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_balance_spend_matrix,
    )

    got = {
        (r.bal_quintile, r.spend_quintile): r
        for r in customer_balance_spend_matrix(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pydict()
    spend: dict = {}
    for ck, tp in zip(o["o_custkey"], o["o_totalprice"]):
        spend[ck] = spend.get(ck, 0) + math.floor(tp * 100 + 0.5)
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pydict()
    rows = [
        (math.floor(ab * 100 + 0.5), spend.get(ck, 0))
        for ck, ab in zip(c["c_custkey"], c["c_acctbal"])
    ]
    n = len(rows)

    def thresholds(vals):
        vals = sorted(vals)
        return [
            vals[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)
        ]

    tb = thresholds([b for b, _s in rows])
    ts = thresholds([s for _b, s in rows])
    want: dict = {}
    for bal, sp in rows:
        qb = 1 + sum(1 for t in tb if bal > t)
        qs = 1 + sum(1 for t in ts if sp > t)
        want[(qb, qs)] = want.get((qb, qs), 0) + 1
    row_tot: dict = {}
    for (qb, _qs), cnt in want.items():
        row_tot[qb] = row_tot.get(qb, 0) + cnt
    assert set(got) == set(want)
    for (qb, qs), cnt in want.items():
        r = got[(qb, qs)]
        assert r.n_customers == cnt
        assert r.n_bal == row_tot[qb]
        assert r.row_share == cnt / row_tot[qb]
    assert sum(r.n_customers for r in got.values()) == n


def test_event_transition_mix_drift_scalar_reference(spark, sf_dir):
    """Python recount of the sequence drift: same median split day
    (max(1, ceil(0.5*n)) order statistic), same (ts, event_id) adjacency,
    destination-half attribution, and the weekly-drift NULL convention
    on first-observed transitions."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.temporal import (
        event_transition_mix_drift,
    )

    got = {
        (r.from_type, r.to_type): r
        for r in event_transition_mix_drift(spark, sf_dir).collect()
    }
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    ).to_pydict()
    rows = [
        (u, int(ts.timestamp() * 1_000_000), e, et)
        for u, e, ts, et in zip(
            t["user_id"], t["event_id"], t["ts"], t["event_type"]
        )
    ]
    days = sorted(us // 1_000_000 // 86400 for _u, us, _e, _t in rows)
    mid = days[max(1, math.ceil(0.5 * len(days))) - 1]
    by_user: dict = {}
    for u, us, e, et in rows:
        by_user.setdefault(u, []).append((us, e, et, us // 1_000_000 // 86400))
    cells: dict = {}
    for seq in by_user.values():
        seq.sort()
        for prev, cur in zip(seq, seq[1:]):
            half = 1 if cur[3] <= mid else 2
            k = (half, prev[2], cur[2])
            cells[k] = cells.get(k, 0) + 1
    tot: dict = {}
    for (h, f, _t2), n in cells.items():
        tot[(h, f)] = tot.get((h, f), 0) + n
    want = {
        (f, t2): n for (h, f, t2), n in cells.items() if h == 2
    }
    assert set(got) == set(want)
    for (f, t2), n2 in want.items():
        r = got[(f, t2)]
        assert r.n2 == n2
        assert r.from_total2 == tot[(2, f)]
        assert r.share2 == n2 / tot[(2, f)]
        n1 = cells.get((1, f, t2))
        if n1 is None:
            assert r.n1 is None and r.chi2_term is None
        else:
            assert r.n1 == n1
            e = float(n1) * tot[(2, f)] / tot[(1, f)]
            assert r.chi2_term == (n2 - e) * (n2 - e) / e


def test_priority_leadtime_sla_scalar_reference(spark, sf_dir):
    """Python recount of the per-priority SLA profile: same epoch-day
    lags, tie-inclusive cume_dist percentile selection, and the >90-day
    late share as one division."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        priority_leadtime_sla_profile,
    )

    got = {
        r.o_orderpriority: r
        for r in priority_leadtime_sla_profile(spark, sf_dir).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).to_pydict()
    omap = {
        k: (p, int(d.timestamp()) // 86400)
        for k, p, d in zip(
            o["o_orderkey"], o["o_orderpriority"], o["o_orderdate"]
        )
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pydict()
    lags: dict = {}
    for k, s in zip(li["l_orderkey"], li["l_shipdate"]):
        p, dord = omap[k]
        lags.setdefault(p, []).append(int(s.timestamp()) // 86400 - dord)

    def pick(vals, q):
        n = len(vals)
        cum = 0
        for i, v in enumerate(vals):
            cum = i + 1
            if i + 1 < n and vals[i + 1] == v:
                continue
            if cum / n >= q:
                return v

    assert set(got) == set(lags)
    for p, vs in lags.items():
        vs.sort()
        r = got[p]
        n_late = sum(1 for v in vs if v > 90)
        assert r.n_lines == len(vs)
        assert r.p50_lag_days == pick(vs, 0.5)
        assert r.p90_lag_days == pick(vs, 0.9)
        assert r.p99_lag_days == pick(vs, 0.99)
        assert r.n_late == n_late
        assert r.late_share == n_late / len(vs)


def test_order_price_reconciliation_scalar_reference(spark, sf_dir):
    """Python recount of the reconciliation audit with exact decimal
    line recompute (Fraction arithmetic — no FP in the cents grid),
    same class partition, shares, drift sums and per-class max(1,
    ceil(q*n)) percentiles."""
    import math
    from fractions import Fraction

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        order_price_reconciliation,
    )

    got = {
        r.diff_class: r
        for r in order_price_reconciliation(spark, sf_dir).collect()
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    ).to_pydict()
    rec: dict = {}
    cent = Fraction(1, 100)
    for k, ep, dc, tx in zip(
        li["l_orderkey"], li["l_extendedprice"], li["l_discount"], li["l_tax"]
    ):
        # the stored doubles are exact 2-decimal values; snap to the
        # decimal grid the engines' DECIMAL(18,2) casts land on.
        epf = Fraction(round(ep * 100)) * cent
        dcf = Fraction(round(dc * 100)) * cent
        txf = Fraction(round(tx * 100)) * cent
        rec[k] = rec.get(k, Fraction(0)) + epf * (1 - dcf) * (1 + txf)
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pydict()
    rows = []
    for k, tp in zip(o["o_orderkey"], o["o_totalprice"]):
        oc = math.floor(tp * 100 + 0.5)
        if k not in rec:
            rows.append(("no_lines", None))
            continue
        rc = math.floor(rec[k] * 100 + Fraction(1, 2))
        cls = "over" if oc > rc else ("under" if oc < rc else "exact")
        rows.append((cls, abs(oc - rc)))
    want: dict = {}
    for cls, ad in rows:
        want.setdefault(cls, []).append(ad)
    assert set(got) == set(want)
    total = len(rows)
    for cls, ads in want.items():
        r = got[cls]
        assert r.n_orders == len(ads)
        assert r.order_share == len(ads) / total
        if cls == "no_lines":
            assert r.total_abs_diff_cents is None
            assert r.p50_abs_diff_cents is None
            assert r.p90_abs_diff_cents is None
            continue
        assert r.total_abs_diff_cents == sum(ads)
        ads.sort()
        for q, col in ((0.5, "p50_abs_diff_cents"), (0.9, "p90_abs_diff_cents")):
            k = max(1, math.ceil(q * len(ads)))
            assert getattr(r, col) == ads[k - 1]


def test_revenue_weighted_leadtime_scalar_reference(spark, sf_dir):
    """Python recount of the revenue-weighted lag percentiles: exact
    per-line cents (2-decimal grid arithmetic via integer cents), same
    tie-inclusive cumulative-share selection, and the weighted median
    never below zero mass."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        revenue_weighted_leadtime_percentiles,
    )

    got = {
        r.o_orderpriority: r
        for r in revenue_weighted_leadtime_percentiles(
            spark, sf_dir
        ).collect()
    }
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).to_pydict()
    omap = {
        k: (p, int(d.timestamp()) // 86400)
        for k, p, d in zip(
            o["o_orderkey"], o["o_orderpriority"], o["o_orderdate"]
        )
    }
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).to_pydict()
    per_p: dict = {}
    for k, s, ep, dc in zip(
        li["l_orderkey"], li["l_shipdate"], li["l_extendedprice"],
        li["l_discount"],
    ):
        p, dord = omap[k]
        lag = int(s.timestamp()) // 86400 - dord
        # exact integer-cents arithmetic on the 2-decimal grid:
        # extprice_cents * (100 - disc_pct) is cents*1e2; the money floor
        # of (price*(1-disc))*100 + 0.5 on a 4-decimal exact product is
        # round-half-up at the hundredths of a cent.
        epc = round(ep * 100)
        dpc = round(dc * 100)
        quarter = epc * (100 - dpc)  # units of 1e-4 dollars = 1e-2 cents
        rev_cents = (quarter * 10 + 500) // 1000  # floor(q/100 + 0.5)
        per_p.setdefault(p, []).append((lag, rev_cents))

    def pick(pairs, weighted, q):
        tot = sum(w for _v, w in pairs) if weighted else len(pairs)
        cum = 0
        for i, (v, w) in enumerate(pairs):
            cum += w if weighted else 1
            if i + 1 < len(pairs) and pairs[i + 1][0] == v:
                continue
            if cum / tot >= q:
                return v
        return None

    assert set(got) == set(per_p)
    for p, pairs in per_p.items():
        pairs.sort()
        r = got[p]
        assert r.n_lines == len(pairs)
        assert r.total_rev_cents == sum(w for _v, w in pairs)
        assert r.p50_lag_days == pick(pairs, False, 0.5)
        assert r.w50_lag_days == pick(pairs, True, 0.5)
        assert r.w90_lag_days == pick(pairs, True, 0.9)


def test_modal_priority_by_nation_scalar_reference(spark, sf_dir):
    """Python recount of the grouped mode: same cells, highest count with
    lexicographically-smallest-priority tie break, share as one
    division."""
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.tpch_extra import (
        modal_priority_by_nation,
    )

    got = {
        r.nation: r for r in modal_priority_by_nation(spark, sf_dir).collect()
    }
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pydict()
    cmap = dict(zip(c["c_custkey"], c["c_nationkey"]))
    n = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pydict()
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).to_pydict()
    cells: dict = {}
    for ck, p in zip(o["o_custkey"], o["o_orderpriority"]):
        nat = nmap[cmap[ck]]
        cells[(nat, p)] = cells.get((nat, p), 0) + 1
    per: dict = {}
    for (nat, p), cnt in cells.items():
        tot, best = per.get(nat, (0, None))
        per[nat] = (tot + cnt, best)
    for (nat, p), cnt in cells.items():
        tot, best = per[nat]
        if best is None or (-cnt, p) < best:
            per[nat] = (tot, (-cnt, p))
    assert set(got) == set(per)
    for nat, (tot, (negcnt, p)) in per.items():
        r = got[nat]
        assert r.modal_priority == p
        assert r.n_orders == -negcnt
        assert r.nation_total == tot
        assert r.modal_share == -negcnt / tot


def test_events_value_weighted_dow_hour_profile_scalar_reference(spark, sf_dir):
    """Python recount of the 168-cell weekly value profile from raw
    parquet micros: same integer dow/hour bucketing (epoch day 0 =
    Thursday), same micro quantization, same one-IEEE-division shares;
    grid is bounded and the two share columns each sum to 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        events_value_weighted_dow_hour_profile,
    )

    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    micros = tbl["ts"].cast(pa.int64()).to_pylist()
    values = tbl["value"].to_pylist()
    cells = {}
    import math

    for us, v in zip(micros, values):
        if v is None:
            continue
        sec = us // 1_000_000
        key = ((sec // 86400 + 3) % 7 + 1, (sec // 3600) % 24)
        n, m = cells.get(key, (0, 0))
        cells[key] = (n + 1, m + int(math.floor(v * 1_000_000 + 0.5)))
    tn = sum(n for n, _ in cells.values())
    tm = sum(m for _, m in cells.values())
    got = {
        (r.dow, r.hour_utc): r
        for r in events_value_weighted_dow_hour_profile(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    assert len(got) <= 168
    for key, (n, m) in cells.items():
        row = got[key]
        assert row.n_events == n
        assert row.value_micro == m
        assert row.event_share == n / tn
        assert row.value_share == m / tm
        assert row.value_per_event_index == (m / tm) / (n / tn)
        assert 1 <= row.dow <= 7 and 0 <= row.hour_utc <= 23


def test_customer_gap_vs_value_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the cadence x spend quintile matrix: same
    (day, o_orderkey)-tie-broken gaps, same cume_dist>=0.5 median, same
    exact cents, same max(1, ceil(k/5*n)) thresholds and strict-greater
    CASE ladder; row shares partition each cadence row."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        customer_gap_vs_value_matrix,
    )

    tbl = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    import pyarrow as pa

    days = [us // 86_400_000_000 for us in tbl["o_orderdate"].cast(pa.int64()).to_pylist()]
    rows = sorted(
        zip(tbl["o_custkey"].to_pylist(), days, tbl["o_orderkey"].to_pylist(),
            tbl["o_totalprice"].to_pylist())
    )
    by_ck: dict[int, list[tuple[int, int]]] = {}
    spend: dict[int, int] = {}
    for ck, day, ok, price in rows:
        by_ck.setdefault(ck, []).append((day, ok))
        spend[ck] = spend.get(ck, 0) + int(math.floor(price * 100 + 0.5))
    med: dict[int, int] = {}
    for ck, orders in by_ck.items():
        orders.sort()
        gaps = sorted(
            orders[i + 1][0] - orders[i][0] for i in range(len(orders) - 1)
        )
        if not gaps:
            continue
        med[ck] = gaps[max(1, math.ceil(0.5 * len(gaps))) - 1]
    cks = sorted(med)
    n = len(cks)

    def thresholds(vals: list[int]) -> list[int]:
        s = sorted(vals)
        return [s[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)]

    tv = thresholds([med[ck] for ck in cks])
    ts = thresholds([spend[ck] for ck in cks])
    cells: dict[tuple[int, int], int] = {}
    for ck in cks:
        gq = 1 + sum(1 for t in tv if med[ck] > t)
        sq = 1 + sum(1 for t in ts if spend[ck] > t)
        cells[(gq, sq)] = cells.get((gq, sq), 0) + 1
    row_tot: dict[int, int] = {}
    for (gq, _sq), c in cells.items():
        row_tot[gq] = row_tot.get(gq, 0) + c
    got = {
        (r.gap_quintile, r.spend_quintile): r
        for r in customer_gap_vs_value_matrix(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for key, c in cells.items():
        r = got[key]
        assert r.n_customers == c
        assert r.n_row == row_tot[key[0]]
        assert r.row_share == c / row_tot[key[0]]
    assert sum(cells.values()) == n


def test_supplier_balance_leadtime_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the balance x lead-time quintile matrix: same
    day-integer ship lags, same cume_dist>=0.5 per-supplier median, same
    exact balance cents, same max(1, ceil(k/5*n)) thresholds and
    strict-greater CASE ladder; row shares partition each balance row."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        supplier_balance_leadtime_interaction,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    odate = {
        k: us // 86_400_000_000
        for k, us in zip(
            o["o_orderkey"].to_pylist(),
            o["o_orderdate"].cast(pa.int64()).to_pylist(),
        )
    }
    lags: dict[int, list[int]] = {}
    for ok, sk, ship_us in zip(
        li["l_orderkey"].to_pylist(),
        li["l_suppkey"].to_pylist(),
        li["l_shipdate"].cast(pa.int64()).to_pylist(),
    ):
        lags.setdefault(sk, []).append(ship_us // 86_400_000_000 - odate[ok])
    med = {
        sk: sorted(v)[max(1, math.ceil(0.5 * len(v))) - 1]
        for sk, v in lags.items()
    }
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    bal = {
        sk: int(math.floor(b * 100 + 0.5))
        for sk, b in zip(
            sup["s_suppkey"].to_pylist(), sup["s_acctbal"].to_pylist()
        )
    }
    sks = sorted(set(med) & set(bal))
    n = len(sks)

    def thresholds(vals: "list[int]") -> "list[int]":
        s = sorted(vals)
        return [s[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)]

    tb = thresholds([bal[sk] for sk in sks])
    tl = thresholds([med[sk] for sk in sks])
    cells: dict = {}
    for sk in sks:
        bq = 1 + sum(1 for t in tb if bal[sk] > t)
        lq = 1 + sum(1 for t in tl if med[sk] > t)
        cells[(bq, lq)] = cells.get((bq, lq), 0) + 1
    row_tot: dict = {}
    for (bq, _lq), c in cells.items():
        row_tot[bq] = row_tot.get(bq, 0) + c
    got = {
        (r.bal_quintile, r.leadtime_quintile): r
        for r in supplier_balance_leadtime_interaction(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for key, c in cells.items():
        r = got[key]
        assert r.n_suppliers == c
        assert r.n_row == row_tot[key[0]]
        assert r.row_share == c / row_tot[key[0]]
    assert sum(cells.values()) == n


def test_events_value_dow_hour_drift_scalar_reference(spark, sf_dir):
    """Python recount of the half-split value-grid drift: same
    max(1, ceil(0.5*n)) median epoch-second, same TZ-proof dow/hour
    integer arithmetic, same micro-unit masses, same IEEE chi2 term
    order (e = mass1*tm2/tm1; (m2-e)*(m2-e)/e)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        events_value_weighted_dow_hour_drift,
    )

    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    rows = [
        (us // 1_000_000, v)
        for us, v in zip(
            tbl["ts"].cast(pa.int64()).to_pylist(), tbl["value"].to_pylist()
        )
        if v is not None
    ]
    secs = sorted(s for s, _ in rows)
    mid = secs[max(1, math.ceil(0.5 * len(secs))) - 1]
    cells: dict = {}
    for s, v in rows:
        half = 1 if s <= mid else 2
        key = (half, (s // 86400 + 3) % 7 + 1, (s // 3600) % 24)
        n, mass = cells.get(key, (0, 0))
        cells[key] = (n + 1, mass + int(math.floor(v * 1_000_000 + 0.5)))
    tm1 = sum(m for (h, _d, _u), (_n, m) in cells.items() if h == 1)
    tm2 = sum(m for (h, _d, _u), (_n, m) in cells.items() if h == 2)
    got = {
        (r.dow, r.hour_utc): r
        for r in events_value_weighted_dow_hour_drift(spark, sf_dir).collect()
    }
    want_keys = {(d, u) for (h, d, u) in cells if h == 2}
    assert set(got) == want_keys
    for (d, u) in want_keys:
        n2, m2 = cells[(2, d, u)]
        r = got[(d, u)]
        assert r.n_events2 == n2
        assert r.value_micro2 == m2
        assert r.value_share2 == m2 / tm2
        h1 = cells.get((1, d, u))
        if h1 is None:
            assert r.value_micro1 is None and r.chi2_term is None
        else:
            m1 = h1[1]
            assert r.value_micro1 == m1
            e = float(m1) * tm2 / tm1
            assert r.chi2_term == (m2 - e) * (m2 - e) / e


def test_approx_quantile_error_partial_oracle_pure_python(spark, sf_dir):
    """PARTIAL ORACLE (round-16 wave 2): everything downstream of the
    GK sketch value is re-derived outside the engine. Per (priority, q):
    the exact quantile (sorted-values rank max(1, ceil(q*n)) — the
    cume_dist>=q selection) and n recomputed pure-python from raw
    parquet AND directly double-pinned by DuckDB re-running
    exact_percentiles_disc's REGISTERED oracle; then, taking the
    engine's approx_value as the one engine-specific input (the
    documented sketch why-not), the exact rank of that value (count of
    values <= it), the ceil(q*n) target, rank_err, the formal
    ceil(n/accuracy)+1 bound, within_bound and the floor-rounded
    value_err are all recomputed and matched exactly."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.stats import (
        _APPROX_ACC,
        _APPROX_QS,
        approx_vs_exact_quantile_error,
    )
    from tests.helpers import duckdb_con

    tbl = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    by_p: dict = {}
    for p, v in zip(
        tbl["o_orderpriority"].to_pylist(), tbl["o_totalprice"].to_pylist()
    ):
        by_p.setdefault(p, []).append(v)
    for vs in by_p.values():
        vs.sort()
    rows = approx_vs_exact_quantile_error(spark, sf_dir).collect()
    assert {(r.o_orderpriority, r.q) for r in rows} == {
        (p, q) for p in by_p for q in _APPROX_QS
    }
    for r in rows:
        vs = by_p[r.o_orderpriority]
        n = len(vs)
        assert r.n == n
        exact = vs[max(1, math.ceil(r.q * n)) - 1]
        assert r.exact_value == exact
        # engine-specific input: the sketch's value; everything from
        # here is exact arithmetic over it.
        approx_rank = sum(1 for v in vs if v <= r.approx_value)
        target = math.ceil(r.q * n)
        rank_err = abs(approx_rank - target)
        bound = math.ceil(n / _APPROX_ACC) + 1
        assert r.rank_err == rank_err
        assert r.rank_err_bound == bound
        assert r.within_bound == (rank_err <= bound)
        assert r.value_err == math.floor(
            abs(r.approx_value - exact) * 100 + 0.5
        ) / 100
    # Direct DuckDB double-pin of the exact side: re-run the REGISTERED
    # exact_percentiles_disc oracle and match exact_value and n.
    from mapreduce_infrastructure_spark.registry import all_queries

    con = duckdb_con(sf_dir)
    sql = all_queries()["exact_percentiles_disc"].oracle
    duck = {
        row[0]: row
        for row in con.execute(sql).fetchall()
    }
    cols = [d[0] for d in con.execute(sql).description]
    for r in rows:
        d = dict(zip(cols, duck[r.o_orderpriority]))
        want = {0.5: d["p50"], 0.95: d["p95"], 0.99: d["p99"]}[r.q]
        assert r.exact_value == want
        assert r.n == d["n_orders"]
