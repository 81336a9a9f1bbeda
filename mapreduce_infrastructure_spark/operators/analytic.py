"""Window / analytic functions (SURVEY.md §2B "Window functions").

Entirely absent in the reference (its only ordering guarantee is key-sorted
reducer output via std::map iteration, ``src/mr_tasks.h:101``,
``description.md:56``). Implemented on Spark's native window exec.

Determinism rule used throughout: every ORDER BY carries a unique tie-break
key (custkey/orderkey/event_id) so rank/lag/frame results are identical in
any engine and at any parallelism. Frame sums use DECIMAL-exact arithmetic
(see functions/exact.py).

Scale note: window functions shuffle once on partitionBy keys and sort within
partitions; a partition's rows must fit an executor's spill budget — the
partition keys here (segment, custkey, user_id) are high-cardinality, so no
single-partition hot spot. A global-ORDER-BY window with no partitionBy is
the anti-pattern at 100 TB and does not appear here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..functions.exact import dec, rnd
from ..functions.ranks import bucketed_prefix_max
from ..registry import query


@query(
    "window_rank_acctbal",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(rank()       OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(row_number() OVER w AS INTEGER) AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per market segment."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_orderkey, o_custkey,
           floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100 + 0.5) / 100
             AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per customer in order-date order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        rnd(F.sum(dec("o_totalprice")).over(w).cast("double"), 2).alias(
            "running_spend"
        ),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           floor((value - lag(value) OVER w) * 100 + 0.5) / 100 AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "events"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event-time-ordered stream (the batch
    analogue of per-key stream state)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        rnd(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "window_movavg_ntile",
    oracle="""
    SELECT o_orderkey, o_custkey,
           floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
                 / COUNT(*) OVER w3) * 100 + 0.5) / 100 AS movavg3,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS quartile
    FROM orders
    WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_movavg_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (DECIMAL-exact sum / frame count) + ntile."""
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w3 = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    wn = Window.partitionBy("o_custkey").orderBy(*order)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        rnd(
            F.sum(dec("o_totalprice")).over(w3).cast("double")
            / F.count(F.lit(1)).over(w3),
            2,
        ).alias("movavg3"),
        F.ntile(4).over(wn).alias("quartile"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_totalprice) OVER w AS first_order_price,
           last_value(o_totalprice)  OVER w AS last_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order price per customer (full-partition frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_order_price"),
            F.last("o_totalprice").over(w).alias("last_order_price"),
        )
        .distinct()
    )


@query(
    "window_range_7day_sum",
    oracle="""
    SELECT o_orderkey,
           epoch_us(o_orderdate) // 1000000 AS od_epoch,
           floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate
                    RANGE BETWEEN INTERVAL '7 days' PRECEDING AND CURRENT ROW
                  ) AS DOUBLE)) * 100 + 0.5) / 100 AS trailing_7d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_range_7day_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per customer, the trailing-7-day order total at
    each order (event-TIME frame, not row count — rows with equal dates all
    see the same frame, which a ROWS frame gets wrong). Spark expresses
    interval range frames over the epoch-seconds ordering column.

    At 100 TB this is the rolling-feature generator for training data; one
    shuffle on the partition key, sorted within partitions."""
    o = load_table(spark, sf_dir, "orders")
    # Integer-exact epoch: unix_timestamp truncates while DuckDB's
    # CAST(epoch(...)) rounds — both sides now floor microseconds, so a
    # fractional-second orderdate can never split the engines.
    od_epoch = F.expr("unix_micros(o_orderdate) div 1000000")
    # Frame over MICROseconds: unix_timestamp() truncates to whole seconds,
    # which would shift sub-second order dates in/out of the 7-day bound
    # relative to the oracle's full-precision interval arithmetic.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return o.select(
        "o_orderkey",
        od_epoch.alias("od_epoch"),
        rnd(
            F.sum(dec("o_totalprice")).over(w).cast("double"), 2
        ).alias("trailing_7d"),
    )


@query(
    "rolling_7day_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // CAST(86400000000 AS BIGINT) AS BIGINT) AS day
      FROM events
    ), days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day, COUNT(DISTINCT u.user_id) AS active_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    tags=("events", "metrics", "window-time"),
)
def rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the WAU/DAU family
    metric that a windowed COUNT(DISTINCT) cannot express (distinct doesn't
    decompose over sliding frames, so engines reject it in a window).
    The scale-correct form: distinct (user, epoch-day) pairs — already a
    tiny fraction of the event log — range-joined onto the day axis and
    re-counted per target day.

    Plan: the fact scan reduces to |users|×|days| pairs in one shuffle; the
    range join is a BroadcastNestedLoop against the DAY AXIS (tens-to-
    thousands of rows — broadcast side is the axis, never the data), then
    one count-distinct shuffle. Integer epoch-day arithmetic, engine-proof."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).distinct()
    days = ud.select("day").distinct().select(F.col("day").alias("d"))
    return (
        ud.join(
            F.broadcast(days),
            (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")),
        )
        .groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


@query(
    "copurchase_supplier_pairs",
    oracle="""
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT a.supp AS supp_a, b.supp AS supp_b, COUNT(*) AS n_shared_customers
    FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
    GROUP BY 1, 2
    HAVING COUNT(*) >= 30
    """,
    tags=("agg", "join", "recsys"),
)
def copurchase_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence (market-basket): supplier pairs ranked by how
    many customers buy from both — the counting core of co-purchase
    recommenders. The self-join runs on the DISTINCT (customer, supplier)
    projection, so each customer contributes |suppliers|² pairs with the
    per-customer fan bounded by basket size, not event volume; the HAVING
    floor keeps only statistically meaningful pairs.

    At 100 TB the same shape holds (one shuffle on customer for the
    self-join, one on the pair key); for catalogs where baskets are huge,
    cap the per-key fan with the prefix-filter candidate trick used in
    llm/dedup.py."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    a = cs.select("cust", F.col("supp").alias("supp_a"))
    b = cs.select(F.col("cust").alias("cust_b"), F.col("supp").alias("supp_b"))
    return (
        a.join(b, (a.cust == b.cust_b) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_shared_customers"))
        .filter(F.col("n_shared_customers") >= 30)
    )


@query(
    "skyline_2d_parts",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, p_retailprice, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      FROM part
    )
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.cents <= p.cents AND q.p_size >= p.p_size
        AND (q.cents < p.cents OR q.p_size > p.p_size)
    )
    """,
    tags=("analytic", "skyline"),
)
def skyline_2d_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts no other part dominates —
    cheaper-or-equal AND bigger-or-equal with at least one strict. The
    classic catalog query ("show me the price/size efficient frontier")
    and the textbook case where the naive NOT EXISTS self-join (the
    oracle's form, O(n²)) must become a sweep: sort by price, a part is
    on the frontier iff its size beats the max size of every strictly
    cheaper part and ties the max size at its own price point.

    Scale: prices collapse to an exact integer-cents HISTOGRAM first
    (max size per distinct price — domain-bounded however large the
    catalog), then ``bucketed_prefix_max`` computes the strictly-cheaper
    threshold with range-bucket parallelism — no global window, no
    single-partition exchange, no cartesian. The verdict join back to
    rows is a histogram-keyed equi-join. Equal (price, size) duplicates
    all survive: neither dominates the other (no strict inequality)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_retailprice",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    hist = p.groupBy("cents").agg(F.max("p_size").cast("long").alias("eq_max"))
    thresh = bucketed_prefix_max(hist, [], "cents", "eq_max")
    return (
        p.join(thresh, "cents")
        .filter(
            (F.col("p_size") == F.col("eq_max"))
            & (
                F.col("prefix_max_before").isNull()
                | (F.col("prefix_max_before") < F.col("p_size"))
            )
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


@query(
    "skyline_docs_vocab_tokens",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_vocab
      FROM (SELECT doc_id, source,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM documents)
    )
    SELECT doc_id, source, n_tokens, n_vocab
    FROM d p
    WHERE NOT EXISTS (
      SELECT 1 FROM d q
      WHERE q.n_tokens <= p.n_tokens AND q.n_vocab >= p.n_vocab
        AND (q.n_tokens < p.n_tokens OR q.n_vocab > p.n_vocab)
    )
    """,
    tags=("analytic", "skyline", "llm"),
)
def skyline_docs_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-density frontier over documents: the docs for which no
    other doc offers at-least-as-much DISTINCT vocabulary for
    at-most-as-many tokens (one strict) — the curation question "which
    documents buy the most lexical diversity per token of training
    budget?". Second frontier variant (after `skyline_2d_parts`), same
    sweep: both axes are integer token statistics, so token count
    collapses to an exact HISTOGRAM (max vocab per distinct n_tokens —
    domain-bounded however large the corpus), ``bucketed_prefix_max``
    computes the strictly-shorter threshold with range-bucket
    parallelism, and the verdict join back to docs is histogram-keyed.
    No global window, no O(n²) self-join (that is the oracle's NOT
    EXISTS form). Ties on both axes all survive, as in the parts
    skyline."""
    from ..llm.text import tokens_col

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens_col())).cast("long").alias("n_vocab"),
    )
    hist = d.groupBy("n_tokens").agg(F.max("n_vocab").alias("eq_max"))
    thresh = bucketed_prefix_max(hist, [], "n_tokens", "eq_max")
    return (
        d.join(thresh, "n_tokens")
        .filter(
            (F.col("n_vocab") == F.col("eq_max"))
            & (
                F.col("prefix_max_before").isNull()
                | (F.col("prefix_max_before") < F.col("n_vocab"))
            )
        )
        .select("doc_id", "source", "n_tokens", "n_vocab")
    )
