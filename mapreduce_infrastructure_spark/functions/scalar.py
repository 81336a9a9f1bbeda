"""Scalar function surface (SURVEY.md §2B "Scalar functions").

The reference's only scalar ops are tokenization by a delimiter set
(``test/user_tasks.cc:15-20``), string→int parse (``test/user_tasks.cc:31``)
and string hashing (``src/mr_tasks.h:65,72``). The new engine exposes the
curated built-in surface below — string, date/time, math, JSON and array
functions — all JVM-side expressions inside whole-stage codegen (no Python
in the hot path, the 100 TB requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from .exact import rnd
from ..registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           substring(p_type, 1, 5) AS type5,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_us
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/length/concat/replace."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/date_trunc/datediff. Timestamps are emitted as
    epoch seconds (BIGINT) so the differential check is precision-agnostic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate")))
        .cast("long")
        .alias("month_start_epoch"),
        F.datediff(F.lit("2002-01-01"), F.col("o_orderdate")).alias("days_to_2002"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((abs(l_discount - 0.05)) * 100 + 0.5) / 100 AS disc_dev,
           floor((sqrt(l_quantity)) * 10000 + 0.5) / 10000 AS qty_sqrt,
           floor((ln(l_quantity)) * 10000 + 0.5) / 10000 AS qty_ln,
           floor((l_discount * l_discount) * 10000 + 0.5) / 10000 AS disc_sq,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           l_orderkey % 7 AS key_mod7
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/sqrt/ln/floor/ceil/modulo over stored doubles (IEEE-exact or
    rounded to absorb last-ulp libm differences)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.abs(F.col("l_discount") - 0.05), 2).alias("disc_dev"),
        rnd(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        rnd(F.log("l_quantity"), 4).alias("qty_ln"),
        rnd(F.col("l_discount") * F.col("l_discount"), 4).alias("disc_sq"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
    tags=("scalar", "json"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON extraction from the events.props string column
    (reference analogue: user map() parsing opaque record text)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@query(
    "json_agg_by_type",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "agg"),
)
def json_agg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over JSON-extracted values (from_json would also work; the
    path extraction stays codegen'd either way)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_val,
           floor((sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))) * 10000 + 0.5) / 10000 AS l2_norm,
           floor((CAST(list_sum(CAST(embedding AS DOUBLE[])) AS DOUBLE) / len(embedding)) * 10000 + 0.5) / 10000 AS mean_val
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size / index / higher-order aggregate over ArrayType(Float) —
    the base arithmetic for the similarity operators, all JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform(as_double, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        rnd(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        rnd(F.sqrt(sq_sum), 4).alias("l2_norm"),
        rnd(
            F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"),
            4,
        ).alias("mean_val"),
    )


@query(
    "map_functions",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
    FROM events
    GROUP BY user_id
    """,
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction and access: per-user event_type→count map built
    with map_from_entries(collect_list(struct)), read back with element_at /
    size — the typed-dictionary column pattern (feature maps, sparse stats)
    carried through a relational plan. Output is plain columns so the oracle
    can state the same facts as conditional aggregates."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return with_map.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("purchases"),
    )


@query(
    "posexplode_tokens",
    oracle="""
    SELECT d.doc_id,
           CAST(t.i - 1 AS INTEGER) AS pos,
           d.toks[t.i] AS token
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents WHERE doc_id < 20) d,
         LATERAL unnest(generate_series(1, len(d.toks))) AS t(i)
    """,
    tags=("scalar", "udtf", "explode"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional table function (UDTF with ordinality): token stream with
    0-based positions for the first docs — the tokenize step of any
    sequence-model pipeline, where position matters (n-gram windows,
    truncation). posexplode is the generator form of the reference's
    emit-N-rows mapper (external/include/mr_task_factory.h:20-21)."""
    from ..llm.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "token")
    )


@query(
    "fuzzy_match_nations",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
    tags=("scalar", "string", "fuzzy"),
)
def fuzzy_match_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via edit distance — the entity-resolution
    primitive (dirty dimension values, near-identical names): nation-name
    pairs within Levenshtein distance 4. Both engines implement the
    standard Wagner-Fischer distance on integer costs, so results match
    exactly. The demo joins a dimension against itself (25×25 — broadcast,
    trivially); at corpus scale the same predicate runs AFTER a blocking
    key (prefix, length band, or LSH bucket) exactly like the dedup tiers
    — never as a raw cross join. Spark exposes a max-distance arg
    (levenshtein(l, r, threshold)) that short-circuits the DP early —
    the form a scaled run uses."""
    n = load_table(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .filter(dist <= 4)
        .select("name_a", "name_b", dist.alias("dist"))
    )
