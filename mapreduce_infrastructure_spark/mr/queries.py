"""Oracle-checked queries exercising the MR-compat layer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..registry import query
from .runner import run_mr_job


@query(
    "mr_wordcount",
    oracle="""
    SELECT word, cnt FROM (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest(regexp_split_to_array(text, '[ ,."'']+')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    )
    """,
    tags=("mr-compat", "text"),
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the reference-parity API: BaseMapper tokenizing on
    the reference's delimiter set (``test/user_tasks.cc:12-22``) → hash
    shuffle → BaseReducer integer sum (``:29-33``), via mr.runner.run_mr_job.

    The oracle states the SAME tokenizer contract structurally — split on
    the reference's literal delimiter set ``" ,.\\"'"`` with NO lowercasing
    — so the equivalence holds for any corpus, not just one that happens to
    be lowercase with single spaces.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    kv = run_mr_job(spark, docs, user_id="cs6210", num_output_files=8)
    return kv.select(
        F.col("key").alias("word"), F.col("value").cast("long").alias("cnt")
    )


@query(
    "mr_inverted_index",
    oracle="""
    SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
    FROM (SELECT DISTINCT doc_id,
                 unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
          FROM documents)
    GROUP BY term
    """,
    tags=("mr-compat", "text", "index"),
)
def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index through the MR-compat API under a SECOND user_id —
    the registry carries arbitrary tasks (reference
    ``src/mr_task_factory.cc:28-88``), not just the shipped demo. Mapper
    emits (term, doc_id); reducer dedupes and joins ids ascending. The
    corpus is space-separated lowercase words, so the whitespace split
    matches the oracle's string_split exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("\t", F.col("doc_id"), F.col("text")).alias("record")
    )
    kv = run_mr_job(spark, docs, user_id="invidx", num_output_files=8)
    return kv.select(F.col("key").alias("term"), F.col("value").alias("docs"))


@query(
    "mr_grep",
    oracle="""
    SELECT doc_id, text FROM documents WHERE text LIKE '%spark%'
    """,
    tags=("mr-compat", "text", "grep"),
)
def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep through the MR-compat API (third registered
    user_id): mapper emits matching records, identity reducer — the
    MapReduce paper's first example (OSDI'04 §2.3). In the declarative
    engine this is just a pushed-down LIKE filter (the oracle); running it
    through run_mr_job exercises the arbitrary-task path end to end."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("\t", F.col("doc_id"), F.col("text")).alias("record")
    )
    kv = run_mr_job(spark, docs, user_id="grep", num_output_files=4)
    return kv.select(
        F.col("key").cast("long").alias("doc_id"), F.col("value").alias("text")
    )


@query(
    "mr_bigram_count",
    oracle="""
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents)
    )
    GROUP BY bigram
    """,
    tags=("mr-compat", "text", "ngram"),
)
def mr_bigram_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram count through the MR-compat API (fourth registered user_id):
    a mapper whose emits depend on SEQUENTIAL per-record state (previous
    token), composed with the demo's integer-sum reducer — the registry
    carries arbitrary (mapper, reducer) pairings, reference
    ``src/mr_task_factory.cc:28-88``. The oracle states the same
    whitespace tokenizer and adjacent-pair construction structurally
    (list_transform over token indexes), so the equivalence holds for
    any corpus."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    kv = run_mr_job(spark, docs, user_id="bigram", num_output_files=8)
    return kv.select(
        F.col("key").alias("bigram"), F.col("value").cast("long").alias("cnt")
    )


@query(
    "mr_doclen_stats_by_source",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    tags=("mr-compat", "text", "agg"),
)
def mr_doclen_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length stats through the MR-compat API (fifth
    registered user_id): the reducer computes an ALGEBRAIC aggregate —
    count and sum folded in one pass over the value iterator — and ships
    the pair as a composite ``n|total`` string through the reference's
    string-typed value channel (``src/mr_tasks.h:55``), which the query
    layer splits back into typed columns. Completes the reducer-shape
    coverage: distributive sum (wordcount/bigram), dedup-and-join
    (invidx), identity (grep), and now multi-field algebraic state.
    Integer-only channel, so no float formatting can drift between
    engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("\t", F.col("source"), F.col("n_chars")).alias("record")
    )
    kv = run_mr_job(spark, docs, user_id="doclenstats", num_output_files=4)
    parts = F.split(F.col("value"), "\\|")
    return kv.select(
        F.col("key").alias("source"),
        parts.getItem(0).cast("long").alias("n_docs"),
        parts.getItem(1).cast("long").alias("total_chars"),
    )


@query(
    "mr_topk_per_key",
    oracle="""
    WITH r AS (
      SELECT source, n_chars, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT source, CAST(rn AS BIGINT) AS rank,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(doc_id AS BIGINT) AS doc_id
    FROM r WHERE rn <= 3
    """,
    tags=("mr-compat", "topk", "selective"),
)
def mr_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per source through the MR-compat API
    (sixth registered user_id): the reducer is SELECTIVE-EMIT with
    BOUNDED state — a 3-item heap per key, emitting only the kept
    candidates however many values stream through (the reference's
    contract allows zero-or-more emits per reduce,
    ``external/include/mr_task_factory.h:38``; the five other user_ids
    all emit one-per-key or pass-through, so this pins the last reducer
    shape). Order n_chars DESC, doc_id ASC — stated, so the oracle's
    row_number selection is the same top-3. The rank|n_chars|doc_id
    composite is integer-only through the string value channel
    (``src/mr_tasks.h:55``); the query layer splits it back into typed
    columns."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat_ws(
            "\t", F.col("source"), F.col("n_chars"), F.col("doc_id")
        ).alias("record")
    )
    kv = run_mr_job(spark, docs, user_id="topk", num_output_files=4)
    parts = F.split(F.col("value"), "\\|")
    return kv.select(
        F.col("key").alias("source"),
        parts.getItem(0).cast("long").alias("rank"),
        parts.getItem(1).cast("long").alias("n_chars"),
        parts.getItem(2).cast("long").alias("doc_id"),
    )


@query(
    "mr_distinct_count_per_key",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    GROUP BY 1
    """,
    tags=("mr-compat", "events", "distinct"),
)
def mr_distinct_count_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type through the MR-compat API (seventh
    registered user_id): the reducer keeps a SET of the values seen for
    its key and emits the set's size — the holistic-aggregate reducer
    shape (state bounded by value CARDINALITY, not by a constant or a
    k), which none of the six prior user_ids pin: sum and count|sum are
    O(1), top-k is O(k), the dedup-join reducer's output scales with the
    set instead of folding it. NULL event types and user ids are
    filtered EXPLICITLY before the tab encode (stated in the oracle's
    WHERE) — concat_ws silently skips NULLs, which would otherwise
    produce a tab-less record the mapper mis-splits into a spurious ''
    key; the integer-only value channel keeps the output
    engine-stable."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.concat_ws("\t", F.col("event_type"), F.col("user_id")).alias(
            "record"
        )
    )
    kv = run_mr_job(spark, ev, user_id="distinct", num_output_files=4)
    return kv.select(
        F.col("key").alias("event_type"),
        F.col("value").cast("long").alias("n_users"),
    )


@query(
    "mr_histogram_per_key",
    oracle="""
    SELECT source, CAST(least(n_chars // 64, 9) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE source IS NOT NULL AND n_chars IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("mr-compat", "text", "histogram"),
)
def mr_histogram_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length histogram through the MR-compat API
    (eighth registered user_id): the reducer is MULTI-EMIT with BOUNDED
    algebraic state — ten fixed-width (64-char) buckets, the last an
    overflow catch-all, one output pair per NON-EMPTY bucket — the
    zero-or-more-emit contract
    (``external/include/mr_task_factory.h:38``) exercised on the many
    side with constant state, the one reducer shape the seven prior
    user_ids leave unpinned (their multi-emitters are selective or
    pass-through; their algebraic folds emit once). The mapper is the
    generic tab-split ``KeyValuePairMapper`` — factory REUSE on the
    mapper side, as "bigram" reuses the demo reducer (registry carries
    arbitrary pairings, ``src/mr_task_factory.cc:28-88``). NULLs are
    filtered explicitly before the tab encode (stated in the oracle's
    WHERE — concat_ws would silently drop the NULL and the generic
    mapper raises on tab-less records by contract); the bucket|count
    composite is integer-only through the string value channel
    (``src/mr_tasks.h:55``), split back into typed columns here."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        F.concat_ws("\t", F.col("source"), F.col("n_chars")).alias("record")
    )
    kv = run_mr_job(spark, docs, user_id="histogram", num_output_files=4)
    parts = F.split(F.col("value"), "\\|")
    return kv.select(
        F.col("key").alias("source"),
        parts.getItem(0).cast("long").alias("bucket"),
        parts.getItem(1).cast("long").alias("n_docs"),
    )
