"""Quality filters and segmentation for a training-data pipeline.

Three operator families the corpus-cleaning stage runs after dedup
(`llm/dedup.py`) and before sampling (`llm/sampling.py`):

- **Repetition signals** — the Gopher/MassiveText-style "fraction of the
  document covered by its most frequent n-gram" family. Excessively
  repetitive documents (boilerplate, scraped templates, generation loops)
  are the single highest-yield quality cut after dedup.
- **PII scan + redaction** — regex detection and masking of emails and
  IPv4 addresses at scan speed. The regexes are written in the common
  Java-regex/RE2 subset so the DuckDB differential oracle runs the SAME
  pattern (no lookbehind, no backreferences).
- **Chunking with overlap** — fixed-size sliding token windows (the RAG /
  context-packing segmentation primitive), emitted as one row per chunk.

All three are pure column expressions (no Python, no shuffle except the
chunk explode's implicit output growth): at 100 TB they run at scan speed
inside whole-stage codegen, and the per-document work is O(L) — except the
top-bigram argmax which is O(L²) in the bigram count with L bounded by
upstream chunking (tens to hundreds of tokens); for book-length documents
run `chunk_documents` first or switch to the explode+groupBy form
(`tfidf_top_terms` shows that shape).

Reference parity: the reference's text surface is tokenize + per-key count
(``test/user_tasks.cc:9-35``); these operators extend the same
tokenizer contract (`text.TOKEN_DELIM`) to the quality-filter stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.exact import rnd
from ..registry import query
from .text import TOKEN_DELIM, tokens_col

# Java-regex AND RE2 compatible (no lookarounds/backrefs): the same literal
# runs in Spark and in the DuckDB oracle.
# (?i): organic emails are mixed-case; a lowercase-only class would leave
# 'User@Example.COM' uncounted AND unredacted — a silent PII leak the
# differential oracle can't see because it runs the identical pattern.
# (?i) is supported by both Java regex and RE2.
EMAIL_RE = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

CHUNK_TOKENS = 32  # chunk size
CHUNK_STRIDE = 24  # => 8-token overlap between consecutive chunks


@query(
    "repetition_signals",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'), x -> x <> '') AS toks
      FROM documents
    ), b AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM t
    ), c AS (
      SELECT doc_id, toks, bigrams,
             list_max(list_transform(bigrams,
                      g -> len(list_filter(bigrams, x -> x = g)))) AS top2_raw
      FROM b
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           CAST(coalesce(top2_raw, 0) AS BIGINT) AS top2_count,
           list_min(list_filter(bigrams,
                    g -> len(list_filter(bigrams, x -> x = g)) = top2_raw)) AS top2gram,
           floor((1 - CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(len(toks), 0)) * 10000 + 0.5) / 10000 AS dup_token_frac,
           floor((CAST(coalesce(top2_raw, 0) AS DOUBLE) / nullif(len(bigrams), 0)) * 10000 + 0.5) / 10000 AS top2_bigram_frac,
           CASE WHEN (len(bigrams) > 0 AND coalesce(top2_raw, 0) * 10 >= len(bigrams))
                  OR (len(toks) > 0 AND len(list_distinct(toks)) * 2 <= len(toks))
                THEN 'repetitive' ELSE 'ok' END AS rep_flag
    FROM c
    """,
    tags=("llm", "quality", "repetition"),
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-token
    fraction and the share of bigram positions taken by the single most
    frequent bigram, plus an integer-exact keep/drop flag (float ratios are
    display-only, so the flag can't flake across engines).

    The top-bigram argmax runs as a nested higher-order function over the
    in-row bigram array — no shuffle, no explode; the whole operator is one
    projection at scan speed (see module docstring for the long-doc path).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # ONE O(L²) pass builds (−count, gram) structs; array_min then yields
    # max count with the smallest-gram tiebreak in O(L). The earlier form
    # ran the quadratic per-bigram count scan twice (once for the max,
    # again for the argmin), doubling the operator's dominant cost.
    stage = docs.select(
        "doc_id", toks.alias("toks"), bigrams.alias("bigrams")
    ).withColumn(
        "top2_best",
        F.array_min(
            F.transform(
                F.col("bigrams"),
                lambda g: F.struct(
                    (
                        -F.size(F.filter(F.col("bigrams"), lambda x: x == g))
                    ).alias("nc"),
                    g.alias("g"),
                ),
            )
        ),
    )
    toks_c, bigrams_c = F.col("toks"), F.col("bigrams")
    n_tokens = F.size(toks_c)
    n_unique = F.size(F.array_distinct(toks_c))
    n_bigrams = F.size(bigrams_c)
    top2 = F.coalesce(-F.col("top2_best.nc"), F.lit(0))
    return stage.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_unique.cast("long").alias("n_unique"),
        top2.cast("long").alias("top2_count"),
        F.col("top2_best.g").alias("top2gram"),
        rnd(
            F.lit(1) - n_unique.cast("double") / F.nullif(n_tokens, F.lit(0)), 4
        ).alias("dup_token_frac"),
        rnd(top2.cast("double") / F.nullif(n_bigrams, F.lit(0)), 4).alias(
            "top2_bigram_frac"
        ),
        F.when(
            ((n_bigrams > 0) & (top2 * 10 >= n_bigrams))
            | ((n_tokens > 0) & (n_unique * 2 <= n_tokens)),
            "repetitive",
        )
        .otherwise("ok")
        .alias("rep_flag"),
    )


@query(
    "pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) || '@example.' ||
             (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) ||
             ' from ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
             CAST(doc_id % 100 AS VARCHAR) || ' ' || text AS raw
      FROM documents
    )
    , masked AS (
      SELECT doc_id, raw,
             regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g') AS em
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(em, '{IPV4_RE}')) AS BIGINT) AS n_ips,
           regexp_replace(em, '{IPV4_RE}', '<IP>', 'g') AS redacted
    FROM masked
    """,
    tags=("llm", "quality", "pii"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan and redaction: count and mask emails and IPv4 addresses with
    Java/RE2-common regexes (the oracle runs the identical patterns).

    The fixture corpus contains no organic PII, so a deterministic
    contact-line is derived from ``doc_id`` and prepended before scanning —
    the operator under test is the regex scan/replace itself, exercised on
    every row with a non-degenerate match set. Emails are masked before IPs
    so the IP pass can't partially match inside an address it already
    consumed. Scan-speed projection; no Python, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tld = (
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("net")
    )
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example."),
        tld,
        F.lit(" from ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" "),
        F.col("text"),
    )
    aug = docs.select("doc_id", raw.alias("raw"))
    # n_ips counts on the EMAIL-MASKED intermediate so the count always
    # equals the number of <IP> tokens in `redacted`: an IP embedded in an
    # email ('10.0.0.1@example.com') is consumed by the email mask, and
    # counting it on the raw string would report an IP the redaction never
    # emitted.
    masked = aug.withColumn(
        "em", F.regexp_replace("raw", EMAIL_RE, "<EMAIL>")
    )
    return masked.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("em", F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.regexp_replace("em", IPV4_RE, "<IP>").alias("redacted"),
    )


@query(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'), x -> x <> '') AS toks
      FROM documents
    ), n AS (
      SELECT doc_id, toks, len(toks) AS n_tokens,
             1 + (greatest(len(toks) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} AS n_chunks
      FROM t
    ), c AS (
      SELECT doc_id, toks, n_tokens,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM n
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(1 + chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_token,
           CAST(least(CAST(n_tokens AS BIGINT) - (1 + chunk_id * {CHUNK_STRIDE}) + 1,
                      {CHUNK_TOKENS}) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[(1 + chunk_id * {CHUNK_STRIDE}):
                                least(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n_tokens)],
                           ' ') AS chunk_text
    FROM c
    """,
    tags=("llm", "chunking", "rag"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 32-token chunks every 24 tokens (8-token
    overlap) — the RAG/context-packing segmentation primitive. Chunk count
    is 1 + ceil(max(L-32,0)/24), so every token is covered and a short
    document yields exactly one chunk.

    Plan: one projection + explode of a per-row index sequence — output
    grows ~L/stride per doc but there is still no shuffle; chunk rows land
    in the same partitions as their documents, ready for downstream
    embed/dedup stages."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks).cast("long")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - CHUNK_TOKENS, F.lit(0)) + (CHUNK_STRIDE - 1))
        / CHUNK_STRIDE
    )
    staged = docs.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n_tokens"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    start = (F.lit(1) + F.col("chunk_id") * CHUNK_STRIDE).cast("long")
    chunk = F.slice(F.col("toks"), start.cast("int"), CHUNK_TOKENS)
    return staged.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_token"),
        F.least(
            F.col("n_tokens") - start + 1, F.lit(CHUNK_TOKENS).cast("long")
        ).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Inter-document boilerplate (corpus-frequency n-grams)
# ---------------------------------------------------------------------------

# An n-gram is corpus boilerplate when it appears in >= this many DISTINCT
# documents (each document contributes its distinct shingle set once, so
# intra-doc repetition cannot promote an n-gram — that axis is
# repetition_signals' job).
BOILER_MIN_DF = 3


@query(
    "boilerplate_ngram_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                               x -> x <> '') AS toks
            FROM documents)
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM t
    ), hot AS (
      SELECT g FROM e GROUP BY g HAVING COUNT(*) >= {BOILER_MIN_DF}
    ), nb AS (
      SELECT e.doc_id, COUNT(*) AS n_boiler
      FROM e JOIN hot USING (g) GROUP BY e.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.sh) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(nb.n_boiler, 0) AS BIGINT) AS n_boiler,
           floor(COALESCE(CAST(COALESCE(nb.n_boiler, 0) AS DOUBLE)
                          / nullif(len(t.sh), 0), 0.0) * 10000 + 0.5) / 10000
             AS boiler_frac,
           CASE WHEN len(t.sh) > 0 AND 2 * COALESCE(nb.n_boiler, 0) >= len(t.sh)
                THEN 'boilerplate' ELSE 'ok' END AS boiler_flag
    FROM t LEFT JOIN nb USING (doc_id)
    """,
    tags=("llm", "quality", "boilerplate", "dedup"),
)
def boilerplate_ngram_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-document boilerplate detection (the C4/RefinedWeb cut that
    repetition_signals' intra-document signals cannot see): count each
    distinct 3-gram's document frequency across the corpus, call n-grams in
    >= BOILER_MIN_DF documents boilerplate, and score every document by the
    fraction of its distinct n-grams that are boilerplate; docs where the
    majority is boilerplate (integer-exact 2*n_boiler >= n_ngrams) are
    flagged for the cut.

    Scale shape: explode distinct shingles (output ~ corpus token count) →
    one groupBy shuffle for document frequency → HAVING prunes the hot set
    (small: boilerplate is by definition the heavy tail) → one join back +
    per-doc count. Two shuffles, no Python, no driver state; AQE broadcasts
    the pruned hot set when it fits. The same shape at 100 TB is the
    standard "frequent n-gram" boilerplate pass run after exact dedup.
    """
    from .dedup import shingles_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles_col(tokens_col()).alias("sh")
    )
    e = docs.select("doc_id", F.explode("sh").alias("g"))
    hot = (
        e.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DF)
        .select("g")
    )
    nb = e.join(hot, "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_boiler")
    )
    n_ngrams = F.size("sh").cast("long")
    base = docs.select("doc_id", n_ngrams.alias("n_ngrams")).join(
        nb, "doc_id", "left"
    )
    nbl = F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long")
    return base.select(
        "doc_id",
        "n_ngrams",
        nbl.alias("n_boiler"),
        F.coalesce(
            rnd(
                nbl.cast("double")
                / F.when(F.col("n_ngrams") > 0, F.col("n_ngrams")),
                4,
            ),
            F.lit(0.0),
        ).alias("boiler_frac"),
        F.when(
            (F.col("n_ngrams") > 0) & (2 * nbl >= F.col("n_ngrams")),
            F.lit("boilerplate"),
        )
        .otherwise(F.lit("ok"))
        .alias("boiler_flag"),
    )


# --------------------------------------------------------------------------
# Compression-ratio quality signal (zlib compressibility)
# --------------------------------------------------------------------------

_ZLIB_LEVEL = 6  # fixed so the signal is a pure function of the bytes

COMPRESSION_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_zlib bigint, comp_ratio double,"
    " comp_flag string"
)


def _compression_batches(pdf_iter):
    """Arrow-batched zlib pass: one C-speed deflate per document, no
    Python-level tokenization. Emits exact byte counts; ratio is
    display-only (the flag below re-derives from the integers)."""
    import zlib

    import pandas as pd

    for pdf in pdf_iter:
        raw = pdf["text"].fillna("").map(lambda t: t.encode("utf-8"))
        n_bytes = raw.map(len).astype("int64")
        n_zlib = raw.map(
            lambda b: len(zlib.compress(b, _ZLIB_LEVEL))
        ).astype("int64")
        ratio = (n_zlib / n_bytes.where(n_bytes > 0)).fillna(0.0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "n_zlib": n_zlib,
                "comp_ratio": (ratio * 10000 + 0.5).astype("int64") / 10000.0,
                # Integer-exact thresholds (no float compare): a doc whose
                # deflate output is under 30% of its size is template-like
                # (low entropy); one that deflate cannot shrink at all is
                # noise-like (high entropy). Both are standard pretraining
                # drop signals (the Gopher/CCNet compressibility cut).
                "comp_flag": [
                    (
                        "low_entropy"
                        if z * 10 < b * 3
                        else ("high_entropy" if z >= b and b > 0 else "ok")
                    )
                    for b, z in zip(n_bytes, n_zlib)
                ],
            }
        )


@query(
    "doc_compression_ratio",
    # No SQL oracle (DuckDB has no deflate), but the ENTIRE result
    # carries a pure-python partial oracle (round-16, tests/
    # test_filters.py::test_doc_compression_full_partial_oracle_
    # pure_python): every document's byte counts, truncating ratio
    # round and flag re-derived row for row — the deflate recount is
    # same-CPython-zlib replication (deterministic in input + level +
    # library), the arithmetic independently re-derived. The older
    # 50-doc slice test keeps the planted low/high-entropy extremes.
    tags=("llm", "quality", "compression"),
)
def doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compressibility — the quality cut that catches
    what token statistics miss: templated/boilerplate text deflates far
    below natural prose, and binary-ish noise refuses to deflate at all.
    (`repetition_signals` sees token repeats; deflate sees CHARACTER-level
    structure, e.g. repeated markup or base64 blobs.)

    Plan: a pure map — mapInPandas over Arrow batches, one C-speed
    deflate per document at a pinned level, no shuffle anywhere. At
    100 TB this runs at scan speed with perfect partition parallelism;
    the output is one short row per doc. Python is unavoidable here
    (no JVM/SQL deflate surface), so the UDF tier is the honest cost —
    the batch loop is the same shape a real zstd scorer would use."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_compression_batches, schema=COMPRESSION_SCHEMA)
