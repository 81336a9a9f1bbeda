"""Sampling & curation operators: the data-mixing half of a training
pipeline (`documents` table).

After cleaning and dedup, a corpus is SAMPLED into a training mix:
per-domain/language rates (domain mixing), fixed-size uniform draws,
a global shuffle sharded for data-parallel trainers, quantile-based
quality cuts, sequence packing into token budgets, and benchmark
decontamination. None of these exist in the reference (its surface is
word count, ``test/user_tasks.cc:9-35``); they are the north-star ops a
100 TB corpus pipeline runs daily.

Determinism is the design center: every "random" choice derives from
md5(salt || key) — content-addressed pseudo-randomness that both Spark
and the DuckDB oracle compute bit-identically, is reproducible across
runs and cluster sizes, and needs no driver-side RNG state. Comparing
the LOWERCASE-HEX md5 prefix against a hex threshold string is a pure
lexicographic comparison == numeric comparison on the first 24 bits, so
per-stratum rates are plain string predicates — fully pushable, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.exact import rnd
from ..functions.ranks import bucketed_prefix_sum, hist_percent_rank
from ..registry import query
from .dedup import content_fp, shingles_col
from .text import TOKEN_DELIM, quality_flag_col, quality_flag_sql, tokens_col

# Per-language sampling rates for the stratified mix (domain mixing à la
# The Pile / RefinedWeb recipes: upweight the head language, downsample
# tails). Rates must be < 1.0 (a 6-hex-digit threshold cannot express 1.0;
# rate 1.0 would mean "no sampling" anyway).
MIX_RATES: dict[str, float] = {
    "en": 0.9,
    "de": 0.6,
    "es": 0.5,
    "fr": 0.4,
    "zh": 0.25,
}
_DEFAULT_RATE = 0.1


def _hex_threshold(rate: float) -> str:
    """Rate r -> 6-hex-digit threshold: keep iff md5-prefix < threshold.
    P(keep) = floor(r * 16^6) / 16^6, within 6e-8 of r."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0, 1): {rate}")
    return format(int(rate * 16**6), "06x")


def _u6(salt: str, key: Column) -> Column:
    """First 6 hex chars of md5(salt || ':' || key) — the deterministic
    uniform draw shared with the oracle."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string")).cast("binary")),
        1,
        6,
    )


def _mix_threshold_col() -> Column:
    """The per-lang keep threshold as a Column — the Spark-side twin of
    ``_rate_case_sql``, built ONCE so the standalone sampler and the
    assembled pipeline can never diverge on a rate edit."""
    thr = F.lit(_hex_threshold(_DEFAULT_RATE))
    for lang, r in sorted(MIX_RATES.items()):
        thr = F.when(F.col("lang") == lang, F.lit(_hex_threshold(r))).otherwise(thr)
    return thr


def _rate_case_sql(salt: str) -> str:
    """Oracle-side keep predicate matching _u6/_hex_threshold."""
    branches = " ".join(
        f"WHEN lang = '{lang}' THEN '{_hex_threshold(r)}'"
        for lang, r in sorted(MIX_RATES.items())
    )
    return (
        f"substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 6) < "
        f"(CASE {branches} ELSE '{_hex_threshold(_DEFAULT_RATE)}' END)"
    )


@query(
    "sample_stratified_mix",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents
    WHERE {_rate_case_sql("mix")}
    GROUP BY lang
    """,
    tags=("sampling", "llm"),
)
def sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) Bernoulli sampling at MIX_RATES — the
    domain-mixing step of corpus assembly. The keep predicate is a string
    comparison on an md5 prefix: deterministic, shuffle-free, pushed to
    the scan, and independent of partitioning (unlike df.sample, whose
    draw depends on split boundaries). At 100 TB this runs at scan speed
    and the mix is exactly reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    thr = _mix_threshold_col()
    return (
        docs.filter(_u6("mix", F.col("doc_id")) < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_TEMP_C = 0.3  # cap scale for the α=0.5 temperature mix


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, n_l,
             least(1.0, {_TEMP_C} * sqrt(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / n_l)) AS rate
      FROM counts
    )
    SELECT d.lang,
           r.n_l AS n_total,
           COUNT(*) AS n_sampled,
           floor(r.rate * 1000000 + 0.5) / 1000000 AS rate
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
          < CAST(floor(r.rate * 16777216) AS BIGINT)
    GROUP BY d.lang, r.n_l, r.rate
    """,
    tags=("sampling", "llm"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing (α = 0.5): sampling rate
    min(1, c·sqrt(N/n_l)) — tail languages upsampled toward the
    square-root share, head capped — the multilingual-corpus smoothing of
    mT5/XLM-R, in its unnormalized capped form. The normalized softmax
    form needs Σ_l share^α, whose floating sum order differs between
    engines (and across Spark runs); every operation here —
    divide, sqrt, multiply, min — is IEEE correctly-rounded on identical
    operand order, so rates are bit-identical in Spark and the oracle.

    The rate table is two tiny aggregates broadcast back onto the scan
    (per-lang count + corpus count); the keep test compares the doc's
    24-bit md5 draw with the lang's integer threshold — scan-speed, no
    repartition of the corpus at any point."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    total = docs.agg(F.count(F.lit(1)).alias("n_total_corpus"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_l",
        F.least(
            F.lit(1.0),
            F.lit(_TEMP_C)
            * F.sqrt(F.col("n_total_corpus").cast("double") / F.col("n_l")),
        ).alias("rate"),
    )
    draw = F.conv(_u6("temp", F.col("doc_id")), 16, 10).cast("bigint")
    thr = F.floor(F.col("rate") * F.lit(16777216)).cast("bigint")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(draw < thr)
        .groupBy("lang", F.col("n_l").alias("n_total"), "rate")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .select(
            "lang", "n_total", "n_sampled", rnd(F.col("rate"), 6).alias("rate")
        )
    )


_FIXED_K = 200


@query(
    "sample_fixed_k",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    ORDER BY md5('fk:' || CAST(doc_id AS VARCHAR)), doc_id
    LIMIT {_FIXED_K}
    """,
    tags=("sampling", "llm"),
)
def sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample without replacement: order by a
    content-addressed hash and take the k smallest — the distributed
    equivalent of reservoir sampling, but deterministic and rerunnable
    (a reservoir's result depends on encounter order; this depends only
    on doc ids). Physical plan is TakeOrderedAndProject: each partition
    keeps its local top-k, the driver merges k·P rows — no global sort,
    no shuffle of the data itself. Scale: k rows cross the wire, period."""
    docs = load_table(spark, sf_dir, "documents")
    # Order by the FULL 32-hex md5, exactly like the oracle (and like
    # global_shuffle_shards): the 6-hex _u6 prefix is a different
    # comparator — at corpus scale prefix collisions are guaranteed, and
    # Spark's doc_id tiebreak would pick a different k-set than DuckDB's
    # remaining 26 hex chars.
    h = F.md5(
        F.concat_ws(":", F.lit("fk"), F.col("doc_id").cast("string")).cast("binary")
    )
    return (
        docs.select("doc_id", "lang", h.alias("_h"))
        .orderBy(F.col("_h"), F.col("doc_id"))
        .limit(_FIXED_K)
        .select("doc_id", "lang")
    )


_N_SHARDS = 16


@query(
    "global_shuffle_shards",
    oracle="""
    SELECT doc_id,
           substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 1)
               ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS INT) AS pos
    FROM documents
    """,
    tags=("sampling", "llm"),
)
def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle, sharded for data-parallel training: shard =
    first hex nibble of the doc's draw (16 shards), position = rank of the
    draw within the shard. Each trainer reads one shard in pos order and
    sees a uniformly shuffled, deterministic stream. The window partitions
    by shard — 16 parallel sorts of ~1/16 of the data each, never a
    single-partition global window; at 100 TB shard count rises with the
    trainer count and each sort stays executor-sized."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(
        F.concat_ws(":", F.lit("shuf"), F.col("doc_id").cast("string")).cast("binary")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.substring(F.col("_h"), 1, 1))
        .orderBy(F.col("_h"), F.col("doc_id"))
    )
    return (
        docs.select("doc_id", h.alias("_h"))
        .select(
            "doc_id",
            F.substring(F.col("_h"), 1, 1).alias("shard"),
            F.row_number().over(w).alias("pos"),
        )
    )


@query(
    "quality_quantile_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang, n_tokens,
             percent_rank() OVER (PARTITION BY lang
                                  ORDER BY n_tokens DESC, doc_id) AS pr
      FROM scored
    )
    SELECT doc_id, lang, n_tokens,
           floor(pr * 1000000 + 0.5) / 1000000 AS pr
    FROM ranked WHERE pr <= 0.75
    """,
    tags=("sampling", "quality", "llm"),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality cut: keep the top 75% of documents per
    language by token count (the scalable stand-in for a model-based
    quality score — swap the ranking statistic for any scoring column).
    Quantiles via exact percent_rank with a deterministic tiebreaker, so
    the cut is exact and reproducible — not approximate like
    approxQuantile. (rank-1)/(n-1) is one IEEE division computed
    identically by both engines; rounded to 6 places on output anyway.

    Scale: the rank comes from the count-value HISTOGRAM closed form
    (`hist_percent_rank`, descending) — cumulative counts over the
    distinct token-count histogram plus a within-value row_number keyed
    by (lang, n_tokens) — so no window ever partitions a volume-scaled
    input by the ~20-language key (which would serialize each language
    through one task at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    ranked = hist_percent_rank(scored, ["lang"], "n_tokens", "doc_id", descending=True)
    return (
        ranked.filter(F.col("pr") <= 0.75)
        .select("doc_id", "lang", "n_tokens", rnd(F.col("pr"), 6).alias("pr"))
    )


_PACK_BUDGET = 2048


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT lang, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY lang, bin
    """,
    tags=("sampling", "packing", "llm"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in deterministic doc_id order,
    per language) to consecutive ~2048-token training bins — bin = which
    budget multiple the doc's running token total starts in. This is the
    contiguous-packing approximation used when assembling fixed-length
    training batches. The running total is the two-pass distributed
    prefix sum (`bucketed_prefix_sum`): per-(lang, doc_id-range-bucket)
    subtotals, a cumulative-offset window over that tiny subtotal table,
    and a within-bucket running sum — so no window partitions a
    volume-scaled input by the ~20-language key (the naive per-lang
    cumsum serializes each language through ONE task at 100 TB; bucket
    count is the parallelism knob). Integer-exact, so bit-identical to
    the single-window form. Returns per-bin occupancy for inspection."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    cum = bucketed_prefix_sum(toks, ["lang"], "doc_id", "n_tokens")
    bin_ = F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(_PACK_BUDGET)))
    return (
        cum.withColumn("bin", bin_)
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


@query(
    "corpus_interleave_plan",
    oracle="""
    WITH slots AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
                  AS BIGINT) AS slot
      FROM documents
    )
    SELECT doc_id, source, slot,
           CAST(row_number() OVER (ORDER BY slot, source) - 1 AS BIGINT)
             AS global_pos
    FROM slots
    """,
    tags=("sampling", "packing", "llm"),
)
def corpus_interleave_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin SOURCE INTERLEAVE for the training data
    loader: each source's docs (doc_id order) take slots 0,1,2,…, and the
    global training order cycles source-by-source within each slot — the
    standard way to keep a mixed corpus locally balanced (no 10⁹-doc run
    of one crawl at the front) without any RNG. Emits every doc's slot
    and its exact global position.

    Scale design — NO global window (the oracle's row_number over the
    whole corpus is the semantics, not the plan): slot comes from the
    two-pass distributed rank (`bucketed_prefix_sum` of 1s), and
    global_pos from the closed form over the |sources|-row count table —
    pos(slot, src) = Σ_src' min(slot, n_src') + |{src' < src : n_src' >
    slot}| (docs at earlier slots from every source, plus same-slot docs
    of lexicographically earlier sources) — evaluated as a codegen'd HOF
    fold over one broadcast ~20-element array per row. Pure integer
    arithmetic, bit-identical to the oracle's global sort; total-order
    uniqueness is asserted in tests."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = bucketed_prefix_sum(
        docs, ["source"], "doc_id", F.lit(1), cum_alias="_rank"
    ).withColumn("slot", (F.col("_rank") - 1).cast("long"))
    counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("source", "n"))
            ).alias("_counts")
        )
    )
    pos = F.aggregate(
        F.col("_counts"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.least(F.col("slot"), x.n)
        + F.when((x.source < F.col("source")) & (x.n > F.col("slot")), 1)
        .otherwise(0),
    )
    return (
        ranked.crossJoin(F.broadcast(counts))
        .select(
            "doc_id",
            "source",
            "slot",
            pos.alias("global_pos"),
        )
    )


_N_EPOCHS = 3  # sampled training epochs for the overlap telemetry
_EPOCH_RATE = 0.5  # per-epoch Bernoulli keep rate


@query(
    "epoch_sample_overlap",
    oracle=f"""
    WITH s AS (
      SELECT e.epoch, d.doc_id, md5(d.text) AS fp,
             CAST(len(list_filter(regexp_split_to_array(lower(d.text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents d
      CROSS JOIN (VALUES (1), (2), (3)) e(epoch)
      WHERE substr(md5('ep' || e.epoch || ':' || CAST(d.doc_id AS VARCHAR)), 1, 6)
            < '{_hex_threshold(_EPOCH_RATE)}'
    ), id_common AS (
      SELECT a.epoch AS epoch_a, b.epoch AS epoch_b,
             CAST(COUNT(*) AS BIGINT) AS n_common_docs,
             CAST(SUM(a.n_tokens) AS BIGINT) AS common_tokens
      FROM s a JOIN s b ON a.doc_id = b.doc_id AND a.epoch < b.epoch
      GROUP BY a.epoch, b.epoch
    ), fp_common AS (
      SELECT a.epoch AS epoch_a, b.epoch AS epoch_b,
             CAST(COUNT(*) AS BIGINT) AS n_common_fps
      FROM (SELECT DISTINCT epoch, fp FROM s) a
      JOIN (SELECT DISTINCT epoch, fp FROM s) b
        ON a.fp = b.fp AND a.epoch < b.epoch
      GROUP BY a.epoch, b.epoch
    )
    SELECT i.epoch_a, i.epoch_b, i.n_common_docs, i.common_tokens,
           f.n_common_fps
    FROM id_common i JOIN fp_common f USING (epoch_a, epoch_b)
    """,
    tags=("sampling", "dedup", "llm"),
)
def epoch_sample_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-epoch contamination check for a multi-epoch sampled training
    plan: three independent md5-salted Bernoulli epoch draws (rate 0.5 —
    the `token_budget_epoch_plan` regime where epochs < 1 pass), and for
    each epoch PAIR how much repeats — common doc_ids (the expected
    repeat exposure r² of the corpus), their token mass, and common
    content FINGERPRINTS, which additionally catches a document the
    second epoch re-sees through a DUPLICATE with a different doc_id
    (n_common_fps > n_common_fps-from-ids signals dedup should run
    before epoch sampling, or the dedup tier missed copies). This is the
    epoch-level companion of `decontaminate_benchmark` (eval leakage)
    and `dedup_incremental_new_batch` (ingestion leakage).

    Determinism: draws are the house md5(salt:key) content-addressed
    randomness — both engines compute the identical sample, so the
    overlap counts are exact integers, no tolerance needed. Scale shape:
    the epoch axis is a 3-row broadcast explode (linear scan, rate-
    thinned); the id-level overlap is a doc_id-keyed self-join of the
    sampled sets and the content-level one an fp-keyed join of their
    distinct-fingerprint projections — both shuffle-bounded by the
    sample size, nothing pairwise beyond the 3 epoch pairs."""
    docs = load_table(spark, sf_dir, "documents")
    epochs = F.explode(
        F.array(*[F.lit(e) for e in range(1, _N_EPOCHS + 1)])
    ).alias("epoch")
    thr = F.lit(_hex_threshold(_EPOCH_RATE))
    draw = F.substring(
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            ).cast("binary")
        ),
        1,
        6,
    )
    s = docs.select(
        "doc_id",
        content_fp().alias("fp"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        epochs,
    ).filter(draw < thr)
    a = s.select(
        F.col("epoch").alias("epoch_a"),
        "doc_id",
        F.col("fp").alias("fp_a"),
        "n_tokens",
    )
    b = s.select(F.col("epoch").alias("epoch_b"), "doc_id")
    id_common = (
        a.join(b, "doc_id")
        .filter(F.col("epoch_a") < F.col("epoch_b"))
        .groupBy("epoch_a", "epoch_b")
        .agg(
            F.count(F.lit(1)).alias("n_common_docs"),
            F.sum("n_tokens").alias("common_tokens"),
        )
    )
    fps = s.select("epoch", "fp").distinct()
    fa = fps.select(F.col("epoch").alias("epoch_a"), "fp")
    fb = fps.select(F.col("epoch").alias("epoch_b"), "fp")
    fp_common = (
        fa.join(fb, "fp")
        .filter(F.col("epoch_a") < F.col("epoch_b"))
        .groupBy("epoch_a", "epoch_b")
        .agg(F.count(F.lit(1)).alias("n_common_fps"))
    )
    return id_common.join(fp_common, ["epoch_a", "epoch_b"]).select(
        "epoch_a",
        "epoch_b",
        "n_common_docs",
        "common_tokens",
        "n_common_fps",
    )


_BENCH_MAX_DOC = 10  # doc_id < 10 stands in for the benchmark/eval set
_CONTAM_N = 8  # shared n-gram length flagging contamination (Lee et al. 2022 use 50-token windows; 8 word-grams is the eval-decontamination norm)

_DECONTAM_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                         x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t) - {_CONTAM_N - 1}, 0)),
               i -> array_to_string(t[i:i+{_CONTAM_N - 1}], ' '))) AS gs
      FROM toks
    ), bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < {_BENCH_MAX_DOC}
    ), train AS (
      SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= {_BENCH_MAX_DOC}
    )
    SELECT t.doc_id, COUNT(*) AS n_shared_ngrams
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id
"""


@query("decontaminate_benchmark", oracle=_DECONTAM_ORACLE, tags=("sampling", "llm"))
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    8-token n-gram with the benchmark set (stand-in: doc_id < 10),
    reporting how many distinct benchmark n-grams each one contains —
    the overlap filter run before training so eval data never leaks into
    the corpus. The benchmark n-gram set is tiny relative to the corpus
    and is BROADCAST, so the training side never shuffles: at 100 TB this
    is a map-side semi-join at scan speed. Drop the flagged ids with an
    anti-join to get the clean corpus."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            shingles_col(tokens_col(), _CONTAM_N)
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") < _BENCH_MAX_DOC).select("g").distinct()
    )
    train = grams.filter(F.col("doc_id") >= _BENCH_MAX_DOC)
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


_TOKEN_BUDGET = 5000  # per-language token target for the budgeted mix


@query(
    "sample_token_budget",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), budgets AS (
      SELECT lang,
             CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens,
             least(1.0, {_TOKEN_BUDGET}.0 / CAST(SUM(n_tokens) AS BIGINT)) AS rate
      FROM toks GROUP BY lang
    )
    SELECT t.lang,
           b.lang_tokens,
           floor(b.rate * 1000000 + 0.5) / 1000000 AS rate,
           COUNT(*) AS n_sampled,
           CAST(SUM(t.n_tokens) AS BIGINT) AS sampled_tokens
    FROM toks t JOIN budgets b ON t.lang = b.lang
    WHERE CAST('0x' || substr(md5('tb:' || CAST(t.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
          < CAST(floor(b.rate * 16777216) AS BIGINT)
    GROUP BY t.lang, b.lang_tokens, b.rate
    """,
    tags=("sampling", "llm"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget stratified sampling: rate_l = min(1, B / tokens_l), so
    each language contributes ≈ B tokens to the mix regardless of its raw
    size — corpus targets are token budgets, not document counts. Same
    md5-threshold mechanics as the other mixes (scan-speed, reproducible);
    the rate derives from one tiny per-lang aggregate broadcast back, and
    B/tokens_l is a single correctly-rounded division so Spark and the
    oracle agree bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    budgets = toks.groupBy("lang").agg(
        F.sum("n_tokens").alias("lang_tokens")
    ).select(
        "lang",
        "lang_tokens",
        F.least(
            F.lit(1.0), F.lit(float(_TOKEN_BUDGET)) / F.col("lang_tokens")
        ).alias("rate"),
    )
    draw = F.conv(_u6("tb", F.col("doc_id")), 16, 10).cast("bigint")
    thr = F.floor(F.col("rate") * F.lit(16777216)).cast("bigint")
    return (
        toks.join(F.broadcast(budgets), "lang")
        .filter(draw < thr)
        .groupBy("lang", "lang_tokens", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_tokens").alias("sampled_tokens"),
        )
        .select(
            "lang",
            "lang_tokens",
            rnd(F.col("rate"), 6).alias("rate"),
            "n_sampled",
            "sampled_tokens",
        )
    )


@query(
    "sample_source_uniqueness",
    oracle="""
    WITH stats AS (
      SELECT source,
             COUNT(*) AS n_docs,
             COUNT(DISTINCT md5(text)) AS n_unique,
             least(1.0, 1.5 * COUNT(DISTINCT md5(text)) / COUNT(*)) AS rate
      FROM documents GROUP BY source
    )
    SELECT d.source,
           s.n_docs,
           s.n_unique,
           floor(s.rate * 1000000 + 0.5) / 1000000 AS rate,
           COUNT(*) AS n_sampled
    FROM documents d JOIN stats s ON d.source = s.source
    WHERE CAST('0x' || substr(md5('srcw:' || CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
          < CAST(floor(s.rate * 16777216) AS BIGINT)
    GROUP BY d.source, s.n_docs, s.n_unique, s.rate
    """,
    tags=("sampling", "llm"),
)
def sample_source_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware source weighting: sources full of duplicated boilerplate
    get downsampled in proportion to their uniqueness ratio
    (distinct content hashes / docs), capped at 1 — the pragmatic stand-in
    for dedup-then-sample when the corpus is too large to dedup first.
    rate = min(1, 1.5·uniq/n): a source that is 100% unique is kept
    (1.5·1 capped), one that is 50% copies drops to 0.75. The ratio is an
    exact integer division done once per source; everything else is the
    shared md5-threshold machinery."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
    ).select(
        "source",
        "n_docs",
        "n_unique",
        F.least(
            F.lit(1.0), F.lit(1.5) * F.col("n_unique") / F.col("n_docs")
        ).alias("rate"),
    )
    draw = F.conv(_u6("srcw", F.col("doc_id")), 16, 10).cast("bigint")
    thr = F.floor(F.col("rate") * F.lit(16777216)).cast("bigint")
    return (
        docs.join(F.broadcast(stats), "source")
        .filter(draw < thr)
        .groupBy("source", "n_docs", "n_unique", "rate")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .select(
            "source",
            "n_docs",
            "n_unique",
            rnd(F.col("rate"), 6).alias("rate"),
            "n_sampled",
        )
    )


_ASSEMBLE_ORACLE = f"""
    WITH deduped AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1
    ), scored AS (
      SELECT doc_id, lang, text,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM deduped
    ), quality AS (
      SELECT doc_id, lang, text, n_tokens FROM (
        SELECT doc_id, lang, text, n_tokens,
               percent_rank() OVER (PARTITION BY lang
                                    ORDER BY n_tokens DESC, doc_id) AS pr
        FROM scored)
      WHERE pr <= 0.75
    ), grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t) - {_CONTAM_N - 1}, 0)),
               i -> array_to_string(t[i:i+{_CONTAM_N - 1}], ' '))) AS gs
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                               x -> x <> '') AS t
            FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < {_BENCH_MAX_DOC}
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM
        (SELECT doc_id, unnest(gs) AS g FROM grams
         WHERE doc_id >= {_BENCH_MAX_DOC}) t
      JOIN bench b ON t.g = b.g
    ), clean AS (
      SELECT q.* FROM quality q
      WHERE q.doc_id >= {_BENCH_MAX_DOC}
        AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM clean
    WHERE {_rate_case_sql("mix")}
    GROUP BY lang
"""


@query("corpus_assemble_pipeline", oracle=_ASSEMBLE_ORACLE, tags=("sampling", "pipeline", "llm"))
def corpus_assemble_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-mix assembly a corpus team runs daily, as
    ONE declarative plan: exact dedup (keep smallest doc_id per content
    hash) → per-language quality-quantile cut (top 75% by token count,
    ranked on the deduped set) → benchmark decontamination (drop docs
    sharing an 8-gram with the doc_id<10 benchmark; flagged via broadcast
    semi-join) → stratified MIX_RATES sample (md5-threshold, scan-speed)
    → per-language doc/token accounting. Every stage is the certified
    standalone operator, composed; Catalyst pipelines the whole thing
    into one shuffle per keyed stage (dedup hash, quality window, the
    decontam aggregates, final rollup) with the benchmark n-gram set
    broadcast — see PLANS.md for the audited counts. Deterministic end
    to end — rerunning on 100 TB reproduces the mix byte-for-byte."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    deduped = (
        docs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
                    "doc_id"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text")
    )
    scored = deduped.select(
        "doc_id", "lang", "text", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    quality = (
        hist_percent_rank(
            scored, ["lang"], "n_tokens", "doc_id", descending=True
        )
        .filter(F.col("pr") <= 0.75)
        .drop("pr", "n_stratum")
    )
    grams = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col(), _CONTAM_N)).alias("g")
    )
    bench = grams.filter(F.col("doc_id") < _BENCH_MAX_DOC).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") >= _BENCH_MAX_DOC)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    clean = (
        quality.filter(F.col("doc_id") >= _BENCH_MAX_DOC)
        .join(contaminated, "doc_id", "left_anti")
    )
    thr = _mix_threshold_col()
    return (
        clean.filter(_u6("mix", F.col("doc_id")) < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# Sample size for the weighted draw; small enough that TakeOrderedAndProject
# keeps the selection driver-bounded at any corpus scale.
_AES_K = 64


@query(
    "sample_weighted_aes",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), keyed AS (
      SELECT doc_id, lang, n_tokens,
             POWER((CAST(CAST('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 6)
                              AS INTEGER) AS DOUBLE) + 1.0) / 16777216.0,
                   1.0 / CAST(n_tokens AS DOUBLE)) AS k
      FROM toks WHERE n_tokens > 0
    )
    SELECT doc_id, lang, n_tokens,
           floor(k * 1000000 + 0.5) / 1000000 AS sample_key
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {_AES_K}
    """,
    tags=("sampling", "llm"),
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one pass, no RNG state:
    Efraimidis–Spirakis A-ES (Inf. Proc. Letters 97(5), 2006). Each doc
    draws a deterministic uniform u from md5 (the same content-addressed
    randomness as the rest of the sampling tier), forms key = u^(1/w) with
    w = token count, and the global top-K keys ARE a weighted sample —
    P(doc in sample) ∝ its token mass, which is exactly how a
    token-budgeted training mix wants to draw "epoch slices" from a
    corpus (long docs proportionally more likely, no per-stratum quotas).

    Beyond the reference (no sampling surface at all); complements
    `sample_fixed_k` (uniform) and `sample_token_budget` (hard cap).

    Plan shape at 100 TB: scan → per-row key expression (all codegen) →
    TakeOrderedAndProject(K=64): per-partition top-K then a driver merge of
    num_partitions·K rows — no full sort, no shuffle of the corpus. The
    u=(m+1)/16^6 mapping keeps u>0 so pow is finite; keys are compared
    unrounded (selection), and only the reported `sample_key` is rounded
    at 1e-6 for the cross-engine check. Cross-engine float caveat,
    MEASURED not assumed: JVM Math.pow and libm pow each get 1 ulp of
    spec slack and genuinely disagree in the last bit for a few fixture
    documents — so the differential gate rests on two margins, both
    asserted in tests/test_sampling.py: per-doc divergence stays ≤ 2 ulp,
    and the key gap at the rank-K boundary dwarfs it (md5-uniform keys
    make a < 1e-16 boundary near-tie ~1e-13-probable), so both engines
    select the same K rows; the rounded `sample_key` then agrees unless a
    key lands within ~1 ulp of a 1e-6 rounding boundary. The selected set
    is additionally pinned against a scalar-Python A-ES reference.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(tokens_col()).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    m = F.conv(_u6("aes", F.col("doc_id")), 16, 10).cast("long")
    u = (m.cast("double") + F.lit(1.0)) / F.lit(16777216.0)
    k = F.pow(u, F.lit(1.0) / F.col("n_tokens").cast("double"))
    return (
        toks.withColumn("k", k)
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(_AES_K)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            rnd(F.col("k"), 6).alias("sample_key"),
        )
    )


# Weight cap for the quality-weighted draw: bounds any single doc's draw
# probability so one megadoc can't dominate the sample.
_QAES_CAP = 512


@query(
    "sample_weighted_by_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                         x -> x <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             {quality_flag_sql()} AS quality_flag
      FROM t WHERE len(toks) > 0
    ), keyed AS (
      SELECT doc_id, lang, n_tokens, quality_flag,
             CASE WHEN quality_flag = 'ok'
                  THEN least(n_tokens, {_QAES_CAP}) ELSE 1 END AS w,
             POWER((CAST(CAST('0x' || substr(md5('qaes:' || CAST(doc_id AS VARCHAR)), 1, 6)
                              AS INTEGER) AS DOUBLE) + 1.0) / 16777216.0,
                   1.0 / CAST(CASE WHEN quality_flag = 'ok'
                                   THEN least(n_tokens, {_QAES_CAP})
                                   ELSE 1 END AS DOUBLE)) AS k
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, quality_flag,
           CAST(w AS BIGINT) AS weight,
           floor(k * 1000000 + 0.5) / 1000000 AS sample_key
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {_AES_K}
    """,
    tags=("sampling", "quality", "llm"),
)
def sample_weighted_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sampling with a QUALITY weight instead of raw token
    mass: the same one-pass Efraimidis–Spirakis machinery as
    `sample_weighted_aes`, parameterized by the `quality_scores` heuristic
    (the flag is built by the shared `text.quality_flag_col` /
    `text.quality_flag_sql` pair, so the coupling is structural, not
    copy-pasted) — docs flagged 'ok' draw with weight min(n_tokens, 512)
    (token mass,
    capped so no single megadoc dominates), docs flagged 'low' draw with
    weight 1 (still sampleable, ~never chosen ahead of quality mass).
    This is the "sample a high-quality epoch slice" primitive a training
    mix runs after scoring, and demonstrates the sampler tier composes
    with any per-doc weight expression.

    Beyond the reference (no sampling surface at all).

    Plan shape at 100 TB: identical to `sample_weighted_aes` — scan →
    per-row codegen key expression → TakeOrderedAndProject(K=64); no
    shuffle of the corpus, driver merge bounded at partitions·K rows.
    Cross-engine float margins: the weight is an exact INTEGER in both
    engines (flag logic is integer-exact, `least` on integers), so
    1/w is one correctly-rounded division and the pow ulp analysis
    measured for `sample_weighted_aes` (≤2 ulp per key, rank-K boundary
    gap ~1e-13-probable to violate) carries over unchanged; the selected
    set is additionally pinned against a scalar-Python reference in
    tests/test_sampling.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        quality_flag_col(toks).alias("quality_flag"),
    ).filter(F.col("n_tokens") > 0)
    w = F.when(
        F.col("quality_flag") == "ok",
        F.least(F.col("n_tokens"), F.lit(_QAES_CAP)),
    ).otherwise(F.lit(1))
    m = F.conv(_u6("qaes", F.col("doc_id")), 16, 10).cast("long")
    u = (m.cast("double") + F.lit(1.0)) / F.lit(16777216.0)
    return (
        scored.withColumn("weight", w.cast("long"))
        .withColumn("k", F.pow(u, F.lit(1.0) / F.col("weight").cast("double")))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(_AES_K)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "quality_flag",
            "weight",
            rnd(F.col("k"), 6).alias("sample_key"),
        )
    )


@query(
    "packing_bin_fill_histogram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT lang, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS bin
      FROM toks
    ), bins AS (
      SELECT lang, bin, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
      FROM packed GROUP BY lang, bin
    ), hist AS (
      SELECT lang, bin_tokens * 10 // {_PACK_BUDGET} AS fill_decile,
             bin_tokens
      FROM bins
    ), m AS (
      SELECT lang, fill_decile,
             CAST(COUNT(*) AS BIGINT) AS n_bins,
             CAST(SUM(bin_tokens) AS BIGINT) AS decile_tokens
      FROM hist GROUP BY lang, fill_decile
    ), tot AS (
      SELECT lang, CAST(SUM(n_bins) AS BIGINT) AS lang_bins FROM m GROUP BY lang
    )
    SELECT m.lang, m.fill_decile, m.n_bins, m.decile_tokens,
           floor((CAST(m.n_bins AS DOUBLE) / t.lang_bins) * 1000000 + 0.5)
             / 1000000 AS share_of_bins
    FROM m JOIN tot t USING (lang)
    """,
    tags=("sampling", "packing", "stats", "llm"),
)
def packing_bin_fill_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of `pack_sequences` bin fill levels per language: each
    ~2048-token training bin lands in a fill decile (bin_tokens·10 div
    budget — deciles above 10 are bins a boundary-straddling doc
    overfilled, decile <10 means padding waste), with per-decile bin
    counts, token mass, and the share of the language's bins. The packing
    QA view: a healthy packer concentrates mass at decile 10; a fat tail
    below means short-doc fragmentation, above means megadocs the chunker
    should have split first.

    Plan shape at 100 TB: composes the registered `pack_sequences` plan
    (per-language cumulative window — partition key widens to
    (lang, shard) at scale, see its docstring) with a |langs|×|deciles|-
    bounded histogram aggregate; per-language totals fold from the
    histogram itself, no second corpus pass. The decile is computed with
    INTEGER division (never a float boundary), counts are exact; the one
    share division is correctly rounded at 1e-6.
    """
    bins = pack_sequences(spark, sf_dir)
    m = (
        bins.select(
            "lang",
            F.expr(f"bin_tokens * 10 div {_PACK_BUDGET}").alias("fill_decile"),
            "bin_tokens",
        )
        .groupBy("lang", "fill_decile")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("bin_tokens").alias("decile_tokens"),
        )
    )
    tot = m.groupBy("lang").agg(F.sum("n_bins").alias("lang_bins"))
    return m.join(F.broadcast(tot), "lang").select(
        "lang",
        "fill_decile",
        "n_bins",
        "decile_tokens",
        rnd(F.col("n_bins").cast("double") / F.col("lang_bins"), 6).alias(
            "share_of_bins"
        ),
    )


_EPOCH_BUDGET = 1_000_000  # global token budget for the planned mix
_EPOCH_ALPHA = 0.5  # temperature on token mass (sqrt smoothing)


@query(
    "token_budget_epoch_plan",
    oracle=f"""
    WITH m AS (
      SELECT source,
             CAST(SUM(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                      t -> t <> ''))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), z AS (
      SELECT SUM(POWER(CAST(tokens AS DOUBLE), {_EPOCH_ALPHA})) AS z FROM m
    )
    SELECT m.source, m.tokens,
           floor((POWER(CAST(m.tokens AS DOUBLE), {_EPOCH_ALPHA}) / z.z)
                 * 1000000 + 0.5) / 1000000 AS target_share,
           floor(({_EPOCH_BUDGET} * (POWER(CAST(m.tokens AS DOUBLE), {_EPOCH_ALPHA})
                  / z.z) / m.tokens) * 1000000 + 0.5) / 1000000 AS epochs
    FROM m CROSS JOIN z
    """,
    tags=("sampling", "mixing", "llm"),
)
def token_budget_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static data-mixing PLAN: given per-source token masses and a
    global token budget, assign each source a temperature-smoothed target
    share (m^α / Σ m^α, α = 0.5 — the sqrt mixing of mT5/XLM-R applied to
    sources) and report the implied EPOCH factor budget·share/m — how many
    times the source would be repeated (>1) or subsampled (<1) to hit its
    share. This is the planning half the samplers execute:
    `sample_temperature_mix` draws documents; this op emits the
    per-source repetition ledger a trainer's data loader consumes.

    Plan shape at 100 TB: one scan folds per-source token masses
    (|sources| rows); the normalizer Σ m^α is a scalar agg over that
    dimension-sized frame, re-attached as a 1-row broadcast crossJoin
    (keys=[] partial — passes the single-partition plan guard). Token
    masses are exact integers; share and epochs are IEEE pow/divide on
    identically-ordered operands, rounded at 1e-6 (the Σ m^α
    accumulation order differs between engines by ~1e-16 relative —
    margin audited with the scalar reference in tests/test_sampling.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.sum(F.size(tokens_col())).cast("long").alias("tokens")
    )
    pw = F.pow(F.col("tokens").cast("double"), F.lit(_EPOCH_ALPHA))
    z = m.agg(F.sum(pw).alias("z"))
    share = pw / F.col("z")
    return m.crossJoin(F.broadcast(z)).select(
        "source",
        "tokens",
        rnd(share, 6).alias("target_share"),
        rnd(
            F.lit(_EPOCH_BUDGET) * share / F.col("tokens"), 6
        ).alias("epochs"),
    )


@query(
    "packing_overflow_report",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), placed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM toks
    ), spans AS (
      SELECT doc_id, lang, n_tokens,
             CAST(FLOOR((cum - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS start_bin,
             CAST(FLOOR((cum - 1) / {_PACK_BUDGET}.0) AS BIGINT) AS end_bin
      FROM placed WHERE n_tokens >= 1
    )
    SELECT doc_id, lang, n_tokens, start_bin, end_bin,
           end_bin - start_bin AS n_splits
    FROM spans
    WHERE end_bin > start_bin
    """,
    tags=("sampling", "packing", "llm"),
)
def packing_overflow_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunker worklist for `pack_sequences`: every document whose
    token span CROSSES a 2048-token bin boundary under the same
    deterministic per-language doc_id-order placement — start_bin is the
    budget multiple its first token lands in (pack_sequences' bin),
    end_bin the multiple of its last token, n_splits the number of
    boundaries crossed (= extra fragments `chunk_documents` must cut it
    into for the packed batches to stay contiguous). pack_sequences'
    per-bin occupancy says bins overflow; this names the docs to split
    and by how much. Zero-token docs occupy no span and are excluded
    (mirrored by the oracle).

    Plan shape at 100 TB: identical to `pack_sequences` — one scan for
    (doc, lang, n_tokens), the same two-pass distributed prefix sum
    (`bucketed_prefix_sum`: per-(lang, id-range-bucket) subtotals +
    offset window over the tiny subtotal table + within-bucket running
    sum — never a per-language window over volume-scaled rows), then
    scan-speed bin arithmetic and a selective filter — boundary-crossing
    docs are ~(mean doc length / 2048) of the corpus, so the output is a
    small fraction of the input. The budget 2048 is a power of two, so
    the float divisions are IEEE-exact at any cumulative magnitude below
    2^53 and floor is boundary-safe; all other columns are exact
    integers.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    spans = (
        bucketed_prefix_sum(toks, ["lang"], "doc_id", "n_tokens")
        .filter(F.col("n_tokens") >= 1)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(_PACK_BUDGET)))
            .alias("start_bin"),
            F.floor((F.col("cum") - 1) / F.lit(float(_PACK_BUDGET)))
            .alias("end_bin"),
        )
    )
    return spans.filter(F.col("end_bin") > F.col("start_bin")).withColumn(
        "n_splits", F.col("end_bin") - F.col("start_bin")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split assignment
# --------------------------------------------------------------------------

# 24-bit md5-draw thresholds: u < _SPLIT_VAL_T -> val (P = 167772/2^24 ~ 1%),
# _SPLIT_VAL_T <= u < _SPLIT_TEST_T -> test (~2%), else train (~97%).
_SPLIT_VAL_T = int(0.01 * 16**6)
_SPLIT_TEST_T = int(0.03 * 16**6)


@query(
    "corpus_split_assign",
    oracle=f"""
    WITH d AS (
      SELECT source,
             CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6)
                  AS BIGINT) AS u,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    a AS (
      SELECT source,
             CASE WHEN u < {_SPLIT_VAL_T} THEN 'val'
                  WHEN u < {_SPLIT_TEST_T} THEN 'test'
                  ELSE 'train' END AS split,
             n_tokens
      FROM d
    ),
    g AS (
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM a GROUP BY 1, 2
    )
    SELECT source, split, n_docs, total_tokens,
           CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source)
             AS doc_share
    FROM g
    """,
    tags=("sampling", "llm", "split"),
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment + per-source split telemetry
    — the holdout-carving step every training corpus needs before mixing.

    Membership is content-addressed (md5(salt:doc_id) 24-bit draw against
    integer thresholds: ~1% val, ~2% test), so a document's split is a pure
    function of its id — stable across runs, cluster sizes, corpus
    re-shards, and incremental re-ingests (a re-crawled doc lands in the
    same split, so val never silently leaks into train). The draw is the
    same lexicographic-hex primitive as the samplers above: shuffle-free,
    pushable, no RNG state.

    Plan: one scan computing (source, split, n_tokens) at scan speed, ONE
    partial-aggregatable group-by on (source, split), then the share ratio
    via a window over the aggregate (<= 3 rows per source — bounded, the
    histogram-input shape the plan guard exempts). doc_share is a division
    of two exact int64 counts: IEEE-deterministic, hash-identical across
    engines without rounding.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.conv(_u6("split", F.col("doc_id")), 16, 10).cast("bigint")
    split = (
        F.when(u < _SPLIT_VAL_T, F.lit("val"))
        .when(u < _SPLIT_TEST_T, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    g = (
        docs.select(
            "source",
            split.alias("split"),
            F.size(tokens_col()).cast("long").alias("n_tokens"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    return g.select(
        "source",
        "split",
        "n_docs",
        "total_tokens",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias(
            "doc_share"
        ),
    )


def _split_sql(alias: str = "s") -> str:
    """Shared SQL fragment: per-doc split assignment (the
    `corpus_split_assign` draw, one statement of the thresholds)."""
    return f"""
    {alias} AS (
      SELECT doc_id,
             CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6)
                       AS BIGINT) < {_SPLIT_VAL_T} THEN 'val'
                  WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6)
                       AS BIGINT) < {_SPLIT_TEST_T} THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )"""


def _make_split_leakage_oracle() -> str:
    from .dedup import _CLUSTERS_ORACLE

    return f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    {_split_sql("s")},
    m AS (
      SELECT cl.cluster, s.doc_id, s.split
      FROM clusters cl JOIN s ON s.doc_id = cl.doc_id
    ),
    c AS (
      SELECT cluster,
             MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train,
             MAX(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS has_eval
      FROM m GROUP BY cluster
    )
    SELECT m.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN m.split = 'train' AND c.has_eval = 1 THEN 1
                         WHEN m.split <> 'train' AND c.has_train = 1 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_leaked,
           CAST(SUM(CASE WHEN m.split = 'train' AND c.has_eval = 1 THEN 1
                         WHEN m.split <> 'train' AND c.has_train = 1 THEN 1
                         ELSE 0 END) AS DOUBLE) / COUNT(*) AS leak_share
    FROM m JOIN c ON m.cluster = c.cluster
    GROUP BY m.split
    """


@query(
    "split_leakage_report",
    oracle=_make_split_leakage_oracle(),
    tags=("sampling", "llm", "split", "dedup", "contamination"),
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: how much of each train/val/test
    split shares a NEAR-DUP cluster with the other side of the holdout
    boundary. The split draw is content-addressed by doc_id while near
    duplicates have DIFFERENT ids, so the assignment cannot see them — a
    val doc whose near-copy sits in train silently inflates eval scores,
    the exact leak `decontaminate_benchmark` guards against for external
    benchmarks, here measured for the corpus's OWN holdout. Per split:
    docs, docs leaked (train doc with an eval near-dup, or eval doc with
    a train near-dup), leak share (division of two exact int64 counts —
    IEEE-deterministic, no rounding). A nonzero val/test leak_share
    means the split step must move whole dedup CLUSTERS, not docs
    (assign by cluster keeper id) — the report quantifies the need.

    Clusters are `dedup_clusters`' jaccard ≥ 0.5 components (the
    canonical near-dup relation here; its fixpoint dominates the cost),
    then one cluster-keyed bool aggregate, a cluster-keyed join back and
    a 3-row fold — nothing new at 100 TB."""
    from .dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    u = F.conv(_u6("split", F.col("doc_id")), 16, 10).cast("bigint")
    split = (
        F.when(u < _SPLIT_VAL_T, F.lit("val"))
        .when(u < _SPLIT_TEST_T, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    s = docs.select("doc_id", split.alias("split"))
    m = dedup_clusters(spark, sf_dir).join(s, "doc_id")
    c = m.groupBy("cluster").agg(
        F.max((F.col("split") == "train").cast("int")).alias("has_train"),
        F.max((F.col("split") != "train").cast("int")).alias("has_eval"),
    )
    leaked = F.when(
        (F.col("split") == "train") & (F.col("has_eval") == 1), 1
    ).when((F.col("split") != "train") & (F.col("has_train") == 1), 1).otherwise(0)
    return (
        m.join(c, "cluster")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(leaked).alias("n_leaked"),
            (F.sum(leaked).cast("double") / F.count(F.lit(1))).alias(
                "leak_share"
            ),
        )
    )


def _cluster_split_col(cluster_col: str = "cluster") -> Column:
    """Split draw keyed on the dedup CLUSTER label instead of the doc_id —
    the fix `split_leakage_report`'s docstring prescribes: every member of
    a near-dup cluster hashes the same key, so whole clusters land in one
    split and cross-split leakage is zero by construction. Same md5-prefix
    primitive and thresholds as `corpus_split_assign`."""
    u = F.conv(_u6("split", F.col(cluster_col)), 16, 10).cast("bigint")
    return (
        F.when(u < _SPLIT_VAL_T, F.lit("val"))
        .when(u < _SPLIT_TEST_T, F.lit("test"))
        .otherwise(F.lit("train"))
    )


def _cluster_split_case_sql(expr: str) -> str:
    """Oracle-side twin of `_cluster_split_col` for an arbitrary key
    expression (the `_split_sql` fragment hardcodes doc_id)."""
    draw = f"CAST('0x' || substr(md5('split:' || CAST({expr} AS VARCHAR)), 1, 6) AS BIGINT)"
    return (
        f"CASE WHEN {draw} < {_SPLIT_VAL_T} THEN 'val' "
        f"WHEN {draw} < {_SPLIT_TEST_T} THEN 'test' ELSE 'train' END"
    )


def _make_cluster_safe_assign_oracle() -> str:
    from .dedup import _CLUSTERS_ORACLE

    return f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    a AS (
      SELECT d.source,
             {_cluster_split_case_sql("cl.cluster")} AS split,
             CAST(len(list_filter(regexp_split_to_array(lower(d.text), '{TOKEN_DELIM}'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents d JOIN clusters cl ON d.doc_id = cl.doc_id
    ),
    g AS (
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM a GROUP BY 1, 2
    )
    SELECT source, split, n_docs, total_tokens,
           CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source)
             AS doc_share
    FROM g
    """


@query(
    "split_assign_cluster_safe",
    oracle=_make_cluster_safe_assign_oracle(),
    tags=("sampling", "llm", "split", "dedup", "contamination"),
)
def split_assign_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof train/val/test assignment: the split draw is keyed on
    the doc's near-dup CLUSTER label (`dedup_clusters`' connected-component
    keeper id) instead of its own doc_id, so a whole duplicate cluster
    moves across the holdout boundary together — the remediation a nonzero
    `split_leakage_report` leak_share demands (its docstring names exactly
    this fix; `split_leakage_after_fix` re-audits the result at zero).

    Same output shape as `corpus_split_assign` (per-source split telemetry)
    so the two assignment policies are directly comparable: cluster-keyed
    hashing preserves the ~1%/~2% val/test shares in expectation — cluster
    sizes are small relative to any source — and the telemetry quantifies
    the actual drift. Determinism carries over unchanged: a doc's split is
    a pure function of its cluster's min doc_id, stable across runs,
    re-shards, and incremental re-ingests as long as its cluster keeper is
    stable.

    Plan: the `dedup_clusters` fixpoint dominates (prefix-filtered edges +
    min-label propagation — the session-cached base every other
    contamination query reuses); after it, one hash join back to documents
    (doc_id-keyed, no skew), one partial-aggregatable group-by on
    (source, split), and a window over the ≤3-rows-per-source aggregate.
    Nothing new at 100 TB beyond the cluster base itself."""
    from .dedup import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    cl = dedup_clusters(spark, sf_dir)
    a = docs.select(
        "doc_id", "source", F.size(tokens_col()).cast("long").alias("n_tokens")
    ).join(cl, "doc_id")
    g = (
        a.select("source", _cluster_split_col().alias("split"), "n_tokens")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    return g.select(
        "source",
        "split",
        "n_docs",
        "total_tokens",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias(
            "doc_share"
        ),
    )


def _make_leakage_after_fix_oracle() -> str:
    from .dedup import _CLUSTERS_ORACLE

    return f"""
    WITH clusters AS ({_CLUSTERS_ORACLE}),
    m AS (
      SELECT cluster, doc_id,
             {_cluster_split_case_sql("cluster")} AS split
      FROM clusters
    ),
    c AS (
      SELECT cluster,
             MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train,
             MAX(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS has_eval
      FROM m GROUP BY cluster
    )
    SELECT m.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN m.split = 'train' AND c.has_eval = 1 THEN 1
                         WHEN m.split <> 'train' AND c.has_train = 1 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_leaked,
           CAST(SUM(CASE WHEN m.split = 'train' AND c.has_eval = 1 THEN 1
                         WHEN m.split <> 'train' AND c.has_train = 1 THEN 1
                         ELSE 0 END) AS DOUBLE) / COUNT(*) AS leak_share
    FROM m JOIN c ON m.cluster = c.cluster
    GROUP BY m.split
    """


@query(
    "split_leakage_after_fix",
    oracle=_make_leakage_after_fix_oracle(),
    tags=("sampling", "llm", "split", "dedup", "contamination"),
)
def split_leakage_after_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-audit closing the contamination loop: `split_leakage_report`
    measures cross-split near-dup leakage under the doc-keyed assignment;
    `split_assign_cluster_safe` is the fix; this query re-runs the SAME
    audit on the cluster-keyed assignment and certifies n_leaked = 0 per
    split. Zero holds by construction (all members of a cluster share the
    split key), but the audit recomputes it from the data — the oracle
    independently re-derives the clusters, the assignment, and the leak
    fold, so an engine bug in any of the three would surface as a hash
    mismatch, and the n_docs column pins the split sizes the fix actually
    produces. Same scale shape as `split_leakage_report`: the cluster
    fixpoint dominates, then one cluster-keyed bool aggregate and a 3-row
    fold."""
    from .dedup import dedup_clusters

    m = dedup_clusters(spark, sf_dir).select(
        "cluster", "doc_id", _cluster_split_col().alias("split")
    )
    c = m.groupBy("cluster").agg(
        F.max((F.col("split") == "train").cast("int")).alias("has_train"),
        F.max((F.col("split") != "train").cast("int")).alias("has_eval"),
    )
    leaked = F.when(
        (F.col("split") == "train") & (F.col("has_eval") == 1), 1
    ).when((F.col("split") != "train") & (F.col("has_train") == 1), 1).otherwise(0)
    return (
        m.join(c, "cluster")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(leaked).alias("n_leaked"),
            (F.sum(leaked).cast("double") / F.count(F.lit(1))).alias(
                "leak_share"
            ),
        )
    )
