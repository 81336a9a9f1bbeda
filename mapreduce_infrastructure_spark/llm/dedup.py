"""Deduplication operators over `documents` (north-star, BASELINE.json).

Four tiers, as a training-data pipeline needs them:

- exact          — fingerprint group-by (`dedup_exact`, oracle-checked)
- n-gram Jaccard — exact pairwise similarity within blocking keys
                   (`ngram_jaccard_pairs`, oracle-checked)
- MinHash + LSH  — the 100 TB scale path: signature → band → bucket join →
                   verify (`minhash_lsh_pairs`, self-validated in tests)
- SimHash        — bitwise fingerprints + banded Hamming search
                   (`simhash_neardup_pairs`, self-validated in tests)

Scale design: nothing here is O(n²) except the *verification* of
LSH-generated candidates (and the explicitly-exact ngram query, which
documents its blocking key). All joins shuffle on band/bucket hashes; all
hashing is seeded and deterministic (Spark's xxhash64 with per-signature
seed columns), so results are stable across runs and cluster sizes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..catalog import load_table
from ..functions.exact import rnd
from ..registry import query
from .text import tokens_col

# --------------------------------------------------------------------------
# Shingling
# --------------------------------------------------------------------------


def shingles_col(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token-array column (empty array for
    docs shorter than n). Pure codegen'd expression — no UDF."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(toks, i + j) for j in range(n)]
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", shingles_col(tokens_col()).alias("sh")
    ).filter(F.size("sh") > 0)


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a content fingerprint, keeping the
    smallest doc_id per group (deterministic, unlike dropDuplicates' pick).
    One shuffle on the fingerprint; at 100 TB this is the cheapest dedup
    tier and runs before any near-dup pass."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (blocked)
# --------------------------------------------------------------------------

_NGRAM_ORACLE = """
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS toks
            FROM documents)
    )
    SELECT a.lang,
           a.doc_id AS doc_a,
           b.doc_id AS doc_b,
           floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh)))) * 10000 + 0.5) / 10000 AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(a.sh) > 0 AND len(b.sh) > 0
      AND floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(a.sh, b.sh)))) * 10000 + 0.5) / 10000 >= 0.05
"""


@query("ngram_jaccard_pairs", oracle=_NGRAM_ORACLE, tags=("dedup", "join"))
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard similarity for document pairs within a
    blocking key (lang). Deliberately exact — the ground truth the LSH tier
    is validated against. The `lang` block bounds the quadratic term; at
    100 TB the blocking key must be finer (LSH buckets — see
    minhash_lsh_pairs) but the verify step is this same expression."""
    t = _doc_shingles(spark, sf_dir)
    a, b = t.alias("a"), t.alias("b")
    inter = F.array_intersect(F.col("a.sh"), F.col("b.sh"))
    union = F.array_union(F.col("a.sh"), F.col("b.sh"))
    jac = rnd(F.size(inter).cast("double") / F.size(union), 4)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.lang").alias("lang"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.05)
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# --------------------------------------------------------------------------

N_HASHES = 32
LSH_BANDS = 16  # r = 2 rows/band: P(candidate) = 1-(1-j^2)^16 (~0.99 at j=0.5)
LSH_ROWS = N_HASHES // LSH_BANDS
VERIFY_THRESHOLD = 0.5


def minhash_signature(sh: Column, n_hashes: int = N_HASHES) -> list[Column]:
    """n seeded minhash values of a shingle-array column. Seeding = hashing
    the shingle together with a literal seed via xxhash64 (deterministic,
    JVM-side, no UDF)."""
    return [
        F.array_min(F.transform(sh, lambda x, s=s: F.xxhash64(x, F.lit(s)))).alias(
            f"mh_{s}"
        )
        for s in range(n_hashes)
    ]


@query("minhash_signatures", tags=("dedup", "minhash"))
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-hash MinHash signature (first 4 exposed + full array).
    Deterministic but engine-specific hashing → no SQL oracle; invariants
    (signature equality tracks Jaccard) are asserted in tests/test_dedup.py."""
    t = _doc_shingles(spark, sf_dir)
    sig = t.select("doc_id", *minhash_signature(F.col("sh")))
    return sig.select(
        "doc_id",
        "mh_0",
        "mh_1",
        "mh_2",
        "mh_3",
        F.array(*[F.col(f"mh_{s}") for s in range(N_HASHES)]).alias("signature"),
    )


@query("minhash_lsh_pairs", tags=("dedup", "minhash", "lsh"))
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH: signature → 16 bands of 2 →
    band-hash bucket self-join → exact-Jaccard verification ≥ 0.5.

    This is the 100 TB dedup plan: candidate generation is a shuffle on
    (band_id, band_hash) — linear in corpus size — and only candidates pay
    the exact comparison. No SQL oracle (LSH recall is probabilistic);
    tests assert recall=1.0 against ngram ground truth ≥ 0.8 at fixture SF.
    """
    t = _doc_shingles(spark, sf_dir)
    sig = t.select("doc_id", "sh", *minhash_signature(F.col("sh")))
    bands = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                        ).alias("band_hash"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sh", "band.band_id", "band.band_hash")

    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = rnd(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")),
        4,
    )
    return (
        candidates.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= VERIFY_THRESHOLD)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


@pandas_udf(LongType())
def _simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash of a token array (Arrow-batched; the only Python hop in
    this module, vectorized per batch). Uses blake2b for engine-independent
    determinism."""
    import hashlib

    def one(toks) -> int:
        votes = [0] * 64
        if toks is not None:
            for t in toks:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
                )
                for i in range(64):
                    votes[i] += 1 if (h >> i) & 1 else -1
        v = 0
        for i in range(64):
            if votes[i] > 0:
                v |= 1 << i
        # two's-complement into signed 64-bit (Spark LongType)
        return v - (1 << 64) if v >= (1 << 63) else v

    return tokens.apply(one)


@query("simhash_neardup_pairs", tags=("dedup", "simhash"))
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, banded into 4×16-bit
    chunks (a pair within Hamming distance 3 must agree on ≥1 chunk), bucket
    join per chunk, Hamming verify via bit_count(xor) ≤ 16.

    Same LSH shape as minhash_lsh_pairs but constant-size state per doc —
    the cheapest near-dup tier at 100 TB. No SQL oracle; tests assert the
    planted near-dups are found and Hamming distances are symmetric."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", _simhash64(tokens_col()).alias("simhash")
    )
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 16)
    )
