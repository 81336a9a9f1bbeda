"""Multimodal column plumbing (north-star, BASELINE.json).

Images/audio/video are opaque `binary` payload columns with typed metadata,
flowing through relational operators like any other column. The Spark-side
plumbing — schema, partition-preserving transforms, Arrow-batched UDF
signatures, batch shapes — is real and tested; the actual media *decode* is
STUBBED (this container ships no image/audio libraries): `decode_payload`
raises NotImplementedError for real modes and provides a deterministic fake
feature extractor so the pipeline shape is exercised end to end.

Scale note: payloads stay in executors (never collect), transforms are
mapInPandas over Arrow batches — the exact shape a real decoder would use,
with `spark.sql.files.maxPartitionBytes` sizing scan partitions so a batch
of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..functions.exact import rnd
from ..registry import query

FEATURE_DIM = 4

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mime", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_payload(payload: bytes, mode: str = "fake") -> list[float]:
    """Decode one media payload into a feature vector.

    ``mode='fake'`` (default): deterministic stand-in features derived from
    the raw bytes — stable across runs/engines, used by tests.
    Real modes are intentionally unimplemented in this container.
    """
    if mode != "fake":
        raise NotImplementedError(
            f"media decode mode {mode!r} requires image/audio libraries not "
            "present in this environment; the Spark plumbing around it is real"
        )
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    return [
        float(len(payload) % 256),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of the
    text — in production this is the stored image/audio blob column)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def extract_features(payloads: DataFrame, mode: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of payloads —
    the real-decoder call shape (batch in, batch out, no driver hop)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "mime": pdf["mime"],
                    "feature": pdf["payload"].map(
                        lambda b: decode_payload(b, mode=mode)
                    ),
                }
            )

    return payloads.mapInPandas(batches, FEATURE_SCHEMA)


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata through relational ops
    (JVM-side only — proves binary columns survive scan/project)."""
    docs = load_table(spark, sf_dir, "documents")
    return attach_payload(docs).select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        "mime",
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime,
           floor(CAST(octet_length(encode(text)) % 256 AS DOUBLE) * 10 + 0.5)
             / 10 AS f0,
           floor(CAST(coalesce(list_sum(list_transform(
                   string_split_regex(text, ''), c -> ascii(c))), 0) % 997
                 AS DOUBLE) * 10 + 0.5) / 10 AS f3
    FROM documents
    """,
    tags=("multimodal", "udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: payload → Arrow-batched mapInPandas decode
    (stubbed deterministic) → feature columns. Tests pin exact expected
    feature values.

    Graduated to oracle-backed in round 10: the deterministic fake
    features ARE byte arithmetic (f0 = n_bytes mod 256, f3 = byte-sum mod
    997), so under the fixture's pinned ASCII premise (see
    `multimodal_frame_sample`'s oracle note — byte ≡ char, ascii(c) is
    the byte value) DuckDB computes them from the text column directly;
    the oracle mirrors rnd()'s floor(x·10+0.5)/10 literally. A REAL
    decoder stays rows-only — this graduation certifies the plumbing
    (schema, Arrow batching, empty-payload path), which is exactly what
    the fake mode exists to pin."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        "mime",
        rnd(F.element_at("feature", 1), 1).alias("f0"),
        rnd(F.element_at("feature", 4), 1).alias("f3"),
    )


_FRAME_BYTES = 32
_FRAME_STRIDE = 64
_MAX_FRAMES = 8


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, unnest(generate_series(0, {_MAX_FRAMES - 1})) AS idx
      FROM documents
    )
    SELECT doc_id,
           CAST(idx AS INTEGER) AS frame_idx,
           CAST(idx * {_FRAME_STRIDE} + 1 AS BIGINT) AS frame_off,
           CAST(octet_length(encode(substring(text,
                 CAST(idx * {_FRAME_STRIDE} + 1 AS BIGINT), {_FRAME_BYTES})))
             AS BIGINT) AS n_frame_bytes,
           md5(substring(text, CAST(idx * {_FRAME_STRIDE} + 1 AS BIGINT),
               {_FRAME_BYTES})) AS frame_md5
    FROM f
    WHERE idx * {_FRAME_STRIDE} + 1 <= octet_length(encode(text))
    """,
    tags=("multimodal", "sampling"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque binary payloads — the video-style
    multimodal primitive (grab every k-th fixed-size frame, up to N, for
    downstream decode/embedding): 32-byte frames at stride 64, first 8
    frames per payload, each emitted with its offset, actual byte count
    (the tail frame may be short) and an md5 fingerprint so a
    downstream de-duplicator can drop repeated frames without touching
    payload bytes again. Entirely JVM-side — binary `substring` and
    `md5` are codegen'd expressions; no Python, no decode (a real
    pipeline points `decode_payload` at each sampled frame).

    Oracle note: DuckDB cannot slice BLOBs, so the oracle slices the
    TEXT and relies on byte-offset ≡ char-offset, which holds because
    the fixture corpus is pure ASCII — a premise PINNED by
    tests/test_mr_compat.py::test_frame_sample_ascii_premise_and_scalar_reference
    (md5(VARCHAR) hashes the same UTF-8 bytes Spark's binary md5 sees).
    The OPERATOR itself is byte-correct for arbitrary binary payloads.

    Plan shape at 100 TB: one scan, an 8-element array explode (bounded
    fan-out, unlike token explodes), scan-speed slicing/hashing, a
    selective length filter; no shuffle at all — the shuffle-free
    sampling front of a decode pipeline, with `maxPartitionBytes` sizing
    batches so frames of fat payloads fit executor memory (see module
    docstring).
    """
    docs = load_table(spark, sf_dir, "documents")
    pay = attach_payload(docs)
    n = F.length("payload")
    frames = pay.select(
        "doc_id",
        "payload",
        n.alias("n_bytes"),
        F.explode(F.sequence(F.lit(0), F.lit(_MAX_FRAMES - 1))).alias("idx"),
    ).filter(F.col("idx") * _FRAME_STRIDE + 1 <= F.col("n_bytes"))
    off = F.col("idx") * _FRAME_STRIDE + 1
    frame = F.substring(F.col("payload"), off, F.lit(_FRAME_BYTES))
    return frames.select(
        "doc_id",
        F.col("idx").cast("int").alias("frame_idx"),
        off.cast("long").alias("frame_off"),
        F.length(frame).cast("long").alias("n_frame_bytes"),
        F.md5(frame).alias("frame_md5"),
    )
