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


@query("multimodal_features", tags=("multimodal", "udf"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: payload → Arrow-batched mapInPandas decode
    (stubbed deterministic) → feature columns. No SQL oracle (UDF stub);
    tests pin exact expected feature values."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        "mime",
        rnd(F.element_at("feature", 1), 1).alias("f0"),
        rnd(F.element_at("feature", 4), 1).alias("f3"),
    )
