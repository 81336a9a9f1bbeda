"""Semantic invariants for the corpus-telemetry operators
(source_unigram_kl, doc_char_entropy) beyond the differential oracle:
Gibbs' inequality, entropy bounds, and scalar-Python re-derivations."""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq

from mapreduce_infrastructure_spark.llm.text import (
    doc_char_entropy,
    source_unigram_kl,
)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_source_kl_gibbs_and_scalar_reference(spark, sf_dir):
    """KL(P_s || P_corpus) ≥ 0 (Gibbs), token totals partition the corpus,
    and each divergence matches a scalar-Python recomputation to the
    operator's 1e-6 rounding."""
    rows = {r.source: r for r in source_unigram_kl(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    per_source: dict[str, Counter] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        per_source.setdefault(source, Counter()).update(_tokens(text))
    # A source whose documents yield no tokens produces no (source, term)
    # rows, hence no output row — mirror that in the reference.
    per_source = {s: c for s, c in per_source.items() if c}
    corpus: Counter = Counter()
    for c in per_source.values():
        corpus.update(c)
    g_total = sum(corpus.values())
    assert set(rows) == set(per_source)
    assert sum(r.n_tokens for r in rows.values()) == g_total
    for source, counts in per_source.items():
        c_s = sum(counts.values())
        kl = sum(
            (c / c_s) * math.log((c / c_s) / (corpus[t] / g_total))
            for t, c in counts.items()
        )
        got = rows[source]
        assert got.n_tokens == c_s
        assert got.n_terms == len(counts)
        assert got.kl_nats >= -1e-9, (source, got.kl_nats)
        assert abs(got.kl_nats - kl) <= 2e-6, (source, got.kl_nats, kl)


def test_char_entropy_bounds_and_scalar_reference(spark, sf_dir):
    """0 ≤ H ≤ ln(distinct_chars) per doc, every document is covered, and
    a scalar recomputation agrees to the 1e-6 rounding."""
    rows = doc_char_entropy(spark, sf_dir).collect()
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    texts = dict(zip(tbl["doc_id"], tbl["text"]))
    assert {r.doc_id for r in rows} == {d for d, t in texts.items() if len(t) > 0}
    for r in rows:
        assert 0.0 <= r.entropy_nats <= math.log(r.distinct_chars) + 1e-9, r
        assert r.distinct_chars <= r.n_chars
    for r in rows[:25]:
        counts = Counter(texts[r.doc_id])
        n = sum(counts.values())
        h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        assert r.n_chars == n
        assert r.distinct_chars == len(counts)
        assert abs(r.entropy_nats - h) <= 2e-6, (r.doc_id, r.entropy_nats, h)


def test_char_split_code_point_parity_non_bmp(spark):
    """Both engines split text by CODE POINT, surrogate pairs intact —
    the property the doc_char_entropy oracle relies on, pinned here with
    supplementary-plane input since the fixtures are ASCII-only."""
    import duckdb

    from pyspark.sql import functions as F

    s = "ab\U0001F600c\U0001F680\U0001F680"  # emoji = non-BMP code points
    got_spark = (
        spark.createDataFrame([(s,)], "t string")
        .select(F.split("t", "").alias("cs"))
        .collect()[0]
        .cs
    )
    got_duck = duckdb.sql(
        "select regexp_split_to_array(?, '')", params=[s]
    ).fetchone()[0]
    expect = list(s)  # Python strings are code-point sequences
    assert got_spark == expect
    assert got_duck == expect
