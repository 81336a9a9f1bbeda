"""Semantic invariants for llm/filters.py beyond the differential oracle:
chunk coverage/overlap geometry, PII mask completeness, repetition-flag
consistency."""

from __future__ import annotations

from collections import defaultdict

from mapreduce_infrastructure_spark.llm.filters import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
    pii_redact,
    repetition_signals,
)
from mapreduce_infrastructure_spark.llm.text import doc_token_counts


def test_chunk_coverage_and_overlap(spark, sf_dir):
    chunks = chunk_documents(spark, sf_dir).collect()
    n_tokens = {
        r["doc_id"]: r["n_tokens"]
        for r in doc_token_counts(spark, sf_dir).collect()
    }
    by_doc = defaultdict(list)
    for r in chunks:
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        covered = set()
        for i, r in enumerate(rows):
            assert r["chunk_id"] == i
            assert r["start_token"] == 1 + i * CHUNK_STRIDE
            assert 1 <= r["n_chunk_tokens"] <= CHUNK_TOKENS
            assert len(r["chunk_text"].split(" ")) == r["n_chunk_tokens"]
            covered.update(
                range(r["start_token"], r["start_token"] + r["n_chunk_tokens"])
            )
        # every token index appears in at least one chunk, none past the end
        assert covered == set(range(1, n_tokens[doc_id] + 1))
        # all but the last chunk are full-width (stride < size => overlap 8)
        for r in rows[:-1]:
            assert r["n_chunk_tokens"] == CHUNK_TOKENS


def test_pii_redaction_is_complete(spark, sf_dir):
    rows = pii_redact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_ips"] >= 1
        assert "<EMAIL>" in r["redacted"] and "<IP>" in r["redacted"]
        assert "@example." not in r["redacted"]
        assert " from ip 10." not in r["redacted"].replace("<IP>", "")


def test_repetition_flag_consistency(spark, sf_dir):
    rows = repetition_signals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_unique"] <= r["n_tokens"]
        n_bigrams = max(r["n_tokens"] - 1, 0)
        assert 0 <= r["top2_count"] <= n_bigrams
        expect = "repetitive" if (
            (n_bigrams > 0 and r["top2_count"] * 10 >= n_bigrams)
            or (r["n_tokens"] > 0 and r["n_unique"] * 2 <= r["n_tokens"])
        ) else "ok"
        assert r["rep_flag"] == expect
        if r["top2_count"] > 0:
            assert r["top2gram"] and len(r["top2gram"].split(" ")) == 2
