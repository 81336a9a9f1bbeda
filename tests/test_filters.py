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


def test_boilerplate_ngram_filter_invariants(spark, sf_dir):
    """Inter-doc boilerplate: counts bounded by totals, frac consistent
    with the integer fields, flag exactly the majority-boilerplate rule,
    and a doc duplicated BOILER_MIN_DF times is 100% boilerplate."""
    from mapreduce_infrastructure_spark.llm.filters import (
        BOILER_MIN_DF,
        boilerplate_ngram_filter,
    )

    rows = boilerplate_ngram_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_ngrams
        assert (r.boiler_flag == "boilerplate") == (
            r.n_ngrams > 0 and 2 * r.n_boiler >= r.n_ngrams
        )
        if r.n_ngrams:
            # engine rounds half-up (floor(x*1e4+0.5)/1e4), not banker's
            import math

            expect = math.floor(r.n_boiler / r.n_ngrams * 10000 + 0.5) / 10000
            assert abs(r.boiler_frac - expect) < 1e-12

    # Synthetic corpus: one sentence replicated BOILER_MIN_DF times plus a
    # unique doc -> replicated docs are all-boilerplate, unique doc is not.
    import tempfile

    with tempfile.TemporaryDirectory() as sf:
        text = "alpha beta gamma delta epsilon zeta"
        docs = [(i, text, "en", "t", len(text)) for i in range(BOILER_MIN_DF)]
        docs.append((99, "one unique sentence nothing shares this", "en", "t", 39))
        spark.createDataFrame(
            docs,
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        got = {r.doc_id: r for r in boilerplate_ngram_filter(spark, sf).collect()}
        for i in range(BOILER_MIN_DF):
            assert got[i].boiler_flag == "boilerplate" and got[i].boiler_frac == 1.0
        assert got[99].boiler_flag == "ok" and got[99].n_boiler == 0


def test_compression_ratio_matches_scalar_zlib(spark, sf_dir):
    """Exact zlib byte counts for every sampled doc, plus the integer-exact
    flag contract and a planted low/high-entropy pair — the no-oracle
    operator's scalar ground truth."""
    import zlib

    from pyspark.sql import Row

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.filters import (
        _ZLIB_LEVEL,
        doc_compression_ratio,
    )

    got = {r.doc_id: r for r in doc_compression_ratio(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    }
    assert docs and set(docs) <= set(got)
    for doc_id, text in docs.items():
        raw = (text or "").encode("utf-8")
        b, z = len(raw), len(zlib.compress(raw, _ZLIB_LEVEL))
        r = got[doc_id]
        assert (r.n_bytes, r.n_zlib) == (b, z)
        want_flag = (
            "low_entropy"
            if z * 10 < b * 3
            else ("high_entropy" if z >= b and b > 0 else "ok")
        )
        assert r.comp_flag == want_flag
        assert abs(r.comp_ratio - (z / b if b else 0.0)) <= 5e-5

    # Planted extremes: pure repetition must flag low_entropy; a doc the
    # deflate cannot shrink (here: shorter than the deflate header itself,
    # the honest way a *text* column reaches ratio >= 1) must flag
    # high_entropy.
    planted = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam " * 400),
            Row(doc_id=2, text="k9$wp2m!x"),
        ]
    )
    flags = {
        r.doc_id: r.comp_flag
        for r in planted.mapInPandas(
            __import__(
                "mapreduce_infrastructure_spark.llm.filters", fromlist=["x"]
            )._compression_batches,
            schema=__import__(
                "mapreduce_infrastructure_spark.llm.filters", fromlist=["x"]
            ).COMPRESSION_SCHEMA,
        ).collect()
    }
    assert flags[1] == "low_entropy"
    assert flags[2] == "high_entropy"


def test_doc_compression_full_partial_oracle_pure_python(spark, sf_dir):
    """PARTIAL ORACLE (round-16 wave 2): the ENTIRE doc_compression_ratio
    result re-derived for EVERY document (the older test pinned a 50-doc
    slice): exact utf-8 byte counts, exact deflate byte counts at the
    pinned level, the truncating comp_ratio round, and the integer-exact
    flag thresholds, matched row for row. Honest label: the deflate
    recount uses the SAME CPython zlib the engine's Arrow batches call —
    deterministic replication of the codec, not an independent
    implementation (zlib output is fully determined by input + level +
    library, stated in the query's why-not); the byte/ratio/flag
    arithmetic IS independently re-derived."""
    import zlib

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.llm.filters import (
        _ZLIB_LEVEL,
        doc_compression_ratio,
    )

    got = {r.doc_id: r for r in doc_compression_ratio(spark, sf_dir).collect()}
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()
    assert set(got) == set(ids)
    for d, t in zip(ids, tbl["text"].to_pylist()):
        raw = (t or "").encode("utf-8")
        b, z = len(raw), len(zlib.compress(raw, _ZLIB_LEVEL))
        r = got[d]
        assert (r.n_bytes, r.n_zlib) == (b, z)
        ratio = z / b if b > 0 else 0.0
        assert r.comp_ratio == int(ratio * 10000 + 0.5) / 10000
        want_flag = (
            "low_entropy"
            if z * 10 < b * 3
            else ("high_entropy" if z >= b and b > 0 else "ok")
        )
        assert r.comp_flag == want_flag
