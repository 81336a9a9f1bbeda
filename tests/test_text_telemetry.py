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


def _boundary_margin(x: float, digits: int = 6) -> float:
    """Distance from x·10^d + 0.5 to the nearest integer — how close the
    convention-free rounding floor(x·10^d + 0.5) is to flipping."""
    import math as _m

    y = x * (10**digits) + 0.5
    return abs(y - round(y)) / (10**digits)


def test_kl_and_entropy_rounding_margins_cross_engine(spark, sf_dir):
    """The certified outputs round an order-dependent double sum at 1e-6;
    a cross-engine flake needs the UNROUNDED values to differ AND to
    straddle a rounding boundary. Measure both margins on the real
    fixture instead of assuming them: unrounded Spark-vs-DuckDB
    divergence must stay tiny, and no value may sit so close to a
    boundary that that divergence could flip the rounded output."""
    import duckdb

    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.text import TOKEN_DELIM, tokens_col

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )

    # --- source_unigram_kl, unrounded ---
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(tokens_col()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("c_s"))
    g = st.groupBy("term").agg(F.sum("c_st").alias("g_t"))
    tot = s_tot.agg(F.sum("c_s").alias("g_total"))
    p = F.col("c_st").cast("double") / F.col("c_s")
    q = F.col("g_t").cast("double") / F.col("g_total")
    kl_spark = {
        r.source: r.kl
        for r in st.join(g, "term")
        .join(F.broadcast(s_tot), "source")
        .join(F.broadcast(tot))
        .groupBy("source")
        .agg(F.sum(p * F.log(p / q)).alias("kl"))
        .collect()
    }
    kl_duck = dict(
        con.execute(
            f"""
        WITH toks AS (
          SELECT source,
                 unnest(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                    x -> x <> '')) AS term
          FROM documents
        ), st AS (
          SELECT source, term, COUNT(*) AS c_st FROM toks GROUP BY source, term
        ), s_tot AS (
          SELECT source, CAST(SUM(c_st) AS BIGINT) AS c_s FROM st GROUP BY source
        ), g AS (
          SELECT term, CAST(SUM(c_st) AS BIGINT) AS g_t FROM st GROUP BY term
        ), tot AS (SELECT CAST(SUM(g_t) AS BIGINT) AS g_total FROM g)
        SELECT st.source,
               SUM((CAST(c_st AS DOUBLE) / c_s)
                   * ln((CAST(c_st AS DOUBLE) / c_s)
                        / (CAST(g_t AS DOUBLE) / g_total))) AS kl
        FROM st JOIN g USING (term) JOIN s_tot USING (source) CROSS JOIN tot
        GROUP BY st.source
        """
        ).fetchall()
    )

    # --- doc_char_entropy, unrounded ---
    cc = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    h_spark = {
        r.doc_id: r.h
        for r in cc.groupBy("doc_id")
        .agg(
            (
                F.log(n.cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n
            ).alias("h")
        )
        .collect()
    }
    h_duck = dict(
        con.execute(
            """
        WITH chars AS (
          SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
          FROM documents
        ), cc AS (
          SELECT doc_id, ch, COUNT(*) AS c FROM chars WHERE ch <> ''
          GROUP BY doc_id, ch
        )
        SELECT doc_id,
               ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c) AS h
        FROM cc GROUP BY doc_id
        """
        ).fetchall()
    )

    for name, spark_vals, duck_vals in [
        ("kl", kl_spark, kl_duck),
        ("entropy", h_spark, h_duck),
    ]:
        assert set(spark_vals) == set(duck_vals)
        max_div = max(abs(spark_vals[k] - duck_vals[k]) for k in spark_vals)
        # ln ulp slack + summation-order noise: orders below the rounding
        # granularity.
        assert max_div < 1e-9, (name, max_div)
        min_margin = min(_boundary_margin(v) for v in spark_vals.values())
        # No value sits within 100x the worst divergence of a boundary.
        assert min_margin > 100 * max(max_div, 1e-15), (name, min_margin, max_div)


def test_tfidf_rounding_margin_cross_engine(spark, sf_dir):
    """Completes the transcendental-math margin audit: tfidf is the one
    other certified query whose float output passes through `ln` (which,
    unlike + - * / sqrt, is NOT required to be correctly rounded). Pin the
    unrounded tf·ln(N/df) divergence and its distance to the 1e-4
    rounding boundary."""
    import duckdb

    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.text import TOKEN_DELIM, tokens_col

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    spark_vals = {
        (r.doc_id, r.term): r.tfidf
        for r in tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
                "tfidf"
            ),
        )
        .collect()
    }
    con = duckdb.connect()
    duck_vals = {
        (doc_id, term): v
        for doc_id, term, v in con.execute(
            f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                    x -> x <> '')) AS term
          FROM read_parquet('{sf_dir}/documents.parquet')
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ), df AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), n AS (SELECT COUNT(*) AS n FROM read_parquet('{sf_dir}/documents.parquet'))
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
        """
        ).fetchall()
    }
    assert set(spark_vals) == set(duck_vals)
    max_div = max(
        abs(spark_vals[k] - duck_vals[k]) for k in spark_vals
    )
    assert max_div < 1e-9, max_div
    min_margin = min(_boundary_margin(v, 4) for v in spark_vals.values())
    assert min_margin > 100 * max(max_div, 1e-15), (min_margin, max_div)


def test_doc_unigram_logloss_gibbs_and_scalar_reference(spark, sf_dir):
    """Per-doc cross-entropy H(P_d, Q_corpus) ≥ per-doc entropy H(P_d)
    (Gibbs), token totals match, coverage = docs with ≥1 token, and each
    score matches a scalar-Python recomputation to the 1e-6 rounding."""
    from mapreduce_infrastructure_spark.llm.text import doc_unigram_logloss

    rows = {r.doc_id: r for r in doc_unigram_logloss(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    per_doc: dict[int, Counter] = {
        d: Counter(_tokens(t)) for d, t in zip(tbl["doc_id"], tbl["text"])
    }
    per_doc = {d: c for d, c in per_doc.items() if c}
    corpus: Counter = Counter()
    for c in per_doc.values():
        corpus.update(c)
    g_total = sum(corpus.values())
    assert set(rows) == set(per_doc)
    for doc_id in sorted(per_doc)[:50]:
        counts = per_doc[doc_id]
        n_d = sum(counts.values())
        ll = -sum(c * math.log(corpus[t] / g_total) for t, c in counts.items()) / n_d
        h_d = -sum((c / n_d) * math.log(c / n_d) for c in counts.values())
        got = rows[doc_id]
        assert got.n_tokens == n_d
        assert abs(got.logloss_nats - ll) <= 2e-6, (doc_id, got.logloss_nats, ll)
        assert got.logloss_nats >= h_d - 2e-6, (doc_id, got.logloss_nats, h_d)


def test_source_jsd_bounds_and_scalar_reference(spark, sf_dir):
    """0 ≤ JSD ≤ ln 2 per source; closed-form absent-term correction must
    equal a scalar recomputation over the FULL corpus vocabulary (the
    dense sum the operator deliberately avoids materializing)."""
    from mapreduce_infrastructure_spark.llm.text import source_js_divergence

    rows = {r.source: r for r in source_js_divergence(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    per_source: dict[str, Counter] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        per_source.setdefault(source, Counter()).update(_tokens(text))
    per_source = {s: c for s, c in per_source.items() if c}
    corpus: Counter = Counter()
    for c in per_source.values():
        corpus.update(c)
    g_total = sum(corpus.values())
    assert set(rows) == set(per_source)
    ln2 = math.log(2.0)
    for source, counts in per_source.items():
        c_s = sum(counts.values())
        # Dense reference: iterate the WHOLE vocabulary, p=0 terms included.
        jsd = 0.0
        for t, g_t in corpus.items():
            p = counts.get(t, 0) / c_s
            q = g_t / g_total
            m = (p + q) / 2.0
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            jsd += 0.5 * q * math.log(q / m)
        got = rows[source]
        assert got.n_tokens == c_s
        assert -1e-9 <= got.jsd_nats <= ln2 + 1e-9, (source, got.jsd_nats)
        assert abs(got.jsd_nats - jsd) <= 2e-6, (source, got.jsd_nats, jsd)


def test_logloss_and_jsd_rounding_margins_cross_engine(spark, sf_dir):
    """Extends the transcendental-math margin audit to the wave-2
    telemetry outputs (both pass double ratios through `ln`, which is not
    required to be correctly rounded): unrounded Spark-vs-DuckDB
    divergence must stay orders below the 1e-6 rounding granularity, and
    no value may sit within 100x that divergence of a rounding boundary."""
    import duckdb

    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.text import TOKEN_DELIM, tokens_col

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    docs = load_table(spark, sf_dir, "documents")

    # --- doc_unigram_logloss, unrounded ---
    dt = (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c_dt"))
    )
    g = dt.groupBy("term").agg(F.sum("c_dt").alias("g_t"))
    tot = g.agg(F.sum("g_t").alias("g_total"))
    q = F.col("g_t").cast("double") / F.col("g_total")
    ll_spark = {
        r.doc_id: r.ll
        for r in dt.join(g, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg((-F.sum(F.col("c_dt") * F.log(q)) / F.sum("c_dt")).alias("ll"))
        .collect()
    }
    ll_duck = dict(
        con.execute(
            f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                    x -> x <> '')) AS term
          FROM documents
        ), dt AS (
          SELECT doc_id, term, COUNT(*) AS c_dt FROM toks GROUP BY doc_id, term
        ), g AS (
          SELECT term, CAST(SUM(c_dt) AS BIGINT) AS g_t FROM dt GROUP BY term
        ), tot AS (SELECT CAST(SUM(g_t) AS BIGINT) AS g_total FROM g)
        SELECT dt.doc_id,
               -SUM(c_dt * ln(CAST(g_t AS DOUBLE) / g_total)) / SUM(c_dt) AS ll
        FROM dt JOIN g USING (term) CROSS JOIN tot
        GROUP BY dt.doc_id
        """
        ).fetchall()
    )

    # --- source_js_divergence, unrounded ---
    st = (
        docs.select("source", F.explode(tokens_col()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("c_s"))
    gs = st.groupBy("term").agg(F.sum("c_st").alias("g_t"))
    tots = s_tot.agg(F.sum("c_s").alias("g_total"))
    p = F.col("c_st").cast("double") / F.col("c_s")
    qs = F.col("g_t").cast("double") / F.col("g_total")
    two = F.lit(2.0)
    inside = p * F.log(two * p / (p + qs)) + qs * F.log(two * qs / (p + qs))
    jsd_spark = {
        r.source: r.jsd
        for r in st.join(gs, "term")
        .join(F.broadcast(s_tot), "source")
        .join(F.broadcast(tots))
        .groupBy("source")
        .agg(
            (
                F.lit(0.5) * F.sum(inside)
                + F.lit(0.5) * F.log(two) * (F.lit(1.0) - F.sum(qs))
            ).alias("jsd")
        )
        .collect()
    }
    jsd_duck = dict(
        con.execute(
            f"""
        WITH toks AS (
          SELECT source,
                 unnest(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                    x -> x <> '')) AS term
          FROM documents
        ), st AS (
          SELECT source, term, COUNT(*) AS c_st FROM toks GROUP BY source, term
        ), s_tot AS (
          SELECT source, CAST(SUM(c_st) AS BIGINT) AS c_s FROM st GROUP BY source
        ), g AS (
          SELECT term, CAST(SUM(c_st) AS BIGINT) AS g_t FROM st GROUP BY term
        ), tot AS (SELECT CAST(SUM(g_t) AS BIGINT) AS g_total FROM g
        ), scored AS (
          SELECT st.source, s_tot.c_s,
                 CAST(c_st AS DOUBLE) / c_s AS p,
                 CAST(g_t AS DOUBLE) / g_total AS q
          FROM st JOIN g USING (term) JOIN s_tot USING (source) CROSS JOIN tot
        )
        SELECT source,
               0.5 * SUM(p * ln(2 * p / (p + q)) + q * ln(2 * q / (p + q)))
                 + 0.5 * ln(2) * (1 - SUM(q)) AS jsd
        FROM scored GROUP BY source
        """
        ).fetchall()
    )

    for name, spark_vals, duck_vals in [
        ("logloss", ll_spark, ll_duck),
        ("jsd", jsd_spark, jsd_duck),
    ]:
        assert set(spark_vals) == set(duck_vals)
        max_div = max(abs(spark_vals[k] - duck_vals[k]) for k in spark_vals)
        assert max_div < 1e-9, (name, max_div)
        min_margin = min(_boundary_margin(v) for v in spark_vals.values())
        assert min_margin > 100 * max(max_div, 1e-15), (name, min_margin, max_div)


def test_ngram_novelty_scalar_reference_and_bounds(spark, sf_dir):
    """Novelty ∈ [0, 1]; the earliest shingle-bearing doc is 100% novel;
    every doc matches a scalar first-seen recomputation exactly (counts)
    and to 1e-6 (ratio)."""
    from mapreduce_infrastructure_spark.llm.dedup import ngram_novelty_ratio

    rows = {r.doc_id: r for r in ngram_novelty_ratio(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    shingles = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        toks = _tokens(text)
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if sh:
            shingles[doc_id] = sh
    first: dict[str, int] = {}
    for doc_id in sorted(shingles):
        for g in shingles[doc_id]:
            first.setdefault(g, doc_id)
    assert set(rows) == set(shingles)
    earliest = min(shingles)
    assert rows[earliest].novelty_ratio == 1.0
    for doc_id, sh in shingles.items():
        n_novel = sum(1 for g in sh if first[g] == doc_id)
        got = rows[doc_id]
        assert got.n_grams == len(sh)
        assert got.n_novel == n_novel
        assert 0.0 <= got.novelty_ratio <= 1.0
        assert abs(got.novelty_ratio - n_novel / len(sh)) <= 1e-6


def test_type_token_curve_scalar_reference_and_monotonicity(spark, sf_dir):
    """Whole-doc-prefix budget semantics pinned against a scalar
    recomputation; per source, n_docs/n_tokens/n_types are all
    non-decreasing in the budget and n_tokens ≤ budget."""
    from mapreduce_infrastructure_spark.llm.text import (
        _HEAPS_BUDGETS,
        source_type_token_curve,
    )

    rows = {
        (r.source, r.budget): r
        for r in source_type_token_curve(spark, sf_dir).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    per_source: dict[str, list[tuple[int, list[str]]]] = {}
    for doc_id, source, text in zip(tbl["doc_id"], tbl["source"], tbl["text"]):
        per_source.setdefault(source, []).append((doc_id, _tokens(text)))
    expected_keys = set()
    for source, docs in per_source.items():
        docs.sort()
        for b in _HEAPS_BUDGETS:
            expected_keys.add((source, b))
            cum, n_docs, types = 0, 0, set()
            for _, toks in docs:
                if cum + len(toks) > b:
                    break
                cum += len(toks)
                n_docs += 1
                types.update(toks)
            got = rows[(source, b)]
            assert got.n_docs == n_docs, (source, b)
            assert got.n_tokens == cum <= b
            assert got.n_types == len(types)
            if cum == 0:
                assert got.type_token_ratio is None
            else:
                assert abs(got.type_token_ratio - len(types) / cum) <= 1e-6
        series = [rows[(source, b)] for b in sorted(_HEAPS_BUDGETS)]
        for a, c in zip(series, series[1:]):
            assert a.n_docs <= c.n_docs
            assert a.n_tokens <= c.n_tokens
            assert a.n_types <= c.n_types
    assert set(rows) == expected_keys


def test_stopword_drift_closed_form_matches_dense_reference(spark, sf_dir):
    """0 ≤ L1 ≤ 2 per source, and the operator's closed-form absent-word
    correction must equal a dense scalar L1 over the FULL 13-word
    vocabulary."""
    from mapreduce_infrastructure_spark.llm.text import (
        _DRIFT_WORDS,
        stopword_profile_drift,
    )

    rows = {r.source: r for r in stopword_profile_drift(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    vocab = set(_DRIFT_WORDS)
    per_source: dict[str, Counter] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        per_source.setdefault(source, Counter()).update(
            t for t in _tokens(text) if t in vocab
        )
    per_source = {s: c for s, c in per_source.items() if c}
    corpus: Counter = Counter()
    for c in per_source.values():
        corpus.update(c)
    t_all = sum(corpus.values())
    assert set(rows) == set(per_source)
    for source, counts in per_source.items():
        t_s = sum(counts.values())
        l1 = sum(
            abs(counts.get(w, 0) / t_s - corpus[w] / t_all) for w in vocab
        )
        got = rows[source]
        assert got.n_stop_tokens == t_s
        assert -1e-9 <= got.l1_drift <= 2.0 + 1e-9
        assert abs(got.l1_drift - l1) <= 2e-6, (source, got.l1_drift, l1)


def test_stopword_drift_rounding_margin_cross_engine(spark, sf_dir):
    """l1_drift has no transcendental term (novelty_ratio and
    type_token_ratio are single correctly-rounded divisions, identical
    across engines by IEEE 754), but its Σ|p−q| is order-dependent —
    measure the unrounded cross-engine divergence and the rounding
    boundary margin like the ln-path audits."""
    import duckdb

    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.llm.text import (
        _DRIFT_WORDS,
        TOKEN_DELIM,
        tokens_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    sw = docs.select(
        "source",
        F.explode(F.filter(tokens_col(), lambda x: x.isin(*_DRIFT_WORDS))).alias("w"),
    )
    c = sw.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))
    s_tot = c.groupBy("source").agg(F.sum("c_sw").alias("t_s"))
    g = c.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    tot = s_tot.agg(F.sum("t_s").alias("t_all"))
    p = F.col("c_sw").cast("double") / F.col("t_s")
    q = F.col("c_w").cast("double") / F.col("t_all")
    spark_vals = {
        r.source: r.l1
        for r in c.join(F.broadcast(g), "w")
        .join(F.broadcast(s_tot), "source")
        .join(F.broadcast(tot))
        .groupBy("source")
        .agg((F.sum(F.abs(p - q)) + (F.lit(1.0) - F.sum(q))).alias("l1"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    duck_vals = dict(
        con.execute(
            f"""
        WITH sw AS (
          SELECT source,
                 unnest(list_filter(regexp_split_to_array(lower(text), '{TOKEN_DELIM}'),
                                    x -> x IN {_DRIFT_WORDS!r})) AS w
          FROM documents
        ), c AS (
          SELECT source, w, COUNT(*) AS c_sw FROM sw GROUP BY source, w
        ), s_tot AS (
          SELECT source, CAST(SUM(c_sw) AS BIGINT) AS t_s FROM c GROUP BY source
        ), g AS (
          SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM c GROUP BY w
        ), tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS t_all FROM g
        ), scored AS (
          SELECT c.source, s_tot.t_s,
                 CAST(c_sw AS DOUBLE) / t_s AS p,
                 CAST(c_w AS DOUBLE) / t_all AS q
          FROM c JOIN g USING (w) JOIN s_tot USING (source) CROSS JOIN tot
        )
        SELECT source, SUM(abs(p - q)) + (1 - SUM(q)) AS l1
        FROM scored GROUP BY source
        """
        ).fetchall()
    )
    assert set(spark_vals) == set(duck_vals)
    max_div = max(abs(spark_vals[k] - duck_vals[k]) for k in spark_vals)
    assert max_div < 1e-12, max_div
    min_margin = min(_boundary_margin(v) for v in spark_vals.values())
    assert min_margin > 100 * max(max_div, 1e-15), (min_margin, max_div)


def test_source_dup_mass_scalar_reference(spark, sf_dir):
    """Dup mass recomputed scalar-side with the same md5/keep-MIN
    convention as dedup_exact; totals partition the corpus token mass and
    ratios stay in [0, 1]."""
    import hashlib

    from mapreduce_infrastructure_spark.llm.dedup import source_dup_mass

    rows = {r.source: r for r in source_dup_mass(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    keep: dict[str, int] = {}
    for doc_id, text in sorted(zip(tbl["doc_id"], tbl["text"])):
        keep.setdefault(hashlib.md5(text.encode()).hexdigest(), doc_id)
    per_source: dict[str, list[int]] = {}
    for doc_id, source, text in zip(tbl["doc_id"], tbl["source"], tbl["text"]):
        n = len(_tokens(text))
        dup = keep[hashlib.md5(text.encode()).hexdigest()] != doc_id
        per_source.setdefault(source, [0, 0, 0])
        per_source[source][0] += 1
        per_source[source][1] += n
        per_source[source][2] += n if dup else 0
    assert set(rows) == set(per_source)
    for source, (n_docs, total, dup_toks) in per_source.items():
        got = rows[source]
        assert got.n_docs == n_docs
        assert got.total_tokens == total
        assert got.dup_tokens == dup_toks
        if total:
            assert 0.0 <= got.dup_mass_ratio <= 1.0
            assert abs(got.dup_mass_ratio - dup_toks / total) <= 1e-6
        else:
            assert got.dup_mass_ratio is None


def test_budget_pack_efficiency_scalar_reference(spark, sf_dir):
    """Packing waste pinned against the same scalar whole-doc prefix as
    the Heaps-curve test; waste + packed tokens = budget, overflow count
    complements the prefix count."""
    from mapreduce_infrastructure_spark.llm.text import (
        _HEAPS_BUDGETS,
        budget_pack_efficiency,
    )

    rows = {
        (r.source, r.budget): r
        for r in budget_pack_efficiency(spark, sf_dir).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    per_source: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source, text in zip(tbl["doc_id"], tbl["source"], tbl["text"]):
        per_source.setdefault(source, []).append((doc_id, len(_tokens(text))))
    for source, docs in per_source.items():
        docs.sort()
        for b in _HEAPS_BUDGETS:
            cum, n_docs = 0, 0
            for _, n in docs:
                if cum + n > b:
                    break
                cum += n
                n_docs += 1
            got = rows[(source, b)]
            assert got.n_docs == n_docs
            assert got.n_tokens == cum
            assert got.waste == b - cum
            assert got.n_overflow_docs == len(docs) - n_docs
            assert abs(got.waste_ratio - (b - cum) / b) <= 1e-6
    assert len(rows) == len(per_source) * len(_HEAPS_BUDGETS)


def test_lang_confusion_partitions_and_scalar_reference(spark, sf_dir):
    """The confusion matrix partitions the corpus (cell counts sum to the
    doc count, shares sum to 1 per actual lang) and matches a scalar
    re-run of the lang_id_heuristic argmax."""
    from mapreduce_infrastructure_spark.llm.text import (
        _LANG_MARKERS,
        doc_lang_confusion,
    )

    rows = doc_lang_confusion(spark, sf_dir).collect()
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    ).to_pydict()
    expect: dict[tuple[str, str], int] = {}
    for lang, text in zip(tbl["lang"], tbl["text"]):
        toks = _tokens(text)
        c = {k: sum(1 for t in toks if t in set(v)) for k, v in _LANG_MARKERS.items()}
        if c["en"] >= c["tech"] and c["en"] >= c["sql"]:
            pred = "en"
        elif c["tech"] >= c["sql"]:
            pred = "tech"
        else:
            pred = "sql"
        expect[(lang, pred)] = expect.get((lang, pred), 0) + 1
    assert {(r.actual_lang, r.predicted): r.n_docs for r in rows} == expect
    assert sum(r.n_docs for r in rows) == len(tbl["lang"])
    by_actual: dict[str, float] = {}
    for r in rows:
        assert abs(r.share_of_actual - r.n_docs / r.n_actual) <= 1e-6
        by_actual[r.actual_lang] = by_actual.get(r.actual_lang, 0.0) + r.share_of_actual
    for lang, s in by_actual.items():
        assert abs(s - 1.0) <= 1e-5, (lang, s)


def test_dup_histogram_and_dup_mass_on_duplicated_corpus(spark, sf_dir, tmp_path):
    """The fixture corpus has no exact duplicates (histogram = one
    singleton row), so exercise the duplicate path on a synthetic corpus:
    the fixture plus byte-identical copies of its first 10 docs under new
    doc_ids. The histogram must show exactly ten 2-clusters and
    source_dup_mass must attribute exactly the copies' token mass."""
    import pyarrow as pa

    from mapreduce_infrastructure_spark.llm.dedup import (
        dup_cluster_size_histogram,
        source_dup_mass,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    d = tbl.to_pydict()
    n = len(d["doc_id"])
    assert len(set(d["text"])) == n, "fixture gained duplicate texts; update test"
    max_id = max(d["doc_id"])
    dup = {k: list(v[:10]) for k, v in d.items()}
    dup["doc_id"] = [max_id + 1 + i for i in range(10)]
    merged = {k: list(d[k]) + dup[k] for k in d}
    out = tmp_path / "dupfix"
    out.mkdir()
    pq.write_table(pa.table(merged, schema=tbl.schema), out / "documents.parquet")

    hist = {r.cluster_size: r for r in dup_cluster_size_histogram(spark, str(out)).collect()}
    assert set(hist) == {1, 2}
    assert hist[2].n_clusters == 10 and hist[2].n_docs == 20
    assert hist[1].n_clusters == n - 10
    assert abs(sum(r.share_of_docs for r in hist.values()) - 1.0) <= 1e-5

    mass = {r.source: r for r in source_dup_mass(spark, str(out)).collect()}
    expect_dup: dict[str, int] = {}
    for src, text in zip(dup["source"], dup["text"]):
        expect_dup[src] = expect_dup.get(src, 0) + len(_tokens(text))
    for src, r in mass.items():
        assert r.dup_tokens == expect_dup.get(src, 0), src
    assert sum(r.n_docs for r in mass.values()) == n + 10


def test_novelty_trend_pools_per_doc_novelty(spark, sf_dir):
    """The quartiled trend must equal the per-doc novelty query pooled
    through a scalar ntile(4) (first n%4 buckets get the extra doc), and
    each (source, quartile) rate is the pooled Σnovel/Σgrams."""
    from mapreduce_infrastructure_spark.llm.dedup import (
        ngram_novelty_ratio,
        source_novelty_trend,
    )

    per_doc = {r.doc_id: r for r in ngram_novelty_ratio(spark, sf_dir).collect()}
    meta = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pydict()
    src_of = dict(zip(meta["doc_id"], meta["source"]))
    by_source: dict[str, list[int]] = {}
    for doc_id in sorted(per_doc):
        by_source.setdefault(src_of[doc_id], []).append(doc_id)
    expect: dict[tuple[str, int], list[int]] = {}
    for source, ids in by_source.items():
        n = len(ids)
        base, extra = divmod(n, 4)
        i = 0
        for qt in range(1, 5):
            size = base + (1 if qt <= extra else 0)
            for doc_id in ids[i : i + size]:
                expect.setdefault((source, qt), [0, 0, 0])
                expect[(source, qt)][0] += 1
                expect[(source, qt)][1] += per_doc[doc_id].n_grams
                expect[(source, qt)][2] += per_doc[doc_id].n_novel
            i += size
    rows = {(r.source, r.quartile): r for r in source_novelty_trend(spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    for key, (n_docs, n_grams, n_novel) in expect.items():
        got = rows[key]
        assert (got.n_docs, got.n_grams, got.n_novel) == (n_docs, n_grams, n_novel)
        assert abs(got.novelty_rate - n_novel / n_grams) <= 1e-6


def test_quality_flag_transition_partitions_corpus(spark, sf_dir):
    """The joint (flag × predicted) table partitions each source (shares
    sum to 1, counts sum to the source doc count) and matches a scalar
    composition of the two classifier rules."""
    from mapreduce_infrastructure_spark.llm.text import (
        _LANG_MARKERS,
        quality_flag_transition_by_source,
    )

    rows = quality_flag_transition_by_source(spark, sf_dir).collect()
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    expect: dict[tuple[str, str, str], int] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        toks = _tokens(text)
        n = len(toks)
        n_stop = sum(1 for t in toks if t in ("the", "a"))
        flag = "ok" if (n >= 20 and n_stop * 2 <= n) else "low"
        c = {k: sum(1 for t in toks if t in set(v)) for k, v in _LANG_MARKERS.items()}
        if c["en"] >= c["tech"] and c["en"] >= c["sql"]:
            pred = "en"
        elif c["tech"] >= c["sql"]:
            pred = "tech"
        else:
            pred = "sql"
        expect[(source, flag, pred)] = expect.get((source, flag, pred), 0) + 1
    assert {
        (r.source, r.quality_flag, r.predicted): r.n_docs for r in rows
    } == expect
    shares: dict[str, float] = {}
    for r in rows:
        shares[r.source] = shares.get(r.source, 0.0) + r.share_of_source
    for source, s in shares.items():
        assert abs(s - 1.0) <= 1e-5, (source, s)


def test_bpe_trainer_releases_all_persisted_frames(spark, sf_dir):
    """The BPE trainer's per-merge-step persists are function-local (the
    returned rules frame is driver-built), so two invocations must leave
    ZERO additional cached tables behind — the round-7 leak was
    BPE_MERGES-1 vocab-sized cached frames per call."""
    from mapreduce_infrastructure_spark.llm.text import bpe_learn_merges

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    r1 = bpe_learn_merges(spark, sf_dir).collect()
    r2 = bpe_learn_merges(spark, sf_dir).collect()
    after = jsc.getPersistentRDDs().size()
    assert after == before, (before, after)
    assert r1 == r2 and len(r1) >= 3


def test_idf_weighted_novelty_scalar_reference(spark, sf_dir):
    """IDF-weighted novelty matches a scalar recomputation: exact gram
    counts, IDF masses to 1e-6, ratio in [0, 1] (or NULL when the doc has
    zero IDF mass). The Python recomputation accumulates in a different
    order than both engines, so agreement doubles as the rounding-margin
    audit for this ln-sum."""
    from mapreduce_infrastructure_spark.llm.dedup import ngram_idf_weighted_novelty

    rows = {r.doc_id: r for r in ngram_idf_weighted_novelty(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    n_docs = len(tbl["doc_id"])
    shingles = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        toks = _tokens(text)
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if sh:
            shingles[doc_id] = sh
    first: dict[str, int] = {}
    df: dict[str, int] = {}
    for doc_id in sorted(shingles):
        for g in shingles[doc_id]:
            first.setdefault(g, doc_id)
            df[g] = df.get(g, 0) + 1
    assert set(rows) == set(shingles)
    for doc_id, sh in shingles.items():
        got = rows[doc_id]
        total = sum(math.log(n_docs / df[g]) for g in sh)
        novel = sum(
            math.log(n_docs / df[g]) for g in sh if first[g] == doc_id
        )
        assert got.n_grams == len(sh)
        assert abs(got.idf_mass - total) <= 2e-6
        assert abs(got.novel_idf_mass - novel) <= 2e-6
        if total == 0.0:
            assert got.weighted_novelty is None
        else:
            assert 0.0 <= got.weighted_novelty <= 1.0
            assert abs(got.weighted_novelty - novel / total) <= 2e-6
            # No fixture value may sit so close to a rounding boundary
            # that the ~1e-13 cross-engine sum-order divergence could
            # flip the rounded output (100× headroom; the min margin over
            # ~500 uniform values is expected around 1e-9, so the bound
            # must sit well below that).
            assert _boundary_margin(novel / total) > 1e-11


def test_source_pair_jaccard_scalar_reference(spark, sf_dir):
    """Every unordered source pair appears exactly once (s1 < s2), sizes
    and intersections are exact set arithmetic, Jaccard ∈ [0, 1]."""
    from mapreduce_infrastructure_spark.llm.text import source_pair_jaccard

    rows = {(r.s1, r.s2): r for r in source_pair_jaccard(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    vocab: dict[str, set] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        vocab.setdefault(source, set()).update(_tokens(text))
    sources = sorted(vocab)
    expected_pairs = {
        (a, b) for i, a in enumerate(sources) for b in sources[i + 1 :]
    }
    assert set(rows) == expected_pairs
    for (a, b), r in rows.items():
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        assert r.v1 == len(vocab[a]) and r.v2 == len(vocab[b])
        assert r.n_inter == inter
        assert 0.0 <= r.jaccard <= 1.0
        assert abs(r.jaccard - inter / union) <= 1e-6


def test_bigram_cond_entropy_scalar_reference_and_bounds(spark, sf_dir):
    """H(next|current) matches a scalar recomputation to 1e-6 and sits in
    [0, ln(n_bigrams)]; docs with <2 tokens produce no row. The scalar
    sum uses a different accumulation order than both engines — the
    margin audit for this ln-sum."""
    from collections import Counter as _C

    from mapreduce_infrastructure_spark.llm.text import doc_bigram_cond_entropy

    rows = {r.doc_id: r for r in doc_bigram_cond_entropy(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    expected = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        toks = _tokens(text)
        if len(toks) < 2:
            continue
        cxy = _C(zip(toks, toks[1:]))
        cx = _C(toks[:-1])
        n = len(toks) - 1
        h = -sum(
            c * math.log(c / cx[x]) for (x, _y), c in cxy.items()
        ) / n
        expected[doc_id] = (n, h)
    assert set(rows) == set(expected)
    for doc_id, (n, h) in expected.items():
        got = rows[doc_id]
        assert got.n_bigrams == n
        assert -1e-12 <= got.cond_entropy <= math.log(n) + 1e-6
        assert abs(got.cond_entropy - h) <= 2e-6


def test_source_vocab_gini_matches_textbook_rank_formula(spark, sf_dir):
    """The histogram-block Gini must equal the textbook sorted-rank
    formula (2·Σ i·c_i)/(n·Σ c_i) − (n+1)/n computed by actually sorting
    the vocabulary — proving the tie-block shortcut is exact, not an
    approximation — and sit in [0, 1)."""
    from collections import Counter as _C

    from mapreduce_infrastructure_spark.llm.text import source_vocab_gini

    rows = {r.source: r for r in source_vocab_gini(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    counts: dict[str, _C] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        counts.setdefault(source, _C()).update(_tokens(text))
    counts = {s: c for s, c in counts.items() if c}
    assert set(rows) == set(counts)
    for source, c in counts.items():
        ordered = sorted(c.values())  # any tiebreak: ranks of ties commute
        n = len(ordered)
        t = sum(ordered)
        s_rank = sum(i * ci for i, ci in enumerate(ordered, start=1))
        gini = 2.0 * s_rank / (n * t) - (n + 1.0) / n
        got = rows[source]
        assert got.n_terms == n and got.total_tokens == t
        assert 0.0 <= got.gini < 1.0
        assert abs(got.gini - gini) <= 1e-6


def test_doc_repeated_ngram_ratio_scalar_reference(spark, sf_dir):
    """Repeated-gram mass matches a scalar positional recomputation
    exactly (integer counts) and the ratio to 1e-6; a synthetic
    paragraph-stamped doc scores near 1."""
    from collections import Counter as _C

    from mapreduce_infrastructure_spark.llm.dedup import doc_repeated_ngram_ratio

    rows = {r.doc_id: r for r in doc_repeated_ngram_ratio(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    expected = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        toks = _tokens(text)
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if grams:
            c = _C(grams)
            rep = sum(v for v in c.values() if v >= 2)
            expected[doc_id] = (len(grams), rep)
    assert set(rows) == set(expected)
    for doc_id, (n, rep) in expected.items():
        got = rows[doc_id]
        assert got.n_grams == n and got.repeated_mass == rep
        assert abs(got.repeated_ratio - rep / n) <= 1e-6


def test_cross_source_dup_matrix_zero_fixture_and_duplicated_corpus(
    spark, sf_dir, tmp_path
):
    """The fixture has no exact dups, so the full grid must be all-zero
    with a stable |sources|(|sources|+1)/2 shape; a synthetic corpus with
    planted cross- and within-source copies must count pairs exactly
    (c1·c2 off-diagonal, c·(c−1)/2 on it)."""
    from mapreduce_infrastructure_spark.llm.dedup import cross_source_dup_matrix

    rows = cross_source_dup_matrix(spark, sf_dir).collect()
    n_sources = len({r.s1 for r in rows} | {r.s2 for r in rows})
    assert len(rows) == n_sources * (n_sources + 1) // 2
    assert all(r.n_dup_pairs == 0 for r in rows)
    assert all(r.s1 <= r.s2 for r in rows)

    sf = str(tmp_path)
    rows_in = []
    # "same" appears 2x in A, 3x in B -> A-B 6 pairs, A-A 1, B-B 3;
    # "only_b" appears 2x in B -> B-B +1; unique texts contribute 0.
    for i, (text, src) in enumerate(
        [("same", "A"), ("same", "A"), ("same", "B"), ("same", "B"),
         ("same", "B"), ("only b", "B"), ("only b", "B"), ("uniq one", "A"),
         ("uniq two", "C")]
    ):
        rows_in.append((i, text, "en", src, len(text)))
    spark.createDataFrame(
        rows_in,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {(r.s1, r.s2): r.n_dup_pairs for r in cross_source_dup_matrix(spark, sf).collect()}
    assert got == {
        ("A", "A"): 1, ("A", "B"): 6, ("A", "C"): 0,
        ("B", "B"): 3 + 1, ("B", "C"): 0, ("C", "C"): 0,
    }


def test_source_quality_trend_pools_quality_flags(spark, sf_dir):
    """Each (source, quartile) cell matches a scalar ntile recomputation;
    quartile doc counts partition the source and n_ok sums to the
    source's quality_scores 'ok' total."""
    from mapreduce_infrastructure_spark.llm.text import (
        quality_scores,
        source_quality_trend,
    )

    rows = {
        (r.source, r.quartile): r
        for r in source_quality_trend(spark, sf_dir).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    per_source: dict[str, list] = {}
    for doc_id, source, text in zip(tbl["doc_id"], tbl["source"], tbl["text"]):
        toks = _tokens(text)
        ok = int(len(toks) >= 20 and 2 * sum(1 for t in toks if t in ("the", "a")) <= len(toks))
        per_source.setdefault(source, []).append((doc_id, ok))
    expected = {}
    for source, docs in per_source.items():
        docs.sort()
        n = len(docs)
        # ntile(4): first (n % 4) buckets get ceil(n/4), rest floor(n/4)
        base, extra = divmod(n, 4)
        idx = 0
        for q in range(1, 5):
            size = base + (1 if q <= extra else 0)
            chunk = docs[idx : idx + size]
            idx += size
            if chunk:
                expected[(source, q)] = (len(chunk), sum(ok for _, ok in chunk))
    assert set(rows) == set(expected)
    flags = {
        r.doc_id: r.quality_flag for r in quality_scores(spark, sf_dir).collect()
    }
    ok_by_source: dict[str, int] = {}
    for doc_id, source in zip(tbl["doc_id"], tbl["source"]):
        ok_by_source[source] = ok_by_source.get(source, 0) + (
            flags[doc_id] == "ok"
        )
    for (source, q), (n_docs, n_ok) in expected.items():
        got = rows[(source, q)]
        assert got.n_docs == n_docs and got.n_ok == n_ok
        assert abs(got.ok_share - n_ok / n_docs) <= 1e-6
    for source, total_ok in ok_by_source.items():
        assert total_ok == sum(
            r.n_ok for (s, _q), r in rows.items() if s == source
        )


def test_gram_incidence_is_shared_across_consumers(spark, sf_dir):
    """The novelty tier's (doc, gram) incidence must be get-or-create:
    the second consumer receives the SAME persisted frame, not a fresh
    cold plan re-registered under the slot (the round-8 review finding —
    tracked_persist would unpersist the materialized copy and force
    every consumer to recompute the corpus-scale explode)."""
    from mapreduce_infrastructure_spark.llm.dedup import _gram_incidence

    a = _gram_incidence(spark, sf_dir)
    b = _gram_incidence(spark, sf_dir)
    assert a is b
    assert a.storageLevel.useMemory or a.storageLevel.useDisk


def test_bpe_trainer_degrades_gracefully_when_vocab_collapses(spark, tmp_path):
    """Regression (round-8 review): a corpus whose only multi-char word is
    exhausted after one merge must return the rules learned so far —
    matching the oracle's LIMIT-1-of-empty behavior — not crash on an
    empty argmax, and must still leave zero persisted frames behind."""
    from mapreduce_infrastructure_spark.llm.text import bpe_learn_merges

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, "ab ab ab", "en", "s", 8) for i in range(5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    rules = bpe_learn_merges(spark, sf).collect()
    after = jsc.getPersistentRDDs().size()
    assert [(r.step, r.p1, r.p2) for r in rules] == [(1, "a", "b")]
    assert after == before


def test_bigram_lm_logloss_scalar_reference(spark, sf_dir):
    """Per-doc bigram-LM logloss matches a scalar-Python recomputation of
    the add-one-smoothed corpus model to the 1e-6 rounding, exactly the
    ≥2-token docs are covered, and each loss is positive (every smoothed
    probability is < 1 whenever V ≥ 2)."""
    from mapreduce_infrastructure_spark.llm.text import ngram_lm_bigram_logloss

    rows = {r.doc_id: r for r in ngram_lm_bigram_logloss(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    doc_toks = {d: _tokens(t) for d, t in zip(tbl["doc_id"], tbl["text"])}
    cxy: Counter = Counter()
    vocab = set()
    for toks in doc_toks.values():
        vocab.update(toks)
        cxy.update(zip(toks, toks[1:]))
    cx: Counter = Counter()
    for (x, _), c in cxy.items():
        cx[x] += c
    v = len(vocab)
    assert set(rows) == {d for d, t in doc_toks.items() if len(t) >= 2}
    for doc_id, toks in list(doc_toks.items())[:40]:
        if len(toks) < 2:
            continue
        bg = list(zip(toks, toks[1:]))
        ll = -sum(
            math.log((cxy[p] + 1) / (cx[p[0]] + v)) for p in bg
        ) / len(bg)
        got = rows[doc_id]
        assert got.n_bigrams == len(bg)
        assert got.logloss_nats > 0
        assert abs(got.logloss_nats - ll) <= 2e-6, (doc_id, got.logloss_nats, ll)


def test_source_char_class_profile_partitions_and_scalar_reference(spark, sf_dir):
    """Character classes partition every source's char mass exactly
    (alpha + digit + space + other = n_chars), and counts plus shares
    match a scalar-Python recomputation."""
    from mapreduce_infrastructure_spark.llm.text import source_char_class_profile

    rows = {
        r.source: r for r in source_char_class_profile(spark, sf_dir).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    expect: dict[str, list[int]] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        e = expect.setdefault(source, [0, 0, 0, 0, 0])  # docs,n,alpha,digit,space
        e[0] += 1
        e[1] += len(text)
        e[2] += sum(1 for ch in text if ch.isascii() and ch.isalpha())
        e[3] += sum(1 for ch in text if ch.isascii() and ch.isdigit())
        e[4] += sum(1 for ch in text if ch in " \t\n\r")
    assert set(rows) == set(expect)
    for source, (nd, n, a, d, sp) in expect.items():
        got = rows[source]
        assert (got.n_docs, got.n_chars, got.alpha_chars) == (nd, n, a)
        assert (got.digit_chars, got.space_chars) == (d, sp)
        assert got.other_chars == n - a - d - sp
        assert (
            got.alpha_chars
            + got.digit_chars
            + got.space_chars
            + got.other_chars
            == got.n_chars
        )
        if n:
            assert abs(got.alpha_share - a / n) <= 2e-6
            assert abs(got.digit_share - d / n) <= 2e-6
            assert abs(got.symbol_share - (n - a - d - sp) / n) <= 2e-6


def test_source_zipf_alpha_mle_scalar_reference(spark, sf_dir):
    """The histogram-folded CSN estimator matches a per-term scalar
    recomputation alpha = 1 + N / Σ ln(2c) (proving the count-value
    histogram shortcut is exact), and alpha > 1 always (the MLE's
    admissible range for x_min = 1)."""
    from collections import Counter as _C

    from mapreduce_infrastructure_spark.llm.text import source_zipf_alpha_mle

    rows = {r.source: r for r in source_zipf_alpha_mle(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    counts: dict[str, _C] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        counts.setdefault(source, _C()).update(_tokens(text))
    counts = {s: c for s, c in counts.items() if c}
    assert set(rows) == set(counts)
    for source, c in counts.items():
        n = len(c)
        alpha = 1.0 + n / sum(math.log(2.0 * ci) for ci in c.values())
        got = rows[source]
        assert got.n_terms == n and got.total_tokens == sum(c.values())
        assert got.zipf_alpha > 1.0
        assert abs(got.zipf_alpha - alpha) <= 2e-6, (source, got.zipf_alpha, alpha)


def test_source_bigram_jsd_bounds_and_scalar_reference(spark, sf_dir):
    """0 ≤ JSD ≤ ln 2 per source (Lin's bound), bigram totals partition
    the corpus bigram count, and each divergence matches a scalar
    recomputation of the truncated-support identity to the 1e-6
    rounding."""
    from mapreduce_infrastructure_spark.llm.text import source_bigram_js_divergence

    rows = {
        r.source: r for r in source_bigram_js_divergence(spark, sf_dir).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    per_source: dict[str, Counter] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        toks = _tokens(text)
        per_source.setdefault(source, Counter()).update(zip(toks, toks[1:]))
    per_source = {s: c for s, c in per_source.items() if c}
    corpus: Counter = Counter()
    for c in per_source.values():
        corpus.update(c)
    g_total = sum(corpus.values())
    assert set(rows) == set(per_source)
    assert sum(r.n_bigrams for r in rows.values()) == g_total
    ln2 = math.log(2.0)
    for source, counts in per_source.items():
        c_s = sum(counts.values())
        inside = q_mass = 0.0
        for bg, c in counts.items():
            p = c / c_s
            q = corpus[bg] / g_total
            inside += p * math.log(2 * p / (p + q)) + q * math.log(
                2 * q / (p + q)
            )
            q_mass += q
        jsd = 0.5 * inside + 0.5 * ln2 * (1.0 - q_mass)
        got = rows[source]
        assert got.n_bigrams == c_s
        assert -1e-9 <= got.jsd_nats <= ln2 + 1e-9
        assert abs(got.jsd_nats - jsd) <= 2e-6, (source, got.jsd_nats, jsd)


def test_doc_length_percentile_scalar_reference(spark, sf_dir):
    """Every document gets exactly one row; within each source the
    percentile matches the (rank-1)/(n-1) of the (n_tokens, doc_id)
    sort, the shortest doc sits at 0 and the longest at 1."""
    from mapreduce_infrastructure_spark.llm.text import (
        doc_length_percentile_by_source,
    )

    rows = {
        r.doc_id: r
        for r in doc_length_percentile_by_source(spark, sf_dir).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    assert set(rows) == set(tbl["doc_id"])
    per_source: dict[str, list] = {}
    for doc_id, source, text in zip(tbl["doc_id"], tbl["source"], tbl["text"]):
        per_source.setdefault(source, []).append((len(_tokens(text)), doc_id))
    for source, docs in per_source.items():
        docs.sort()
        n = len(docs)
        for i, (n_tokens, doc_id) in enumerate(docs):
            got = rows[doc_id]
            expect = 0.0 if n == 1 else i / (n - 1)
            assert got.source == source and got.n_tokens == n_tokens
            assert abs(got.length_pct - expect) <= 2e-6, (doc_id, got.length_pct)
        assert rows[docs[0][1]].length_pct == 0.0
        if n > 1:
            assert rows[docs[-1][1]].length_pct == 1.0


def test_source_length_lognormal_scalar_reference(spark, sf_dir):
    """(μ, σ, median) match a scalar recomputation over ln token counts
    (population MLE, zero-token docs excluded), σ ≥ 0, and the median
    estimate is exp(μ)."""
    from mapreduce_infrastructure_spark.llm.text import source_length_lognormal_fit

    rows = {r.source: r for r in source_length_lognormal_fit(spark, sf_dir).collect()}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    lens: dict[str, list] = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        n = len(_tokens(text))
        if n >= 1:
            lens.setdefault(source, []).append(math.log(n))
    assert set(rows) == set(lens)
    for source, ls in lens.items():
        n = len(ls)
        mu = sum(ls) / n
        var = sum(l * l for l in ls) / n - mu * mu
        got = rows[source]
        assert got.n_docs == n
        assert got.sigma_log >= 0.0
        assert abs(got.mu_log - mu) <= 2e-6
        assert abs(got.sigma_log - math.sqrt(max(var, 0.0))) <= 2e-6
        assert abs(got.median_est - math.exp(mu)) <= max(2e-6, 1e-5 * math.exp(mu))


def test_tokenizer_cross_engine_parity_and_dotted_i_premise(spark, sf_dir):
    """The tokenizer premise behind every text-operator oracle: Spark's
    lower()+split and DuckDB's lower()+regexp_split agree on an
    adversarial battery spanning accents, fullwidth forms, CJK,
    ligatures, titlecase digraphs, Greek final sigma, and sharp s. The
    ONE known divergence — Turkish dotted capital İ (U+0130): Java
    lowercases to i + combining dot U+0307 (a delimiter → extra split),
    DuckDB to plain i — is pinned as a divergence, and the fixture
    corpus is asserted free of it (it is pure ASCII), which is what
    keeps the differential gate sound."""
    import duckdb

    from mapreduce_infrastructure_spark.llm.text import TOKEN_DELIM, tokens_col

    battery = [
        "héllo wörld 123",
        "naïve café",
        "ＡＢＣ ab",          # fullwidth: lowercases outside [a-z], dropped
        "日本語 abc",
        "a_b-c.d e|f",
        "ß STRASSE",          # sharp s / uppercase mapping
        "ΣΙΣΥΦΟΣ σ",          # final-sigma mapping
        "ǅungla ǲoo",         # titlecase digraphs
        "ﬁle ﬂow",            # ligatures
        "",
        "   ",
        "0x1F 2e10 a1b2c3",
    ]
    df = spark.createDataFrame([(c,) for c in battery], "text string")
    got_spark = [r[0] for r in df.select(tokens_col().alias("t")).collect()]
    for text, sp in zip(battery, got_spark):
        dk = duckdb.sql(
            f"select list_filter(regexp_split_to_array(lower(?), "
            f"'{TOKEN_DELIM}'), x -> x <> '')",
            params=[text],
        ).fetchone()[0]
        assert sp == dk, (text, sp, dk)

    # The known divergence, pinned AS a divergence (if an engine upgrade
    # ever aligns them, this assert says the premise comment can go).
    [sp] = [
        r[0]
        for r in spark.createDataFrame([("İstanbul",)], "text string")
        .select(tokens_col().alias("t"))
        .collect()
    ]
    dk = duckdb.sql(
        f"select list_filter(regexp_split_to_array(lower('İstanbul'), "
        f"'{TOKEN_DELIM}'), x -> x <> '')"
    ).fetchone()[0]
    assert sp == ["i", "stanbul"] and dk == ["istanbul"], (sp, dk)

    # Fixture premise: the corpus is pure ASCII, so the divergence can
    # never reach the differential gate on these fixtures.
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).to_pydict()
    assert all(t.isascii() for t in tbl["text"])


def test_fingerprint_and_epoch_cross_engine_parity(spark):
    """Companion premises to the tokenizer pin: (1) Spark's
    md5(cast-to-binary), DuckDB's md5(VARCHAR), and Python's
    md5-of-UTF-8 agree on every script probed INCLUDING the characters
    the tokenizer diverges on (fingerprints hash raw bytes — no case
    mapping involved); (2) unix_micros and epoch_us agree on pre-1970
    and epoch-boundary timestamps (negative microseconds included), the
    premise behind every integer time-bucket oracle."""
    import hashlib

    import duckdb

    from pyspark.sql import functions as F

    cases = ["héllo", "日本語", "ß", "İ", "a b", "emoji \U0001F600"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {
        r.t: r.h
        for r in df.select(
            "t", F.md5(F.col("t").cast("binary")).alias("h")
        ).collect()
    }
    for t in cases:
        d = duckdb.sql("select md5(?)", params=[t]).fetchone()[0]
        assert got[t] == d == hashlib.md5(t.encode()).hexdigest(), t

    stamps = ["1965-03-02 12:34:56.789123", "1969-12-31 23:59:59.999999"]
    df2 = spark.createDataFrame([(s,) for s in stamps], "s string")
    sp = [
        r.us
        for r in df2.select(
            F.unix_micros(F.col("s").cast("timestamp")).alias("us")
        ).collect()
    ]
    for s, us in zip(stamps, sp):
        d = duckdb.sql(
            "select epoch_us(CAST(? AS TIMESTAMP))", params=[s]
        ).fetchone()[0]
        assert us == d, (s, us, d)
    assert sp[1] == -1  # epoch boundary: last pre-epoch microsecond


def test_rnd_floor_rounding_cross_engine_parity(spark):
    """The convention-free rounding floor(x·10⁶+0.5)/10⁶ that every
    oracle output shares must be bit-identical between engines for
    arbitrary doubles — seeded random values across magnitudes plus the
    half-boundary and sign edge cases where engines' round() conventions
    differ. Pure IEEE arithmetic has one correct answer; this pins that
    both engines give it."""
    import numpy as np
    import duckdb

    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.functions.exact import rnd

    rng = np.random.default_rng(1234)
    vals = list(
        np.concatenate(
            [
                rng.uniform(-1, 1, 40),
                rng.uniform(-1e6, 1e6, 30),
                rng.uniform(-1e-6, 1e-6, 20),
            ]
        )
    ) + [0.0, -0.0, 0.1234565, -0.1234565, 2.5e-6, -2.5e-6, 1.9999995]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = [r.y for r in df.select(rnd(F.col("x"), 6).alias("y")).collect()]
    for v, g in zip(vals, got):
        d = duckdb.sql(
            "select floor(? * 1000000 + 0.5) / 1000000", params=[float(v)]
        ).fetchone()[0]
        assert g == d, (v, g, d)


def test_doc_token_concentration_scalar_reference(spark, sf_dir):
    """Python recount of the per-source token-mass concentration: same
    wordcount tokenize convention (split on [^a-z0-9]+, drop empties),
    same percentile_disc p90 rank max(1, ceil(0.9*n)), same >= threshold
    membership, same one-division share. Plus the tail-dominance law:
    top_token_share >= n_top / n_docs (top-decile docs are the longest)."""
    import math
    import re

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.llm.text import (
        doc_token_concentration_by_source,
    )

    got = {
        r.source: r
        for r in doc_token_concentration_by_source(spark, sf_dir).collect()
    }
    d = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    counts = {}
    for s, t in zip(d["source"], d["text"]):
        n = sum(1 for tok in re.split(r"[^a-z0-9]+", t.lower()) if tok)
        counts.setdefault(s, []).append(n)
    assert set(got) == set(counts)
    for s, vs in counts.items():
        vs.sort()
        n = len(vs)
        th = vs[max(1, math.ceil(0.9 * n)) - 1]
        top = [v for v in vs if v >= th]
        r = got[s]
        assert r.n_docs == n
        assert r.threshold_tokens == th
        assert r.n_top == len(top)
        assert r.top_tokens == sum(top)
        assert r.top_token_share == sum(top) / sum(vs)
        assert r.top_token_share >= r.n_top / r.n_docs


def test_doc_len_quality_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the length×quality interaction matrix: same
    tokenize and flag rules, thresholds via the same cume_dist ≥ q
    selection (min value whose cum/n reaches q, the hist_disc_percentile
    form — python float division IS the same IEEE divide), same
    value-based decile assignment and one-division shares."""
    from mapreduce_infrastructure_spark.llm.text import (
        doc_length_vs_quality_interaction_matrix,
    )

    got = {
        (r.token_decile, r.quality_flag): r
        for r in doc_length_vs_quality_interaction_matrix(
            spark, sf_dir
        ).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pydict()
    docs = []
    for text in tbl["text"]:
        toks = _tokens(text)
        n_stop = sum(1 for t in toks if t in ("the", "a"))
        flag = (
            "ok"
            if len(toks) >= 20 and n_stop * 2 <= len(toks)
            else "low"
        )
        docs.append((len(toks), flag))
    vals = sorted(n for n, _ in docs)
    n = len(vals)
    th = []
    for k in range(1, 10):
        q = k / 10.0
        cum = 0
        pick = None
        for i, v in enumerate(vals):
            cum = i + 1
            # only the last tied row's cum matters; scan to the end of
            # each tie block like the histogram form does.
            if i + 1 < n and vals[i + 1] == v:
                continue
            if cum / n >= q:
                pick = v
                break
        th.append(pick)
    want: dict = {}
    for nt, flag in docs:
        d = 1 + sum(1 for t in th if nt > t)
        want[(d, flag)] = want.get((d, flag), 0) + 1
    row_tot: dict = {}
    for (d, _f), c in want.items():
        row_tot[d] = row_tot.get(d, 0) + c
    assert set(got) == set(want)
    for (d, flag), c in want.items():
        r = got[(d, flag)]
        assert r.n_docs == c
        assert r.decile_total == row_tot[d]
        assert r.row_share == c / row_tot[d]
    assert sum(r.n_docs for r in got.values()) == len(docs)


def test_token_weighted_length_percentiles_scalar_reference(spark, sf_dir):
    """Python recount of the weighted-rank form: per source, w50/w90 are
    the smallest lengths whose tie-inclusive cumulative token-mass share
    reaches q (same IEEE division), p50 the doc-count analogue, and the
    weighted median never precedes the unweighted one."""
    from mapreduce_infrastructure_spark.llm.text import (
        source_token_weighted_length_percentiles,
    )

    got = {
        r.source: r
        for r in source_token_weighted_length_percentiles(
            spark, sf_dir
        ).collect()
    }
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    per_source: dict = {}
    for source, text in zip(tbl["source"], tbl["text"]):
        per_source.setdefault(source, []).append(len(_tokens(text)))
    assert set(got) == set(per_source)

    def pick(vals, weights, q):
        tot = sum(weights)
        cum = 0
        for i, v in enumerate(vals):
            cum += weights[i]
            if i + 1 < len(vals) and vals[i + 1] == v:
                continue
            if cum / tot >= q:
                return v
        return None

    for source, lens in per_source.items():
        lens.sort()
        r = got[source]
        assert r.n_docs == len(lens)
        assert r.total_tokens == sum(lens)
        ones = [1] * len(lens)
        assert r.p50_len == pick(lens, ones, 0.5)
        assert r.w50_len == pick(lens, lens, 0.5)
        assert r.w90_len == pick(lens, lens, 0.9)
        # token mass concentrates in longer docs, so the weighted median
        # cannot precede the unweighted one.
        assert r.w50_len >= r.p50_len


def test_source_quality_flag_share_drift_scalar_reference(spark, sf_dir):
    """Python recount of the half-split flag drift: same median-doc_id
    split (rank ceil(n/2)), same classifier rule, same per-cell shares
    and chi2 terms; half-2 shares partition each source; cells absent
    from half 1 carry NULL n1/chi2."""
    import math

    from mapreduce_infrastructure_spark.llm.text import (
        source_quality_flag_share_drift,
    )

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pydict()
    docs = sorted(zip(tbl["doc_id"], tbl["source"], tbl["text"]))
    mid = docs[max(1, math.ceil(0.5 * len(docs))) - 1][0]
    cells: dict[tuple[int, str, str], int] = {}
    for doc_id, source, text in docs:
        toks = _tokens(text)
        n_stop = sum(1 for t in toks if t in ("the", "a"))
        flag = "ok" if (len(toks) >= 20 and n_stop * 2 <= len(toks)) else "low"
        half = 1 if doc_id <= mid else 2
        cells[(half, source, flag)] = cells.get((half, source, flag), 0) + 1
    s_tot: dict[tuple[int, str], int] = {}
    for (half, source, _flag), n in cells.items():
        s_tot[(half, source)] = s_tot.get((half, source), 0) + n
    rows = {
        (r.source, r.quality_flag): r
        for r in source_quality_flag_share_drift(spark, sf_dir).collect()
    }
    want_keys = {
        (s, f) for (h, s, f) in cells if h == 2
    }
    assert set(rows) == want_keys
    share_sum: dict[str, float] = {}
    for (source, flag), r in rows.items():
        n2 = cells[(2, source, flag)]
        tot2 = s_tot[(2, source)]
        assert r.n2 == n2
        assert r.source_total2 == tot2
        assert r.share2 == n2 / tot2
        share_sum[source] = share_sum.get(source, 0.0) + r.share2
        n1 = cells.get((1, source, flag))
        if n1 is None:
            assert r.n1 is None and r.chi2_term is None
        else:
            assert r.n1 == n1
            e = n1 * tot2 / s_tot[(1, source)]
            assert abs(r.chi2_term - (n2 - e) ** 2 / e) <= 1e-9 * max(
                1.0, abs(r.chi2_term)
            )
    for source, s in share_sum.items():
        assert abs(s - 1.0) <= 1e-9, (source, s)


def test_source_flag_vs_length_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the within-source length-quintile x flag
    matrix: same tokenizer + quality rule, same per-source
    cume_dist>=k/5 thresholds, same strict-greater ladder; flag shares
    partition each (source, quintile) cell."""
    import math
    import re

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.llm.text import (
        source_flag_vs_length_matrix,
    )

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars", "text"]
    )
    rows = list(
        zip(
            tbl["source"].to_pylist(),
            tbl["n_chars"].to_pylist(),
            tbl["text"].to_pylist(),
        )
    )

    def flag(text: str) -> str:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        stop = sum(1 for t in toks if t in ("the", "a"))
        return "ok" if len(toks) >= 20 and stop * 2 <= len(toks) else "low"

    by_src: dict = {}
    for src, nc, text in rows:
        by_src.setdefault(src, []).append((nc, flag(text)))
    cells: dict = {}
    for src, docs in by_src.items():
        lens = sorted(nc for nc, _ in docs)
        n = len(lens)
        th = [
            lens[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)
        ]
        for nc, fl in docs:
            lq = 1 + sum(1 for t in th if nc > t)
            cells[(src, lq, fl)] = cells.get((src, lq, fl), 0) + 1
    cell_tot: dict = {}
    for (src, lq, _fl), c in cells.items():
        cell_tot[(src, lq)] = cell_tot.get((src, lq), 0) + c
    got = {
        (r.source, r.len_quintile, r.quality_flag): r
        for r in source_flag_vs_length_matrix(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for key, c in cells.items():
        r = got[key]
        assert r.n_docs == c
        assert r.cell_total == cell_tot[key[:2]]
        assert r.flag_share == c / cell_tot[key[:2]]


def test_source_length_drift_scalar_reference(spark, sf_dir):
    """Python recount of the half-split length-quintile drift: corpus
    median doc_id split (rank ceil(n/2) over doc_ids), per-source
    WHOLE-CORPUS cume_dist>=k/5 thresholds (both halves on one ruler),
    strict-greater quintile ladder; half-2 cells carry exact counts,
    within-source shares summing to 1, and chi2 terms against the
    half-1 extrapolated expectation (NULL when the quintile is absent
    from half 1)."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.llm.text import source_length_drift

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    rows = list(
        zip(
            tbl["doc_id"].to_pylist(),
            tbl["source"].to_pylist(),
            tbl["n_chars"].to_pylist(),
        )
    )
    ids = sorted(d for d, _, _ in rows)
    mid = ids[max(1, math.ceil(0.5 * len(ids))) - 1]
    by_src: dict = {}
    for _d, src, nc in rows:
        by_src.setdefault(src, []).append(nc)
    th = {}
    for src, lens in by_src.items():
        lens = sorted(lens)
        n = len(lens)
        th[src] = [
            lens[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)
        ]
    cells: dict = {}
    for d, src, nc in rows:
        half = 1 if d <= mid else 2
        lq = 1 + sum(1 for t in th[src] if nc > t)
        cells[(half, src, lq)] = cells.get((half, src, lq), 0) + 1
    s_tot: dict = {}
    for (half, src, _lq), n in cells.items():
        s_tot[(half, src)] = s_tot.get((half, src), 0) + n
    got = {
        (r.source, r.len_quintile): r
        for r in source_length_drift(spark, sf_dir).collect()
    }
    assert set(got) == {(s, q) for (h, s, q) in cells if h == 2}
    share_sum: dict = {}
    for (src, lq), r in got.items():
        n2 = cells[(2, src, lq)]
        tot2 = s_tot[(2, src)]
        assert r.n2 == n2
        assert r.source_total2 == tot2
        assert r.share2 == n2 / tot2
        share_sum[src] = share_sum.get(src, 0.0) + r.share2
        n1 = cells.get((1, src, lq))
        if n1 is None:
            assert r.n1 is None and r.chi2_term is None
        else:
            assert r.n1 == n1
            e = n1 * tot2 / s_tot[(1, src)]
            assert abs(r.chi2_term - (n2 - e) ** 2 / e) <= 1e-9 * max(
                1.0, abs(r.chi2_term)
            )
    for src, s in share_sum.items():
        assert abs(s - 1.0) <= 1e-9, (src, s)
