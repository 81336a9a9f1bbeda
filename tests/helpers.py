"""Differential-oracle comparison harness (mirrors the driver's check:
row-count + schema + order-insensitive value comparison vs DuckDB)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mapreduce_infrastructure_spark.catalog import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # The driver's value hash is TYPE-sensitive: DuckDB SUM(INTEGER)
        # surfaces as Decimal and hash-mismatches Spark's int64 even though
        # Decimal(2) == 2 in Python (the round-1 failure mode). Refuse to
        # normalize — an oracle whose output column is DECIMAL must CAST it
        # (AS BIGINT / AS DOUBLE) instead.
        raise AssertionError(
            f"Decimal value {v!r} in compared output — cast the oracle "
            "column (CAST(... AS BIGINT/DOUBLE)); the driver's hash "
            "distinguishes Decimal from int/float"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = _normalize(spark_pdf), _normalize(oracle_pdf)
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        assert sr == orow, (
            f"{name}: first differing row #{i}:\n  spark : {sr}\n  oracle: {orow}"
        )


def check_query(spark, sf_dir: str, name: str, fn, oracle: str) -> None:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)


# ---------------------------------------------------------------------------
# Pure-python XXH64 reference (public algorithm, https://xxhash.com spec) —
# the partial oracle for Spark's engine-specific `xxhash64` expression:
# recomputes the exact chained hashes Spark produces for long/int/string
# inputs (Spark chains multi-arg calls through the seed, default seed 42).
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte long — Spark's hash for LongType columns."""
    value &= _M64
    h = (seed + _XXP5 + 8) & _M64
    h ^= (_rotl64((value * _XXP2) & _M64, 31) * _XXP1) & _M64
    h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
    return _xx_fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int — Spark's hash for IntegerType columns."""
    h = (seed + _XXP5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _XXP1) & _M64
    h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
    return _xx_fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string — Spark's hash for StringType
    columns (UTF-8 bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + lane * _XXP2) & _M64
                v = (_rotl64(v, 31) * _XXP1) & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (h * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((lane * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h ^= (lane * _XXP1) & _M64
        h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    return _xx_fmix(h)


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Spark's `xxhash64(...)` for a mix of python ints (hashed as
    LongType), (value, "int") tuples (IntegerType) and strs (StringType
    UTF-8): multi-arg calls CHAIN — each value's hash seeds the next.
    Returns the SIGNED int64 Spark surfaces."""
    h = seed
    for v in values:
        if isinstance(v, tuple) and v[1] == "int":
            h = xxh64_int(v[0], h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        else:
            h = xxh64_long(v, h)
    return _to_i64(h)


def py_minhash_shingles_and_lsh_pairs(sf_dir: str):
    """Pure-python XXH64 re-derivation of `minhash_lsh_pairs` (the
    round-15 partial oracle, verbatim derivation): 3-token shingles of
    the `[^a-z0-9]+` tokenizer (docs with <3 tokens dropped, the
    engine's size(sh)==0 filter), per-doc N_HASHES signature via
    seed-chained xxhash64, band hashes over LSH_ROWS-element signature
    slices, same-(band, hash) candidates under the keep-lowest-doc_ids
    HOT_BAND_CAP, exact-Jaccard verify floor-rounded to 4 decimals
    against VERIFY_THRESHOLD. Returns ``(shingles, lsh_pairs)`` —
    ``doc_id -> frozenset`` and ``(doc_a, doc_b) -> jaccard`` — so the
    report graduations can COMPOSE the proven reference instead of
    re-deriving it."""
    import math
    import re

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.llm import dedup

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    shingles: dict[int, frozenset] = {}
    sigs: dict[int, list] = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]
        if len(toks) < 3:
            continue  # engine filters size(sh) == 0
        sh = frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
        hs = [spark_xxhash64(s) for s in sh]
        sigs[doc_id] = [
            min(spark_xxhash64(h, (s, "int")) for h in hs)
            for s in range(dedup.N_HASHES)
        ]
        shingles[doc_id] = sh
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(dedup.LSH_BANDS):
            bh = spark_xxhash64(
                *sig[b * dedup.LSH_ROWS : (b + 1) * dedup.LSH_ROWS]
            )
            buckets.setdefault((b, bh), []).append(doc_id)
    pairs: dict[tuple[int, int], float] = {}
    for ids in buckets.values():
        ids.sort()
        kept = ids[: dedup.HOT_BAND_CAP]  # keep-lowest cap
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                a, b = kept[i], kept[j]
                if (a, b) in pairs:
                    continue
                inter = len(shingles[a] & shingles[b])
                union = len(shingles[a] | shingles[b])
                jac = math.floor(inter / union * 10000 + 0.5) / 10000
                if jac >= dedup.VERIFY_THRESHOLD:
                    pairs[(a, b)] = jac
    return shingles, pairs
