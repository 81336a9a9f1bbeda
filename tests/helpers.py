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
