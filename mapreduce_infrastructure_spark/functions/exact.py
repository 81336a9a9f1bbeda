"""Exact (order-independent) numeric aggregation helpers.

Summing doubles is order-dependent; Spark and a differential oracle will
disagree in the last ulps because they add in different orders. The engine
therefore aggregates money-like doubles through DECIMAL (exact, associative)
and casts the final result back to DOUBLE — bitwise identical no matter the
partitioning, which also makes results stable across cluster sizes (the same
query at 32 threads and at 1000 executors returns the same bits).

Reference parity note: the reference's only numeric op is the word-count
reducer's integer accumulate (``test/user_tasks.cc:29-33``), which is exact;
this module keeps the new engine's richer aggregates equally deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Enough integer digits for 100 TB-scale sums: DECIMAL(18,2) per-row values
# aggregate into Spark's DECIMAL(28,2)/DuckDB's DECIMAL(38,2) accumulators.
MONEY = "decimal(18,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def rnd(col: Column, ndigits: int = 2) -> Column:
    """Convention-free rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Engine round() conventions differ on half-boundaries (Spark rounds the
    shortest decimal repr HALF_UP; DuckDB/C round the raw binary double), so
    differential checks flake exactly on .xx5 values. This form is pure IEEE
    arithmetic — identical bits in any engine given identical inputs. The
    DuckDB oracle SQL uses the same literal expression.
    """
    p = 10 ** ndigits
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def disc_rev() -> Column:
    """Discounted revenue l_extendedprice·(1−l_discount) as exact DECIMAL —
    THE revenue convention every TPC-H-shaped query and oracle shares (the
    oracle-side twin is the CAST(… AS DECIMAL(18,2)) form). One definition
    so a precision change cannot silently diverge between queries."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def dsum(col: Column | str, alias: str, ndigits: int = 2) -> Column:
    """Exact sum of a 2-decimal double column, returned as rounded DOUBLE."""
    return rnd(F.sum(dec(col)).cast("double"), ndigits).alias(alias)


def davg(col: Column | str, alias: str, ndigits: int = 2) -> Column:
    """Exact-sum / count average as DOUBLE (identical across engines)."""
    return rnd(
        F.sum(dec(col)).cast("double") / F.count(F.lit(1)), ndigits
    ).alias(alias)


def lcount(alias: str) -> Column:
    return F.count(F.lit(1)).alias(alias)
