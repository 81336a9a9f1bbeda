"""Bounded per-slot persist tracking, shared by the LLM-tier operators.

A query that references an expensive intermediate several times persists
it — but a query function can't unpersist before returning (the caller
hasn't consumed the DataFrame yet). Instead each call site registers its
persisted working set under a (query, sf_dir) slot; re-invoking the same
query unpersists the previous invocation's copy first, so session storage
is bounded at one copy per slot instead of leaking a copy per call.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[str, DataFrame] = {}


def tracked_persist(df: DataFrame, slot: str) -> DataFrame:
    prev = _CACHE.get(slot)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    _CACHE[slot] = df.persist()
    return _CACHE[slot]


def shared_persist(
    spark: SparkSession, build: Callable[[], DataFrame], slot: str
) -> DataFrame:
    """Get-or-create for slots whose plan is DETERMINISTIC in the slot key
    (e.g. keyed only by sf_dir): return the existing persisted frame when
    present instead of rebuilding it, so several consumer queries in one
    session genuinely share a single cached copy. ``tracked_persist`` is
    wrong for this shape — it unconditionally unpersists the (already
    materialized) previous occupant and re-registers an identical cold
    plan, making every consumer recompute.

    The slot is additionally keyed by the Spark application id so a frame
    built on one session is never handed to another (the hostile-session
    tests run a second session in the same process).
    """
    key = f"{slot}@{spark.sparkContext.applicationId}"
    df = _CACHE.get(key)
    if df is None:
        df = build().persist()
        _CACHE[key] = df
    return df


_VALUES: dict[str, object] = {}


def shared_value(spark: SparkSession, build: Callable[[], object], slot: str):
    """``shared_persist`` for small driver-side values (quantizer fits,
    fit-mode decisions): get-or-create keyed by slot + application id, so
    several consumer queries in one session share one bounded, deterministic
    intermediate instead of re-deriving it per invocation — exactly the
    shingle-table pattern, applied to the k×dim centroid matrices.

    Session-scoped only: the dict dies with the process, so every bench /
    oracle invocation still computes the fit from the parquet inputs.
    Callers must treat the returned value as immutable (it is handed to
    every consumer in the session)."""
    key = f"{slot}@{spark.sparkContext.applicationId}"
    if key not in _VALUES:
        _VALUES[key] = build()
    return _VALUES[key]
