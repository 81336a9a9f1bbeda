"""Bounded per-slot persist tracking, shared by the LLM-tier operators.

A query that references an expensive intermediate several times persists
it — but a query function can't unpersist before returning (the caller
hasn't consumed the DataFrame yet). Instead each call site registers its
persisted working set under a (query, sf_dir) slot; re-invoking the same
query unpersists the previous invocation's copy first, so session storage
is bounded at one copy per slot instead of leaking a copy per call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
