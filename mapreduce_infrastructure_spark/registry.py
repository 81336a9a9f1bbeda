"""Query registry: the engine's named-query surface.

Mirrors the reference's UDF registry (``src/mr_task_factory.cc:28-88``,
``register_tasks`` in ``external/include/mr_task_factory.h:47-48``) at the
query level: every implemented operator registers a named callable
``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a DuckDB oracle
SQL string used for differential correctness checking.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a named query (and optional oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """All registered queries (importing the operator modules as a side
    effect so their registrations run)."""
    # Import here, not at module top, to avoid circular imports.
    from .operators import relational, analytic, temporal, stats  # noqa: F401
    from .functions import scalar, udfs  # noqa: F401
    from .sources import formats, bucketing, zorder  # noqa: F401
    from .streaming import batch_windows, stream  # noqa: F401
    from .llm import text, dedup, similarity, multimodal  # noqa: F401
    from .mr import queries as mr_queries  # noqa: F401

    return dict(_REGISTRY)
