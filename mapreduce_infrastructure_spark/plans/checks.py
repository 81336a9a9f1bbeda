"""Physical-plan assertions — the engine's scale guardrails.

The reference has no optimizer (SURVEY.md §4); this engine leans on Catalyst
and *verifies* it: tests assert that filters reach the parquet scan, small
dimensions broadcast, and Python stays out of hot paths. At 100 TB these
properties are the difference between a job and an outage.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what .explain() prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate was pushed into the data source scan."""
    plan = explain_str(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert the plan contains a broadcast (map-side) join."""
    plan = explain_str(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join; plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct sneaked into the plan."""
    plan = explain_str(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"unexpected cartesian product; plan:\n{plan}")


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Assert at least one whole-stage-codegen span (JVM-compiled hot path).

    Under AQE the pre-execution plan shows only AdaptiveSparkPlan; executing
    the frame finalizes it so codegen spans become visible."""
    markers = ("WholeStageCodegen", "codegen id")

    def has_codegen(plan: str) -> bool:
        return any(m in plan for m in markers)

    plan = explain_str(df)
    if not has_codegen(plan) and "AdaptiveSparkPlan" in plan:
        df.collect()
        plan = explain_str(df)
    if not has_codegen(plan):
        raise AssertionError(f"expected a whole-stage-codegen span; plan:\n{plan}")
