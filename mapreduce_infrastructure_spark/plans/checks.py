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


def single_partition_squeezes(plan: str) -> list[str]:
    """Lines feeding an ``Exchange SinglePartition`` whose input is NOT
    constant-bounded — the 100 TB scale-killer shape.

    A single-partition exchange routes its whole input through ONE task.
    That is fine when the input is bounded by construction: a scalar
    (grouping-key-free) partial aggregate emits one row per partition
    (``keys=[]`` in the plan), a ``LocalLimit`` emits at most *k* rows per
    partition, and a ``LocalTableScan`` is a literal frame. Anything else —
    a keyed aggregate, a projection, a scan — scales with data volume, so
    the exchange becomes a spill-thrash/OOM at cluster scale even though it
    "runs fine" at test SF (the round-7 q15/q11 finding: an unpartitioned
    window over a dimension-keyed aggregate is invisible at sf0.1 and fatal
    at SF 1e5, because TPC-H dimensions scale with SF).

    Returns the offending child lines (empty list = scale-safe).
    """
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        bounded = (
            "keys=[]" in child  # scalar partial agg: 1 row per partition
            or "LocalLimit" in child  # ≤ k rows per partition
            or "LocalTableScan" in child  # literal frame
        )
        if not bounded:
            bad.append(child.strip())
    return bad


def assert_no_unbounded_single_partition(df: DataFrame) -> None:
    """Assert every single-partition exchange has a constant-bounded input
    (see :func:`single_partition_squeezes`)."""
    plan = explain_str(df, "simple")
    bad = single_partition_squeezes(plan)
    if bad:
        raise AssertionError(
            "single-partition exchange over a volume-scaled input "
            f"(scale-killer): {bad}\nplan:\n{plan}"
        )


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
