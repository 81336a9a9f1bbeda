"""Physical-plan assertions — the engine's scale guardrails.

The reference has no optimizer (SURVEY.md §4); this engine leans on Catalyst
and *verifies* it: tests assert that filters reach the parquet scan, small
dimensions broadcast, and Python stays out of hot paths. At 100 TB these
properties are the difference between a job and an outage.
"""

from __future__ import annotations

import contextlib
import io
import re

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
            # bucketed_prefix_sum/max's cross-bucket offset pass: the
            # aggregate is keyed by the internal range-bucket id (_psb /
            # _pmb — ranks.py's reserved names), so its row count is
            # bounded by the n_buckets KNOB (strata × 32 by default),
            # never by data volume. Recognizing the shape here keeps
            # every global (no-stratum) prefix caller out of the
            # per-query allowlist.
            or re.search(r"keys=\[_p[sm]b#\d+", child) is not None
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


# Columns whose domain is a fixed small set however large the data grows —
# a window PARTITIONED solely by these keys has at most |domain| tasks, so
# its per-task input scales linearly with data volume (the partitioned
# cousin of the single-partition squeeze: 20 langs ⇒ 20 tasks for the whole
# corpus). Fixture-schema names; extend alongside the test tables.
LOW_CARDINALITY_STRATA = frozenset(
    {
        "source",
        "lang",
        "label",
        "event_type",
        "o_orderpriority",
        "o_orderstatus",
        "l_returnflag",
        "l_linestatus",
        "l_shipmode",
        "r_name",
        "n_name",
        "quartile",
        "status",
        "priority",
    }
)

# Row-identity columns whose distinct count grows with data volume. An
# aggregate KEYED on one of these is row-scale, not histogram-scale, so it
# does NOT bound a downstream low-cardinality window's input.
VOLUME_SCALED_IDS = frozenset(
    {
        "doc_id",
        "vec_id",
        "event_id",
        "user_id",
        "o_orderkey",
        "l_orderkey",
        "c_custkey",
        "s_suppkey",
        "p_partkey",
        "ps_partkey",
        "ps_suppkey",
    }
)

_WINDOW_RE = None  # compiled lazily (module import cost)


def _window_partition_cols(line: str) -> list[str] | None:
    """Parse a simple-mode ``Window [fns], [part_cols], [order]`` line into
    its partition column base names (``source#23`` → ``source``); None if
    the line is not a Window node or has no partition spec."""
    global _WINDOW_RE
    import re

    if _WINDOW_RE is None:
        _WINDOW_RE = re.compile(r"Window \[.*?\], \[([^\]]*)\](, \[|\s*$)")
    if "Window " not in line:
        return None
    m = _WINDOW_RE.search(line)
    if not m or not m.group(1).strip():
        return None
    return [c.strip().split("#")[0] for c in m.group(1).split(",")]


def low_card_stratum_windows(plan: str) -> list[str]:
    """Window nodes partitioned ONLY by low-cardinality stratum columns
    whose input is volume-scaled — each such window routes every row of a
    stratum through ONE task (at 100 TB: ~rows/|strata| rows sorted
    serially per task, zero intra-stratum parallelism). Invisible at test
    SF; this guard reads the shape from the plan.

    A flagged window is EXEMPT when its input is histogram-bounded: walking
    down the plan (skipping other Window/Sort/Exchange/Project/Filter
    nodes), the first aggregate's grouping keys strictly extend the
    window's partition columns with NON-identity columns — the count-value
    histogram form (`functions/ranks.py`, `source_vocab_gini`), whose
    window input is |distinct values| per stratum (value-domain-bounded),
    not |rows|. An aggregate keyed by a volume-scaled id (doc_id, user_id,
    …) is row-scale and does NOT exempt.

    Returns the offending Window lines (empty = scale-safe).
    """
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        cols = _window_partition_cols(ln)
        if cols is None:
            continue
        if not all(c in LOW_CARDINALITY_STRATA for c in cols):
            continue
        # Walk down to the window's input, skipping pass-through nodes.
        bounded = False
        for nxt in lines[i + 1 : i + 12]:
            s = nxt.strip().lstrip("+-: ")
            if not s:
                continue
            if s.startswith(("Window ", "Sort ", "Exchange ", "Project ",
                             "Filter ", "WindowGroupLimit", "ReusedExchange",
                             "AQEShuffleRead", "ShuffleQueryStage",
                             "InputAdapter", "WholeStageCodegen")):
                continue
            if "Aggregate(keys=[" in s:
                keys = [
                    k.strip().split("#")[0]
                    for k in s.split("keys=[", 1)[1].split("]", 1)[0].split(",")
                    if k.strip()
                ]
                extra = [k for k in keys if k not in cols]
                bounded = bool(extra) and not any(
                    k in VOLUME_SCALED_IDS for k in extra
                )
            break
        if not bounded:
            bad.append(ln.strip())
    return bad


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
