"""Physical-plan assertions: make the scale-critical plan properties
(pushdown, pruning, join strategy, no Python in the hot path) testable
instead of hoped-for.

At 100 TB the physical plan IS the performance model: a filter that
doesn't reach the parquet scan re-reads the table; a broadcast that
silently becomes a shuffle join doubles the network cost; a Python UDF
in the row path caps throughput at the pickle boundary. These helpers
let tests pin the plan shape so regressions fail loudly at toy scale
rather than silently at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what
    ``df.explain("formatted")`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears inside a PushedFilters list of a
    scan node — i.e. the predicate reaches the parquet reader
    (row-group / page skipping applies)."""
    plan = physical_plan(df)
    pushed_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed_lines, f"no PushedFilters in plan:\n{plan}"
    blob = "\n".join(pushed_lines)
    for frag in fragments:
        assert frag in blob, f"filter {frag!r} not pushed; pushed: {blob}"


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    """Assert at least ``expected`` BroadcastHashJoin nodes — the
    no-shuffle join strategy for small dimensions."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= expected, f"wanted >={expected} BroadcastHashJoin, got {n}:\n{plan}"


def assert_sort_merge_join(df: DataFrame) -> None:
    """Assert a SortMergeJoin is planned — the big⋈big strategy that
    spills gracefully instead of building a hash table in memory."""
    plan = physical_plan(df)
    assert "SortMergeJoin" in plan, f"no SortMergeJoin in plan:\n{plan}"


def assert_no_python_udf(df: DataFrame) -> None:
    """Assert the plan contains no row-at-a-time Python UDF nodes
    (BatchEvalPython); Arrow-batched nodes (ArrowEvalPython /
    MapInPandas) are the sanctioned Python boundary."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, f"row-wise Python UDF in plan:\n{plan}"
