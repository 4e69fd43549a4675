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


_STREAMING_QUERIES = {
    "stateful_sessionizer_closed_sessions",
    "stream_static_enrichment",
    "stream_stream_join_purchase_attribution",
    "stream_stream_left_outer_attribution",
    "statestore_open_windows",
    "streaming_city_metrics_replay",
    "streaming_dedup_replay",
    "streaming_jdbc_replay",
    "transform_with_state_running_totals",
}

_HEADER = """# PLANS — physical-plan audit (generated)

Regenerate with
`python -m real_time_ride_hailing_data_pipeline_spark.plans.inspect`.

Per-query plan-shape audit at sf0.001 (plan shapes are scale-independent;
`BroadcastExchange` substrings inflate the raw Exchange count). Invariants
enforced by tests/test_plans.py: no CartesianProduct anywhere, no
row-at-a-time Python UDF (BatchEvalPython) in any transform plan, pushed
filters on the selective scans, BroadcastHashJoin on dim joins,
SortMergeJoin on big-big joins. The only BroadcastNestedLoopJoin nodes
below are *intended* tiny-side broadcasts (the scalar
threshold in tpch_q22; the corpus-stats row in search_bm25_topk;
the one-row token-totals in dsir_importance_resample; the 1-row
probe-set array_contains join in ann_ivf_topk, twice because the
pruned relation feeds both the screen and the refine);
Arrow-batched Python (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
is the sanctioned Python boundary and appears only in the pandas-UDF
queries and the BLAS candidate screens (the embedding-pair per-cell
matmul and, since r12, the top-k family's lossless batch-local top-m
screen — ann_cosine/ann_batch/ann_ivf/ann_lsh all refine through it,
one numpy matmul per Arrow batch, where BLAS beats interpreted SQL
lambda folds by orders of magnitude — the exact-decimal refine stays
JVM-side in every case). Queries that execute a StreamingQuery (or an iterative
fixpoint: dedup_cluster_assignment, dedup_semantic_keep_list) are
audited by their component batch plans and marked below.

| query | Exchange nodes (incl. broadcast) | BNLJ | flags |
|---|---|---|---|
"""


def generate_plans_md(sf_dir: str = "/root/testdata/sf0.001") -> str:
    """Regenerate the PLANS.md table over the full current registry."""
    from real_time_ride_hailing_data_pipeline_spark import queries as q
    from real_time_ride_hailing_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plans", cpus=8, shuffle_partitions=8)
    rows = []
    iterative = {"dedup_cluster_assignment", "dedup_semantic_keep_list"}
    for name, fn in sorted(q.all_queries().items()):
        if name in _STREAMING_QUERIES:
            rows.append(f"| {name} | (streaming — executed, not statically planned) | — | |")
            continue
        if name in iterative:
            rows.append(f"| {name} | (iterative fixpoint — per-round plans audited) | — | |")
            continue
        df = fn(spark, sf_dir)
        plan = physical_plan(df)
        nex = plan.count("Exchange")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PY_UDF")
        rows.append(f"| {name} | {nex} | {bnlj} | {' '.join(flags)} |")
    spark.stop()
    return _HEADER + "\n".join(rows) + "\n"


if __name__ == "__main__":
    import sys

    out = generate_plans_md()
    path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    with open(path, "w") as fh:
        fh.write(out)
    print(f"wrote {path}")
