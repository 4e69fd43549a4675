"""Physical-plan regression tests: pin the scale-critical plan shapes
(pushdown, broadcast, sort-merge, no row-wise Python) so they can't
silently regress. Also covers the spark.sql surface via
catalog.register_views.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark import catalog
from real_time_ride_hailing_data_pipeline_spark import queries as q
from real_time_ride_hailing_data_pipeline_spark.plans import (
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    assert_sort_merge_join,
)

SF = "/root/testdata/sf0.001"


def test_filter_project_pushes_predicates_to_scan(spark):
    df = q.all_queries()["filter_project"](spark, SF)
    assert_pushed_filters(df, "o_orderstatus", "o_totalprice")
    assert_no_python_udf(df)


def test_enrichment_join_broadcasts_both_dims(spark):
    df = q.all_queries()["join_broadcast_enrichment"](spark, SF)
    assert_broadcast_join(df, expected=2)


def test_big_join_is_sort_merge(spark):
    df = q.all_queries()["sort_merge_order_revenue"](spark, SF)
    assert_sort_merge_join(df)


def test_tpch_q3_pushes_filters_and_broadcasts_customer(spark):
    df = q.all_queries()["tpch_q3_shipping_priority"](spark, SF)
    assert_pushed_filters(df, "c_mktsegment", "o_orderdate", "l_shipdate")
    assert_broadcast_join(df, expected=1)


@pytest.mark.slow  # whole-registry sweep (243 s in the r14 baseline:
# building every entry's plan EXECUTES the streaming replays). Slow
# tier via pytest.ini; the committed plan-sweep digest
# (plans/r14/SWEEP_DIGEST.md) pins the same invariant per round.
def test_no_query_plan_contains_row_python_udf(spark):
    """The engine-wide no-row-UDF invariant (session.py docstring):
    every registered query plans without BatchEvalPython. (mapInPandas
    queries plan MapInPandas — Arrow-batched, allowed.)"""
    for name, fn in q.all_queries().items():
        if name == "streaming_city_metrics_replay":
            continue  # runs a side-effecting stream; covered in streaming tests
        assert_no_python_udf(fn(spark, SF))


def test_sampling_split_and_mix_are_map_only(spark):
    """hash_split / weighted_mix must stay shuffle-free: the whole
    point of hash-bucketed splitting at 100 TB is that assignment is a
    column expression evaluated inside the scan stage — zero Exchange
    nodes in the plan."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    for name in ("split_train_val_test", "weighted_corpus_mix"):
        plan = physical_plan(q.all_queries()[name](spark, SF))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_stratified_sample_uses_window_group_limit(spark):
    """The k-per-group sample must plan WindowGroupLimit (per-partition
    top-k heaps below the shuffle), not a full per-group sort."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(q.all_queries()["stratified_sample_per_lang"](spark, SF))
    assert "WindowGroupLimit" in plan, plan


def test_q19_disjunction_pushes_per_table_conjuncts(spark):
    """Catalyst must extract each side's OR-of-ANDs projection and push
    it into the respective scan: the quantity disjunction reaches the
    lineitem reader, the brand/size disjunction reaches part."""
    df = q.all_queries()["tpch_q19_disjunctive_revenue"](spark, SF)
    assert_pushed_filters(df, "l_quantity", "p_brand", "p_size")
    assert_broadcast_join(df, expected=1)


def test_repetition_scores_is_two_phase_agg(spark):
    """The repetition operator must plan as explode -> partial
    HashAggregate -> Exchange -> final agg (map-side combine before
    the shuffle), never an O(len^2) per-row HOF and never more than
    the two aggregation shuffles ((doc,bigram) then doc)."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["text_repetition_scores"](spark, SF)
    plan = physical_plan(df)
    # tree entries render as "Exchange (n)"; node detail headers as "(n) Exchange"
    assert plan.count("Exchange (") <= 2, plan
    assert "HashAggregate" in plan, plan
    assert_no_python_udf(df)


def test_contamination_join_is_not_cartesian_and_prunes_columns(spark):
    """The trigram-overlap join must be an equi-join on the ngram key
    (shuffled hash/SMJ both fine) — a cartesian or BNLJ here would be
    quadratic in corpus size."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["contamination_eval_train_overlap"](spark, SF)
    plan = physical_plan(df)
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_pack_bins_windows_per_source_not_globally(spark):
    """Token-bin packing must shuffle on source (hashpartitioning) and
    sort only within partitions — a global Sort/range-partition here
    would serialize the 100 TB corpus through one ordering."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(q.all_queries()["pack_documents_token_bins"](spark, SF))
    assert "hashpartitioning(source" in plan, plan
    import re

    assert not re.search(r"rangepartitioning\(\[?pk", plan), plan


def test_catalog_rejects_unknown_table(spark):
    import pytest

    with pytest.raises(KeyError, match="unknown table"):
        catalog.load_table(spark, SF, "nope")


def test_spark_sql_surface_over_registered_views(spark):
    """catalog.register_views exposes every table to spark.sql; a SQL
    aggregation equals its DataFrame-API twin."""
    catalog.register_views(spark, SF)
    sql_rows = {
        tuple(r)
        for r in spark.sql(
            "SELECT event_type, count(event_id) AS total_trips "
            "FROM events GROUP BY event_type"
        ).collect()
    }
    df_rows = {
        tuple(r)
        for r in catalog.load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("event_id").alias("total_trips"))
        .collect()
    }
    assert sql_rows == df_rows and len(sql_rows) > 0


def test_tpch_q6_is_pure_scan_aggregate(spark):
    """Q6 is the canonical scan-filter-agg: date + quantity predicates
    pushed to the parquet reader, no join, and the only Exchange is the
    single-row final-agg gather."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["tpch_q6_forecast_revenue"](spark, SF)
    assert_pushed_filters(df, "l_shipdate", "l_quantity")
    plan = physical_plan(df)
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg gather only


def test_tpch_q8_broadcasts_every_dimension(spark):
    """Q8's 8-relation tree must broadcast all six hinted dims (part,
    customer, supplier, nation x2, region). The un-hinted
    lineitem⋈orders edge is left to the optimizer: at sf0.001 the
    date-pruned orders side fits the broadcast threshold (a 7th
    BroadcastHashJoin — fine), at 100 TB it exceeds it and plans
    sort-merge on the one wide shuffle. Assert the dims and that no
    join degenerates to a cartesian."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["tpch_q8_market_share"](spark, SF)
    assert_broadcast_join(df, expected=6)
    assert "Cartesian" not in physical_plan(df)
    assert_pushed_filters(df, "p_type", "o_orderdate", "r_name")


def test_tpch_q21_self_joins_are_semi_and_anti(spark):
    """Q21's signature: the late-lines relation correlates against the
    fact twice — LEFT SEMI (another supplier shipped) and LEFT ANTI
    (no other supplier late). Both must appear, and never as a
    cartesian."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["tpch_q21_waiting_suppliers"](spark, SF)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan


def test_tpch_q15_max_revenue_is_single_row_broadcast(spark):
    """Q15's HAVING = (SELECT max(...)) must plan as a 1-row broadcast
    back onto the supplier-revenue aggregate — not a global sort and
    not a second lineitem scan (exactly one lineitem relation in the
    plan)."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["tpch_q15_top_supplier"](spark, SF)
    plan = physical_plan(df)
    assert_broadcast_join(df, expected=2)  # the max row + the supplier dim
    assert plan.count("lineitem.parquet") == 1


def test_bm25_broadcasts_stats_and_filters_tokens_in_scan(spark):
    """BM25's corpus-stats (1 row) and df (|query| rows) relations must
    come back as broadcasts — a shuffle join against either would add
    two pointless full exchanges — and the postings explode must run
    over the pre-filtered hits array (scan-stage term filter), never
    the full token array."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["search_bm25_topk"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "Cartesian" not in plan, plan
    # the final top-k is a bounded sort, not a global one
    assert "TakeOrderedAndProject" in plan, plan


def test_substring_spans_band_filter_precedes_self_join(spark):
    """The [2, max_freq] corpus-frequency band must apply BEFORE the
    positional self-join (it is the quadratic-blowup guard), and the
    join itself must be an equi-join on the shingle digest."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["dedup_substring_spans"](spark, SF)
    plan = physical_plan(df)
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    # island consolidation partitions by (pair, diagonal), never globally
    assert "hashpartitioning(doc_a" in plan, plan


def test_shuffled_hash_join_is_pinned(spark):
    """The SHUFFLE_HASH hint must survive planning: the supplier-volume
    query exercises ShuffledHashJoin (the no-sort big/medium strategy),
    not a broadcast or sort-merge fallback, and a rangepartitioning
    exchange must appear in the global-sort query (the no-limit total
    order shape)."""
    from real_time_ride_hailing_data_pipeline_spark import queries as q
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(
        q.all_queries()["shuffled_hash_join_supplier_volume"](spark, SF)
    )
    assert "ShuffledHashJoin" in plan, plan
    sort_plan = physical_plan(q.all_queries()["global_sort_orders"](spark, SF))
    assert "rangepartitioning" in sort_plan.lower(), sort_plan


def test_iterative_operators_keep_bounded_plans(spark):
    """VERDICT r4 item 4: lineage checkpointing must cap plan size for
    iterative operators — a 9-iteration PageRank plans exactly as many
    Exchange nodes as a 6-iteration one (both end on a 3-round segment
    above a checkpoint, so depth is iteration-INDEPENDENT), and the
    checkpointed run's values must be bit-identical to an
    unchckpointed one (exact integer fixed-point is unaffected by
    materialization). (r13: the former `9-iter <= 3-iter` form broke
    when the un-checkpointed rounds got cheaper — the pre-partitioned
    cached edge relation lets round 1 reuse the cached `nodes`
    partitioning, while a checkpoint-segment round pays one extra
    ranks-side Exchange because the LogicalRDD loses it. Bounded-ness,
    the thing r4 asked for, is the equality below.)"""
    from real_time_ride_hailing_data_pipeline_spark.operators import dedup as dd
    from real_time_ride_hailing_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 12) for i in range(12)] + [(i, (i + 1) % 12) for i in range(12)],
        "src long, dst long",
    )

    mid_plan = physical_plan(pagerank_fixed_point(edges, iters=6))
    long_df = pagerank_fixed_point(edges, iters=9)
    long_plan = physical_plan(long_df)
    assert long_plan.count("Exchange") == mid_plan.count("Exchange"), (
        long_plan.count("Exchange"),
        mid_plan.count("Exchange"),
    )

    unchecked = pagerank_fixed_point(edges, iters=9, checkpoint_every=100)
    assert sorted(map(tuple, long_df.collect())) == sorted(
        map(tuple, unchecked.collect())
    )

    # connected components on a diameter-11 path: 11 label rounds, two
    # mid-run checkpoints; labels must still be the exact min-label
    # result and the final plan must stay shallow
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    labels = dd.connected_components(path, max_iter=25, checkpoint_every=5)
    # <= checkpoint_every rounds of lineage survive (one round plans ~4
    # Exchanges); without the checkpoint all 11 rounds would
    assert physical_plan(labels).count("Exchange") <= 24
    assert {(r["node"], r["comp"]) for r in labels.collect()} == {
        (i, 0) for i in range(12)
    }


def test_change_feed_insert_only_commit_is_scan_only(spark):
    """The snapshot CDF's scale story, plan-asserted: when a commit
    only ADDS partitions (the two-batch replay's second batch touches
    only new dates), read_changes resolves entirely through the
    manifests — the physical plan is a pruned parquet scan + project,
    ZERO Exchanges, no exceptAll machinery. The non-trivial
    re-touched-partition diff path is exercised separately in
    tests/test_streaming.py::test_snapshot_change_feed_is_pruned_and_exact."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["streaming_snapshot_change_feed"](spark, SF)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert "Except" not in plan, plan


def test_sql_udf_inlines_into_codegen(spark):
    """The Spark 4 SQL-routine surfaces (r7): a scalar SQL UDF must be
    INLINED by the analyzer (no Python boundary, the CASE body visible
    in the physical plan); a SQL table function must plan as a plain
    parameterized view — its range predicates reaching the parquet
    scan as pushed filters; the pipe-syntax form must push its WHERE
    identically to classic SQL."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    scalar = q.all_queries()["sql_scalar_udf_value_bands"](spark, SF)
    assert_no_python_udf(scalar)
    assert "CASE WHEN" in physical_plan(scalar)  # body inlined, not a call

    table_fn = q.all_queries()["sql_table_udf_band_summary"](spark, SF)
    assert_no_python_udf(table_fn)
    assert_pushed_filters(table_fn, "value")

    piped = q.all_queries()["sql_pipe_syntax_agg"](spark, SF)
    assert_no_python_udf(piped)
    assert_pushed_filters(piped, "value")


def test_dpp_join_prunes_partitions_dynamically(spark):
    """dpp_partition_pruned_join (r7): the date-partitioned fact scan
    must carry a runtime dynamicpruningexpression — and NO static
    partition predicate derived from the dim's flag (the dim is
    materialized to parquet precisely to make static pruning
    impossible), so the pruning observed is genuinely dynamic."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    df = q.all_queries()["dpp_partition_pruned_join"](spark, SF)
    plan = physical_plan(df)
    assert "dynamicpruning" in plan.lower()
    assert "dayofmonth" not in plan.lower()  # flag never folded back


def test_bloom_filter_join_injects_might_contain(spark):
    """runtime_bloom_filter_join (r7): under the demo thresholds the
    optimizer must inject a bloom-filter semi-join reduction — a
    might_contain predicate on the lineitem side ahead of the
    exchange. Rebuilt here via the factored shape because the registry
    callable returns the post-checkpoint result."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan
    from real_time_ride_hailing_data_pipeline_spark.queries import (
        _BLOOM_CONFS,
        _bloom_filter_join,
    )

    prev = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        plan = physical_plan(_bloom_filter_join(spark, SF))
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan.lower()


def test_edit_distance_tier_is_join_free(spark):
    """dedup_edit_distance_pairs carries the neighbor's text on the
    same lead() window as its id, so the verify tier must plan with
    NO join operator and exactly one Exchange+Window (the neighbor
    slots explode out of one array-of-structs window pass; a per-slot
    union would re-plan the scan+shuffle chain per branch)."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(q.all_queries()["dedup_edit_distance_pairs"](spark, SF))
    assert "Join" not in plan, plan
    assert plan.count("(1) Scan parquet") == 1 or plan.count("Scan parquet") == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_collation_group_is_plain_hash_aggregate(spark):
    """Collation changes the grouping comparator, not the distribution
    strategy: with no binary-stable key to hash, the UTF8_LCASE
    groupBy falls back to a partial+final SortAggregate pair — still
    exactly one Exchange, still map-side partial aggregation."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(q.all_queries()["collation_caseinsensitive_group"](spark, SF))
    assert len(re.findall(r"\(\d+\) SortAggregate", plan)) == 2, plan
    assert "partial_count" in plan and "partial_sum" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    """The LATERAL ORDER BY..LIMIT subquery must decorrelate into the
    hand-written top-k-per-group shape: WindowGroupLimit below the
    window sort plus a hash join — never a per-row nested loop."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(
        q.all_queries()["lateral_topk_orders_per_customer"](spark, SF)
    )
    assert "WindowGroupLimit" in plan, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_recursive_spine_joins_aggregated_side_not_raw_rows(spark):
    """The spine left-joins the YEAR-GROUPED aggregate, not raw
    orders — the recursion (O(calendar span) one-row steps) must not
    drag the fact table through per-iteration work, and the final join
    must stay nested-loop-free."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(
        q.all_queries()["recursive_cte_year_spine"](spark, SF)
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    # The join's BUILD side must be the year-grouped aggregate — i.e.
    # the HashAggregate sits directly under the BroadcastExchange,
    # BELOW the join. A regressed plan that joins raw orders to the
    # spine and aggregates afterwards also contains a HashAggregate,
    # so "HashAggregate in plan" alone would not catch it.
    import re

    assert re.search(
        r"BroadcastExchange \(\d+\)\n\s*\+- HashAggregate", plan
    ), plan


def test_parameterized_sql_binds_as_pushable_literals(spark):
    """Named-parameter binding must behave exactly like inline
    literals: the bound :start / :cap predicates reach the parquet
    scan as PushedFilters (no post-scan Filter-only plan, no
    plan-breaking placeholder nodes)."""
    df = q.all_queries()["parameterized_sql_priority_bands"](spark, SF)
    assert_pushed_filters(df, "o_orderdate", "o_totalprice")
    assert_no_python_udf(df)


def test_approx_topk_is_single_pass_partial_agg(spark):
    """approx_top_k must plan as a two-phase (partial -> final)
    aggregate over ONE scan of events: sketches merge map-side, so
    no raw-key shuffle and no second pass."""
    df = q.all_queries()["approx_topk_event_types"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly ONE scan of events feeds the aggregate
    assert plan.count("FileScan parquet") == 1, plan
    # two-phase sketch aggregate: a partial_approx_top_k below the
    # (single, sketch-sized) Exchange, the final merge above it
    assert "partial_approx_top_k" in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert_no_python_udf(df)


def test_global_row_index_avoids_single_partition_table_sort(spark):
    """Global row numbering must NOT plan the classic anti-pattern —
    an empty-partition row_number() that funnels the whole table
    through one task. The big-side Window must be partitioned by the
    derived bucket; the only unpartitioned/constant-partitioned step
    is the P-row offsets prefix sum."""
    df = q.all_queries()["global_row_index"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    # Every row_number window spec over event_id must carry the bucket
    # partition key (the offsets window is a sum over _bucket, not a
    # row_number over event_id) — and the regex must actually MATCH,
    # or a plan-string format change would green-light the exact
    # anti-pattern this test exists to block.
    matches = list(
        re.finditer(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan)
    )
    assert matches, plan
    for m in matches:
        assert "_bucket" in m.group(1), m.group(0)
    # the bucket id is a driver-side literal, not an in-plan broadcast:
    # one scan, no nested-loop join anywhere
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan
    assert_no_python_udf(df)


def test_cbo_stats_are_exact_and_reach_the_planner(spark):
    """ANALYZE TABLE .. FOR COLUMNS must persist EXACT statistics
    (row count, min/max, null count — value-asserted against the
    data, not just present), and with spark.sql.cbo.enabled the
    optimizer's relation stats must expose the analyzed rowCount —
    the input the cost-based join reorder prices plans with."""
    q.all_queries()["cbo_stats_join_reorder"](spark, SF)
    # table-level: "N bytes, M rows"
    tbl_stats = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE EXTENDED rtrh_cbo_nation").collect()
    }
    assert tbl_stats["Statistics"].endswith("25 rows"), tbl_stats["Statistics"]
    # column-level: exact min/max/null_count for nation keys 0..24
    col_stats = {
        r[0]: r[1]
        for r in spark.sql(
            "DESCRIBE EXTENDED rtrh_cbo_nation n_nationkey"
        ).collect()
    }
    assert col_stats["min"] == "0", col_stats
    assert col_stats["max"] == "24", col_stats
    assert col_stats["num_nulls"] == "0", col_stats
    # the stats reach the optimizer under the CBO flag
    saved = spark.conf.get("spark.sql.cbo.enabled", None)
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        rc = (
            spark.table("rtrh_cbo_nation")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .rowCount()
        )
        assert rc.isDefined() and int(str(rc.get())) == 25
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.cbo.enabled")
        else:
            spark.conf.set("spark.sql.cbo.enabled", saved)


def test_dv_read_is_broadcast_anti_join_with_pushdown(spark, tmp_path):
    """The deletion-vector read path's scale contract: the vector
    applies as ONE BroadcastHashJoin LeftAnti on the raw scan — the
    table side never shuffles — and a consumer predicate still reaches
    the parquet scan as a PushedFilter THROUGH the DV anti-join. With
    no vectors the plan is untouched (no join node at all)."""
    import datetime as dt

    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan
    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        ParquetUpsertSink,
    )

    sink = ParquetUpsertSink(
        str(tmp_path / "t"),
        key_cols=("k", "window_start"),
        snapshot_dir=str(tmp_path / "snap"),
    )
    d1 = dt.datetime(2024, 1, 15, 10, 0)
    sink.write_batch(
        spark.createDataFrame(
            [("a", d1, 10), ("b", d1, 20)],
            "k string, window_start timestamp, total bigint",
        ),
        0,
    )
    clean = physical_plan(sink.read(spark).filter(F.col("total") > 5))
    assert "Join" not in clean, clean  # no vectors -> zero overhead
    sink.delete_keys(
        spark.createDataFrame([("a", d1)], "k string, window_start timestamp"),
        1,
        mode="merge_on_read",
    )
    df = sink.read(spark).filter(F.col("total") > 5)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # exactly one Exchange (the broadcast); the table side stays put
    assert "Exchange hashpartitioning" not in plan, plan
    assert re.search(r"PushedFilters: \[.*GreaterThan\(total", plan), plan


def test_column_mapped_read_pushes_filters_to_physical_scan(spark, tmp_path):
    """Predicate pushdown survives column mapping: a filter written
    against the RENAMED logical name folds through the alias Project
    and reaches the parquet scan as a PushedFilter on the PHYSICAL
    name — renames cost nothing at plan time either."""
    import datetime as dt

    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan
    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        ParquetUpsertSink,
    )

    sink = ParquetUpsertSink(
        str(tmp_path / "t"),
        key_cols=("k", "window_start"),
        snapshot_dir=str(tmp_path / "snap"),
    )
    d1 = dt.datetime(2024, 1, 15, 10, 0)
    sink.write_batch(
        spark.createDataFrame(
            [("a", d1, 10), ("b", d1, 20)],
            "k string, window_start timestamp, total bigint",
        ),
        0,
    )
    sink.rename_column(spark, "total", "amount", 1)
    plan = physical_plan(sink.read(spark).filter(F.col("amount") > 15))
    assert re.search(r"PushedFilters: \[.*GreaterThan\(total", plan), plan
    assert "ReadSchema" in plan and "amount" not in plan.split("ReadSchema")[1].split("\n")[0], plan


def test_aqe_skew_join_split_fires_on_hot_key(spark, tmp_path):
    """AQE's skew-join split demonstrably fires (VERDICT r11 item 4):
    a 99%-hot-key probe side through a forced sort-merge join carries
    the ``skew=true`` marker in the executed plan when the split is
    on, and not when it is off. The three load-bearing fixture
    conditions (multi-mapper probe side, MATERIALIZED dim side so the
    SMJ(Sort(Shuffle),Sort(Shuffle)) pattern matches, thresholds
    scaled to the fixture) are the same ones bench.py's skew_bench
    documents — this pins them so the bench evidence can't silently
    regress to two identical timings."""
    ev = catalog.load_table(spark, SF, "events").repartition(16)
    skewed = (
        ev.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn(
            "hot_key",
            F.when(
                F.pmod(F.col("event_id"), F.lit(100)) < 99, F.lit("hot-0")
            ).otherwise(F.concat(F.lit("k-"), F.col("event_id").cast("string"))),
        )
        .withColumn(
            "payload", F.repeat(F.md5(F.col("event_id").cast("string")), 6)
        )
    )
    rdir = str(tmp_path / "dim")
    (
        skewed.select("hot_key")
        .distinct()
        .withColumn("dim_payload", F.md5(F.col("hot_key")))
        .write.mode("overwrite")
        .parquet(rdir)
    )
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thresh = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    prev_advisory = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # sf0.001 hot partition is ~12.5 KB compressed (measured via
        # OptimizeSkewedJoin's DEBUG stats); scale the 256 MB
        # production default accordingly (same reasoning as skew_bench)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        markers = {}
        for flag in ("false", "true"):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
            j = (
                skewed.join(spark.read.parquet(rdir), "hot_key")
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            j.collect()
            markers[flag] = (
                "skew=true" in j._jdf.queryExecution().executedPlan().toString()
            )
        assert markers == {"false": False, "true": True}, markers
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            prev_thresh,
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_advisory
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


def test_ann_ivf_indexed_topk_probe_is_partition_pruned(spark):
    """VERDICT r12 item 1: the materialized IVF index's probe predicate
    must be PARTITION PRUNING, not a post-scan filter — the registry
    entry's own plan (not a hand-built twin) carries PartitionFilters
    on `cell` in its index scan, and the result value-matches the
    unpartitioned ann_ivf_topk (same candidate set, same exact-decimal
    ranking)."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import (
        physical_plan,
    )

    df = q.all_queries()["ann_ivf_indexed_topk"](spark, SF)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "cell" in seg, seg
    assert_no_python_udf(df)  # Arrow MapInPandas screen is allowed
    got = [(r["vec_id"], r["sim"]) for r in df.collect()]
    base = [
        (r["vec_id"], r["sim"])
        for r in q.all_queries()["ann_ivf_topk"](spark, SF).collect()
    ]
    assert got == base and len(got) == 10, (got, base)


def test_ann_ivf_indexed_batch_topk_single_masked_scan_matches_per_query(spark):
    """r14 (VERDICT r13 item 3): the batch probe collapses the Q
    per-query plan branches into ONE partition-pruned scan of the
    UNION probe set + a per-query cell mask inside the BLAS screen.
    Plan: no Union of per-query branches, exactly one MapInPandas
    screen, PartitionFilters on `cell` at the index scan; semantics:
    each query's rows must EQUAL the single-query indexed probe —
    per-query candidate sets still depend only on that query's probed
    cells."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import (
        physical_plan,
    )

    df = q.all_queries()["ann_ivf_indexed_batch_topk"](spark, SF)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "cell" in seg, seg
    # formatted plans list each node twice (tree + numbered detail):
    # count the detail entries — ONE screen, not Q, and no per-query
    # union branches
    assert plan.count(") MapInPandas") == 1, plan
    assert "Union" not in plan, plan
    assert_no_python_udf(df)  # Arrow MapInPandas screen is allowed
    rows = df.collect()
    assert len(rows) == 15  # 3 queries x k=5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["vec_id"], r["sim"]))
    assert len(by_q) == 3
    # each query's batch answer == its single-query indexed probe
    import os as _os

    from real_time_ride_hailing_data_pipeline_spark.operators import ivf
    from real_time_ride_hailing_data_pipeline_spark.queries import (
        _ivf_centroids,
        _t,
    )
    from real_time_ride_hailing_data_pipeline_spark.streaming.job import _workdir

    emb = _t(spark, SF, "embeddings")
    cents = _ivf_centroids(spark, SF)
    index_path = _os.path.join(_workdir("rtrh_ivfbat_test_"), "index")
    ivf.build_cell_index(emb, cents, index_path)
    for qrow in emb.orderBy("vec_id").limit(3).collect():
        q1 = spark.createDataFrame(
            [(qrow["embedding"],)], "embedding array<float>"
        )
        single = [
            (i + 1, r["vec_id"], r["sim"])
            for i, r in enumerate(
                ivf.ivf_topk_indexed(
                    spark, index_path, q1, cents, k=5, nprobe=4
                ).collect()
            )
        ]
        assert sorted(by_q[qrow["vec_id"]]) == single, (
            qrow["vec_id"],
            by_q[qrow["vec_id"]],
            single,
        )


def test_ann_lsh_indexed_topk_probe_is_partition_pruned(spark):
    """r13: the REGISTRY entry for the materialized LSH index (not
    just the operator twin below) must probe through partition
    pruning — PartitionFilters on `sig` in its index scan — and its
    answer must value-match the unpartitioned ann_lsh_topk (same
    Hamming-radius-0 bucket, same exact-decimal ranking; both now
    share the full plane-literal DuckDB oracle)."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import (
        physical_plan,
    )

    df = q.all_queries()["ann_lsh_indexed_topk"](spark, SF)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "sig" in seg, seg
    assert_no_python_udf(df)  # Arrow MapInPandas screen is allowed
    got = [(r["vec_id"], r["sim"]) for r in df.collect()]
    base = [
        (r["vec_id"], r["sim"])
        for r in q.all_queries()["ann_lsh_topk"](spark, SF).collect()
    ]
    assert got == base and len(got) == 10, (got, base)


def test_lsh_signature_partitioned_layout_prunes_probe_scan(spark, tmp_path):
    """The LSH twin of the IVF build-then-probe proof (VERDICT r12
    "what's wrong" item 1): materialize build_lsh_index (corpus
    written partitionBy(sig)), probe with lsh_topk_indexed — the
    literal signature-equality predicate must land in the scan's
    PartitionFilters, and the pruned top-k must equal
    lsh_bucketed_topk's answer on the unpartitioned table (same
    Hamming-radius-0 bucket, same two-phase exact-decimal scoring)."""
    from real_time_ride_hailing_data_pipeline_spark.operators import (
        similarity as sim,
    )
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import (
        physical_plan,
    )

    emb = catalog.load_table(spark, SF, "embeddings")
    layout = str(tmp_path / "emb_by_sig")
    sim.build_lsh_index(emb, layout, num_planes=4)
    query = emb.orderBy("vec_id").limit(1)
    df = sim.lsh_topk_indexed(spark, layout, query, k=5, num_planes=4)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan, plan
    assert "sig" in plan.split("PartitionFilters")[1][:200]
    got = [(r["vec_id"], r["sim"]) for r in df.collect()]
    base = [
        (r["vec_id"], r["sim"])
        for r in sim.lsh_bucketed_topk(emb, query, k=5, num_planes=4).collect()
    ]
    assert got == base and len(got) > 0, (got, base)

def test_lsh_index_incremental_ingest_is_exactly_once(spark, tmp_path):
    """r13 maintenance symmetry: the LSH index takes the same
    exactly-once incremental ingest as the IVF index — build on 3/4 of
    the corpus, ingest the rest in epochs, REPLAY one epoch (what a
    checkpoint restart does): no duplicates, no loss, and the pruned
    probe equals the probe over a from-scratch full rebuild
    (signatures are data-independent, so base+delta == rebuild)."""
    from pyspark.sql import functions as F

    from real_time_ride_hailing_data_pipeline_spark.operators import (
        similarity as sim,
    )

    emb = catalog.load_table(spark, SF, "embeddings")
    maintained = str(tmp_path / "maintained")
    rebuilt = str(tmp_path / "rebuilt")
    sim.build_lsh_index(
        emb.filter(F.col("vec_id") % 4 != 3), maintained, num_planes=4
    )
    delta = emb.filter(F.col("vec_id") % 4 == 3)
    for i in range(2):
        sim.ingest_into_lsh_index(
            delta.filter(F.col("vec_id") % 2 == i), maintained, i, num_planes=4
        )
    sim.ingest_into_lsh_index(  # crash-replay of epoch 1
        delta.filter(F.col("vec_id") % 2 == 1), maintained, 1, num_planes=4
    )
    sim.build_lsh_index(emb, rebuilt, num_planes=4)
    idx = spark.read.parquet(maintained)
    n = emb.count()
    assert idx.count() == n and idx.select("vec_id").distinct().count() == n
    query = emb.orderBy("vec_id").limit(1)
    got = [
        (r["vec_id"], r["sim"])
        for r in sim.lsh_topk_indexed(
            spark, maintained, query, k=5, num_planes=4
        ).collect()
    ]
    want = [
        (r["vec_id"], r["sim"])
        for r in sim.lsh_topk_indexed(
            spark, rebuilt, query, k=5, num_planes=4
        ).collect()
    ]
    assert got == want and len(got) > 0, (got, want)
