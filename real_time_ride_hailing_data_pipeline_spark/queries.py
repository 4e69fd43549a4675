"""Query registry: every operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) as a named (PySpark callable, DuckDB
oracle SQL) pair.

Contract (see /root/repo/__spark_entry__.py): each callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is equivalent
ANSI SQL DuckDB runs over the same parquet. Column names are aliased
identically on both sides; double-valued aggregates are rounded on both
sides so the value-hash comparison is stable across summation orders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark import catalog
from real_time_ride_hailing_data_pipeline_spark.operators import relational as rel
from real_time_ride_hailing_data_pipeline_spark.operators import ride_pipeline as rp

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: the reference's city-metrics computation (A1-A3, T2, P4, O1)
# on the driver's `events` table (event_type plays the city role, value
# the fare). Reference: streaming_job.py:117-125 + 18-23.
# ---------------------------------------------------------------------------


@query(
    "city_window_metrics",
    oracle="""
    SELECT event_type,
           date_trunc('minute', ts)                    AS window_start,
           date_trunc('minute', ts) + INTERVAL 1 MINUTE AS last_updated,
           count(event_id)                             AS total_trips,
           ((2 * sum(CAST(round(value * 100) AS BIGINT)) + count(value))
             // (2 * count(value))) / 100.0            AS average_fare
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def city_window_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute tumbling window x key: count + avg (the reference's core
    aggregation, streaming_job.py:117-125). Plan: partial HashAggregate
    -> shuffle on (window, event_type) -> final HashAggregate; the
    window struct is computed map-side so the shuffle carries only
    group keys + partial (count, sum). average_fare is the exact
    cent-rounded average (see rp.city_window_metrics): fares are
    2-decimal currency, so integer-cents arithmetic is deterministic
    where round(avg(double), 2) diverges across engines on half-cent
    boundaries."""
    events = _t(spark, sf_dir, "events")
    agg = rp.city_window_metrics(
        events,
        time_col="ts",
        key_col="event_type",
        id_col="event_id",
        fare_col="value",
        exact_cents_avg=True,
    )
    return agg.select(
        F.col("event_type"),
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("last_updated"),
        F.col("total_trips"),
        F.col("average_fare"),
    )


@query(
    "city_running_totals",
    oracle="""
    SELECT event_type,
           count(event_id)                              AS total_trips,
           max(date_trunc('minute', ts) + INTERVAL 1 MINUTE) AS last_updated
    FROM events
    GROUP BY 1
    """,
)
def city_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running totals — the quantity the reference accumulates
    sink-side via additive upsert (streaming_job.py:41-42), computed
    in-engine (idempotent under replay) as a re-aggregation of the
    windowed metrics."""
    metrics = _QUERIES["city_window_metrics"](spark, sf_dir)
    return metrics.groupBy("event_type").agg(
        F.sum("total_trips").alias("total_trips"),
        F.max("last_updated").alias("last_updated"),
    )


@query(
    "top_cities_by_trips",
    oracle="""
    SELECT event_type, count(event_id) AS total_trips
    FROM events
    GROUP BY 1
    ORDER BY total_trips DESC, event_type
    LIMIT 5
    """,
)
def top_cities_by_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI-layer query (README.md:110: ORDER BY total_trips DESC),
    internalized (O1). Spark plans TakeOrderedAndProject — no global
    sort, each partition keeps its top 5 and the driver merges."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count("event_id").alias("total_trips"))
        .orderBy(F.desc("total_trips"), F.asc("event_type"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Relational core on the star schema (SURVEY §2.2/§2.4/§2.6 generalized)
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity * 100)      AS BIGINT) AS qty_c,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
             CAST(round(l_discount * 100)      AS BIGINT) AS d_c,
             CAST(round(l_tax * 100)           AS BIGINT) AS t_c
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ), g AS (
      SELECT l_returnflag, l_linestatus,
             sum(qty_c) AS sq, sum(ep_c) AS sep, sum(d_c) AS sd,
             sum(ep_c * (100 - d_c))             AS s4,
             sum(ep_c * (100 - d_c) * (100 + t_c)) AS s6,
             count(*) AS n
      FROM c GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus,
           sq / 100.0                               AS sum_qty,
           sep / 100.0                              AS sum_base_price,
           ((2 * s4 + 100) // 200) / 100.0          AS sum_disc_price,
           ((2 * s6 + 10000) // 20000) / 100.0      AS sum_charge,
           ((2 * sq * 100 + n) // (2 * n)) / 10000.0  AS avg_qty,
           ((2 * sep * 100 + n) // (2 * n)) / 10000.0 AS avg_price,
           ((2 * sd * 100 + n) // (2 * n)) / 10000.0  AS avg_disc,
           n AS count_order
    FROM g ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped hash aggregation with multiple aggregates (A1-A3
    generalized to the TPC-H Q1 shape). Filter pushed to the parquet
    scan; two-phase hash agg; 4-row result.

    All monetary/rate inputs are exact 2-decimal values, so everything
    is computed in integer "cents" (qty*100, price*100, ...): sums are
    exact longs, disc_price/charge products are exact in 1e-4/1e-6
    units, and the final 2-/4-decimal roundings use the half-up integer
    identity round(a/b) = (2a+b) DIV 2b — bit-identical across engines
    and summation orders, unlike float sum+round. Long sums stay exact
    below ~sf10 (charge units ~1.1e11/row vs 9.2e18 int64 max)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            cents("l_quantity").alias("qty_c"),
            cents("l_extendedprice").alias("ep_c"),
            cents("l_discount").alias("d_c"),
            cents("l_tax").alias("t_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_c").alias("sq"),
            F.sum("ep_c").alias("sep"),
            F.sum("d_c").alias("sd"),
            F.sum(F.col("ep_c") * (100 - F.col("d_c"))).alias("s4"),
            F.sum(F.col("ep_c") * (100 - F.col("d_c")) * (100 + F.col("t_c"))).alias("s6"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sq") / 100.0).alias("sum_qty"),
        (F.col("sep") / 100.0).alias("sum_base_price"),
        (F.expr("(2 * s4 + 100) DIV 200") / 100.0).alias("sum_disc_price"),
        (F.expr("(2 * s6 + 10000) DIV 20000") / 100.0).alias("sum_charge"),
        (F.expr("(2 * sq * 100 + n) DIV (2 * n)") / 10000.0).alias("avg_qty"),
        (F.expr("(2 * sep * 100 + n) DIV (2 * n)") / 10000.0).alias("avg_price"),
        (F.expr("(2 * sd * 100 + n) DIV (2 * n)") / 10000.0).alias("avg_disc"),
        F.col("n").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection (§2.2): both reach the parquet scan
    (PushedFilters + pruned ReadSchema in the physical plan) — the
    property that matters at 100 TB, where the scan IS the query."""
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))


@query(
    "join_broadcast_enrichment",
    oracle="""
    SELECT n_name, r_name,
           count(*)                    AS n_customers,
           round(sum(c_acctbal), 2)    AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def join_broadcast_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static-shaped enrichment join (§2.3): fact joined to two
    small dimensions, explicitly broadcast — zero shuffle for the join
    at any fact-table scale; the only exchange is the final group-by."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Joins beyond broadcast, analytic windows, set ops, rollup
# (SURVEY §2.3/§2.5/§2.7 — absent in the reference, required surface)
# ---------------------------------------------------------------------------


@query(
    "sort_merge_order_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_orderkey) AS n_orders,
           ((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 100)
             // 200) / 100.0 AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def sort_merge_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big⋈big sort-merge join (J2): orders⋈lineitem on orderkey,
    revenue per order priority. MERGE hint pins the 100 TB physical
    plan (shuffle both sides on orderkey, sort, stream-merge) even at
    toy scale where AQE would otherwise broadcast. Revenue in exact
    1e-4 units -> half-up cents (see tpch_q1 docstring)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_u4"),
    )
    return (
        rel.sort_merge_join(
            orders.select("o_orderkey", "o_orderpriority"),
            li,
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum("rev_u4").alias("s4"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            (F.expr("(2 * s4 + 100) DIV 200") / 100.0).alias("revenue"),
        )
    )


@query(
    "semi_join_customers_with_open_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    GROUP BY c_mktsegment
    """,
)
def semi_join_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J2/EXISTS): customers having at least one open
    order, counted per market segment. The semi join ships only
    o_custkey through the shuffle — no payload columns."""
    customer = _t(spark, sf_dir, "customer")
    open_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        rel.semi_join(customer, open_orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "anti_join_customers_without_big_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    GROUP BY c_mktsegment
    """,
)
def anti_join_customers_without_big_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Left-anti join (J2/NOT EXISTS): customers who never placed an
    order above 250k, per market segment — the classic churn-risk
    query. The right-side filter is pushed to the orders scan before
    the anti join."""
    customer = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        rel.anti_join(customer, big_orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "window_rank_top_events_per_type",
    oracle="""
    SELECT event_type, rn, event_id, value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def window_rank_top_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function (W): top-3 events by value per type via
    row_number with a unique tie-breaker (event_id). Spark 3.5+ plans a
    WindowGroupLimit: each input partition keeps its local top-3 before
    the shuffle, so shuffle volume is O(3 x partitions) at any scale."""
    events = _t(spark, sf_dir, "events")
    return rel.top_n_per_group(
        events.select("event_type", "event_id", "value"),
        ["event_type"],
        [F.desc("value"), F.asc("event_id")],
        3,
    ).select("event_type", "rn", "event_id", "value")


@query(
    "window_lag_user_value_delta",
    oracle="""
    SELECT user_id, event_id, delta FROM (
      SELECT user_id, event_id,
             value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS delta
      FROM events
    ) WHERE user_id % 97 = 0
    """,
)
def window_lag_user_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag (W): per-user value delta between consecutive
    events — the per-entity time-series pattern. One shuffle on
    user_id, sort by (ts, event_id) within partitions; the post-window
    filter only trims the output (deliberately NOT pushed below the
    window — the full window must be computed)."""
    events = _t(spark, sf_dir, "events")
    return (
        rel.lag_delta(events, ["user_id"], ["ts", "event_id"], "value")
        .filter(F.col("user_id") % 97 == 0)
        .select("user_id", "event_id", "delta")
    )


@query(
    "set_union_engaged_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def set_union_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op UNION DISTINCT (U): users who purchased or signed up.
    Spark: union + distinct — one shuffle on user_id; partial distinct
    runs map-side."""
    events = _t(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase").select("user_id")
    signup = events.filter(F.col("event_type") == "signup").select("user_id")
    return purch.union(signup).distinct()


@query(
    "set_intersect_view_purchase",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_intersect_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op INTERSECT (U): users who both viewed and purchased
    (conversion audience)."""
    events = _t(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select("user_id")
    purch = events.filter(F.col("event_type") == "purchase").select("user_id")
    return views.intersect(purch)


@query(
    "set_except_open_not_finished_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_open_not_finished_custkeys(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Set op EXCEPT DISTINCT (U): customers with open orders but no
    finished ones (new-customer cohort). Spark's subtract = EXCEPT
    DISTINCT."""
    orders = _t(spark, sf_dir, "orders")
    opened = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return opened.subtract(finished)


@query(
    "rollup_orders_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchical aggregation (§2.4 extension): per
    (status, priority), per status, and grand total in one pass —
    Spark plans a single Expand + hash agg, not three scans. Sum in
    exact cents."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("tp_c", F.round(F.col("o_totalprice") * 100).cast("long"))
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("tp_c").alias("s_c"))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            (F.col("s_c") / 100.0).alias("total_price"),
        )
    )


@query(
    "agg_distinct_users_per_type",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS distinct_users,
           count(*)                AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (§2.4 extension): Spark plans expand +
    two-phase agg; distinct and non-distinct aggs combined."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
