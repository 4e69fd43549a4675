"""Data-quality profiling operators: column profiles, value
histograms, grouped extreme-value (z-score) detection, and
sketch-based distinct counting.

These are the audit pass a training-data pipeline runs before any
expensive transform: schema/null/cardinality profiling to catch
broken upstream extracts, value histograms to spot distribution
drift, and per-group extreme detection to quarantine corrupt rows.

Scale shape: every operator here is a single scan plus one
aggregation — no joins, no all-pairs, nothing driver-side. The
column profile computes all per-column aggregates in ONE pass (a
single wide aggregate unpivoted afterwards with ``stack``), so at
100 TB it costs exactly one read of the table regardless of how
many columns are profiled. Exact-integer (cents) arithmetic is used
everywhere a float summation order could differ across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, numeric_cols: list[str], other_cols: list[str]) -> DataFrame:
    """Per-column profile in one scan: row count, null count, exact
    distinct count, and (for numeric columns) min/max as doubles.

    One wide aggregate computes every metric (Spark plans the
    multi-distinct via a single Expand + aggregate — still one pass
    over the data), then ``stack`` unpivots the single row into one
    row per column. String/timestamp columns report NULL min/max so
    the output schema is uniform and engine-neutral (string casts of
    doubles/timestamps format differently across engines; doubles
    don't).
    """
    cols = list(numeric_cols) + list(other_cols)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    for c in numeric_cols:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
    row = df.agg(*aggs)

    parts = []
    for c in cols:
        if c in numeric_cols:
            mn, mx = f"`{c}__min`", f"`{c}__max`"
        else:
            mn, mx = "cast(null as double)", "cast(null as double)"
        parts.append(f"'{c}', `{c}__nulls`, `{c}__distinct`, {mn}, {mx}")
    stacked = row.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {', '.join(parts)}) as "
        "(column_name, null_count, distinct_count, min_value, max_value)",
    )
    return stacked.select(
        "column_name", "n_rows", "null_count", "distinct_count", "min_value", "max_value"
    )


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    bucket_cents: int = 2500,
    n_buckets: int = 20,
) -> DataFrame:
    """Fixed-width histogram over a 2-decimal currency column using
    exact integer-cents bucketing (engine-neutral — no float division
    near bucket edges): bucket = min(cents DIV width, n-1), the last
    bucket absorbing the tail. Map-side bucket assignment, shuffle
    carries n_buckets rows of partial aggregates.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return (
        df.select(cents.alias("cents"))
        # integer DIV, never floor(float division) — see functions/exact.py
        .withColumn(
            "bucket_id",
            F.expr(f"least(cents DIV {bucket_cents}, {n_buckets - 1})").cast("bigint"),
        )
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .withColumn("lo_dollars", (F.col("bucket_id") * bucket_cents / 100.0))
    )


def grouped_extremes(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    top_k: int = 5,
    z_threshold: int = 3,
) -> DataFrame:
    """Top-k most extreme values per group by |z-score|, flagged
    against a z threshold — with EXACT integer arithmetic throughout
    so the result is bit-stable across engines.

    Identity: |z| ranking within a group is ranking by
    |x*n - sum(x)| (same positive denominator per group), and
    z^2 > T^2 is (x*n - s)^2 > T^2 * (n*q - s^2) where s = sum(x),
    q = sum(x^2) — all integers once x is in cents. Intermediates
    reach ~1e19 at sf0.1 group sizes, so the products run in
    decimal(38,0) (HUGEINT on a DuckDB oracle).

    Plan: one grouped aggregate (n, s, q per group — tiny), broadcast
    back onto the events (group-key join against an aggregate of
    itself; Spark broadcasts the agg side), then a per-group top-k
    window. The shuffle carries only (group, cents, id).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    ev = df.select(
        F.col(id_col), F.col(group_col), cents.alias("cents")
    )
    stats = ev.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("decimal(38,0)").alias("q"),
    )
    joined = ev.join(F.broadcast(stats), group_col)
    dev = (F.col("cents").cast("decimal(38,0)") * F.col("n") - F.col("s")).alias("dev")
    scored = joined.select(
        id_col, group_col, "cents", "n", "s", "q", dev
    ).withColumn("absdev", F.abs(F.col("dev")))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("absdev").desc(), F.col(id_col).asc()
    )
    lhs = (F.col("dev") * F.col("dev")).cast("decimal(38,0)")
    rhs = (
        F.lit(z_threshold * z_threshold).cast("decimal(38,0)")
        * (
            F.col("n").cast("decimal(38,0)") * F.col("q")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        )
    ).cast("decimal(38,0)")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("cents").alias("value_cents"),
            F.col("rk").cast("bigint").alias("extreme_rank"),
            (lhs > rhs).alias("exceeds_z3"),
        )
    )


def hll_distinct_audit(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    lgk: int = 12,
    tolerance_pct: int = 2,
) -> DataFrame:
    """Per-group + global distinct counting via Apache DataSketches
    HLL (Spark 4 ``hll_sketch_agg`` / ``hll_union_agg`` /
    ``hll_sketch_estimate``), audited against the exact count.

    The output is engine-neutral by construction: it emits the EXACT
    distinct count plus a boolean ``estimate_ok`` asserting the
    sketch estimate landed within tolerance — an oracle can recompute
    the exact count and assert TRUE. The global row demonstrates the
    sketch-merge path (union per-group sketches, estimate once): at
    100 TB that is the whole point of sketches — partial sketches
    shuffle as ~2^lgk-byte blobs instead of re-shuffling raw values,
    and region-level counts merge without a second scan.
    """
    per = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sk"),
        F.count_distinct(value_col).alias("exact_distinct"),
    )
    per = per.cache()  # feeds both the per-group rows and the global union
    tol = F.greatest(
        F.lit(1).cast("double"),
        F.col("exact_distinct") * tolerance_pct / 100.0,
    )
    per_rows = per.select(
        F.col(group_col).alias("group_key"),
        F.col("exact_distinct"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct")) <= tol
        ).alias("estimate_ok"),
    )
    merged = per.agg(
        F.hll_union_agg("sk").alias("sk"),
    )
    global_exact = df.agg(F.count_distinct(value_col).alias("exact_distinct"))
    g_tol = F.greatest(
        F.lit(1).cast("double"),
        F.col("exact_distinct") * tolerance_pct / 100.0,
    )
    global_row = merged.crossJoin(global_exact).select(
        F.lit("__all__").alias("group_key"),
        F.col("exact_distinct"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct")) <= g_tol
        ).alias("estimate_ok"),
    )
    return per_rows.unionByName(global_row)
