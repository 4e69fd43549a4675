"""Relational operator library: joins beyond broadcast, analytic window
functions, set operations (SURVEY.md §2.3/§2.5/§2.7).

The reference implements none of these (it is a single-stream pipeline,
SURVEY §2.3: "None implemented in the reference") but any analytics user
of the engine hits them immediately; they are required surface per
SURVEY §2.3/§2.5/§2.7. Everything here is a thin, documented
composition of Spark built-ins — Catalyst plans the physical strategy.

Scale notes (100 TB / 1000 executors):
- ``sort_merge_join``: the big⋈big strategy. Both sides shuffle on the
  join key, sort, and stream-merge — no build-side memory blowup, spills
  gracefully. With bucketed tables pre-partitioned on the key the
  shuffle disappears entirely; AQE converts to broadcast at runtime if
  one side turns out small.
- semi/anti joins ship only the join key of the right side through the
  shuffle (no payload columns), and Spark rewrites them to broadcast
  variants when the right side is small.
- window functions shuffle once on partitionBy keys, then sort within
  partitions; skewed partition keys (one giant user) are the hazard —
  bound state with a two-stage top-n (partial per-partition top-n before
  the shuffle) when n is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sort_merge_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Big⋈big join, explicitly hinted to sort-merge.

    The MERGE hint pins the strategy so toy-scale test inputs exercise
    the same physical plan that runs at 100 TB (without it, AQE would
    broadcast the small test side and the plan under test would be the
    wrong one).
    """
    return left.hint("merge").join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS).

    Left-semi ships only join keys of the right side; output columns
    are exactly ``left``'s.
    """
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on, "left_anti")


def top_n_per_group(
    df: DataFrame, partition_cols: list[str], order_cols: list, n: int
) -> DataFrame:
    """Ranking window: row_number over (partition, order), keep top n.

    ``order_cols`` must make the order total (include a unique
    tie-breaker column) or the result is nondeterministic.
    One shuffle on ``partition_cols``; at scale, Spark 3.5+ inserts a
    WindowGroupLimit (partial per-partition top-n) before the shuffle,
    so shuffle volume is O(n × partitions), not O(rows).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


def salted_two_stage_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, str],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-resistant aggregation: salt the group key into
    ``salt_buckets`` sub-keys, partially aggregate, then re-aggregate
    without the salt.

    For additive aggregates (count/sum/min/max) the result is
    IDENTICAL to a direct groupBy — the salt only reshapes the
    shuffle: a hot key that would hammer one reducer spreads across
    ``salt_buckets`` of them, each partial fitting in memory. This is
    the manual fallback when AQE skew handling can't apply (e.g.
    first-stage aggregations, which AQE skew-join doesn't cover).
    ``sum_cols`` maps input col -> output alias; a __count__ entry
    yields a row count.
    """
    salt_src = salt_source or key_cols[0]
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_src), F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial_aggs = [F.count(F.lit(1)).alias("_pc")] + [
        F.sum(src).alias(f"_ps_{alias}") for src, alias in sum_cols.items() if src != "__count__"
    ]
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    final_aggs = []
    for src, alias in sum_cols.items():
        if src == "__count__":
            final_aggs.append(F.sum("_pc").alias(alias))
        else:
            final_aggs.append(F.sum(f"_ps_{alias}").alias(alias))
    return partial.groupBy(*key_cols).agg(*final_aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the ``value_col`` of the most
    recent right row with ``right_ts <= left_ts`` and equal keys
    (left-join semantics: no prior right row -> NULL).

    Spark has no native ASOF JOIN; a range join would be O(n*m) per
    key. This is the scalable *union trick*: interleave both sides,
    sort by (key, ts) once, and carry the latest right value forward
    with ``last(ignorenulls)`` over an unbounded-preceding window —
    ONE shuffle on the key, linear scan within partitions, no range
    explosion. The 100 TB plan for temporal enrichment.

    At equal timestamps the right row sorts first (side 0 < side 1),
    i.e. `<=` semantics — matching e.g. DuckDB's ASOF JOIN.
    """
    out_col = out_col or value_col
    val_type = dict(right.dtypes)[value_col]
    l = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_val", F.lit(None).cast(val_type))
    r = (
        right.select(*on, F.col(right_ts).alias("_ts"), F.col(value_col).alias("_val"))
        .withColumn("_side", F.lit(0))
    )
    combined = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        combined.withColumn(out_col, F.last("_val", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_ts", "_side", "_val")
    )


def lag_delta(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """Analytic lag: difference between a value and its predecessor
    within the partition (per-entity time-series delta). One shuffle on
    ``partition_cols``, sort within partitions."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))
