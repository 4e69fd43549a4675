"""Deterministic sampling / splitting operators for training-data
pipelines: hash-based train/val/test splits, per-group stratified
sampling, and weighted corpus mixing.

All three share one primitive — a uniform bucket in [0, buckets)
derived from ``md5(salt || id)`` — built from pure column expressions:
JVM whole-stage codegen, map-only, zero shuffle, no RNG state. That
buys the properties a 100 TB split actually needs and
``df.randomSplit`` / ``df.sample`` cannot give:

* **Reproducible**: the same (salt, id) always lands in the same
  split, across runs, partitionings, cluster sizes, and engines
  (Spark's sample is seeded per-partition — adding an executor or
  re-bucketing the input reassigns rows).
* **Stable under growth**: appending new data never moves an existing
  row between train and test (no leakage when the corpus is rebuilt).
* **Auditable**: membership is a WHERE clause any engine can
  re-evaluate — which is also what makes these operators
  oracle-checkable against DuckDB.

The salt namespaces independent decisions (split vs mix vs sample)
so they are statistically independent of each other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: str | Column, salt: str, buckets: int = BUCKETS) -> Column:
    """Uniform bucket in [0, buckets): first 32 md5 bits of
    ``salt || id`` reduced mod buckets. Map-only, codegen'd."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    digest = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    ``splits`` is an ordered list of (name, weight); weights sum to 1.
    The assignment column is ``split``. Weights are applied as
    cumulative thresholds over BUCKETS, so resolution is 1/BUCKETS
    (0.01%)."""
    b = hash_bucket(id_col, salt)
    cum = 0.0
    expr: Column | None = None
    for name, w in splits[:-1]:
        cum += w
        cond = b < F.lit(int(round(cum * BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", assigned)


def stratified_sample(
    df: DataFrame, group_col: str, id_col: str, k: int, salt: str = "strat-v1"
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group
    by ``md5(salt || id)`` (a uniform random order that is the same
    on every run/engine) and keep the first ``k``.

    One shuffle on the group key; ``WindowGroupLimit`` pushes the
    top-k below the sort at the executor, so no group is fully
    sorted — per-partition heaps of size k, exactly the grouped
    top-k physical shape."""
    digest = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(digest, F.col(id_col))
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def weighted_mix(
    df: DataFrame,
    source_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Down-sample each source to its target rate (the corpus-mixing
    step of a training-data pipeline: e.g. keep 100% of curated text,
    25% of web crawl). Membership is per-row deterministic
    (bucket < rate * BUCKETS), so re-runs and engine ports agree
    row-for-row; filtering is map-only and pushes to the scan."""
    b = hash_bucket(id_col, salt)
    rate: Column = F.lit(default_rate)
    for name, r in rates.items():
        rate = F.when(F.col(source_col) == name, F.lit(r)).otherwise(rate)
    return df.filter(b < (rate * BUCKETS).cast("bigint"))


def dsir_importance_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_cond: Column,
    buckets: int = 1024,
    salt: str = "dsir-v1",
    gumbel_salt: str = "dsir-g",
) -> DataFrame:
    """DSIR-style importance weights + resampling scores (Data
    Selection via Importance Resampling, Xie et al. 2023): score every
    document by how much more likely its hashed bag-of-words is under
    the TARGET distribution (rows matching ``target_cond``) than under
    the RAW corpus, then add a deterministic Gumbel so top-k by score
    IS sampling-without-replacement proportional to the importance
    weight — the standard pretraining-corpus selection recipe.

    Distributed shape (all JVM expressions, three shuffles total, none
    keyed on anything wider than the hash-bucket/doc id):

    1. tokenize + hash each term into ``buckets`` buckets (map-only);
    2. ONE grouped count over buckets yields both models (raw count,
       target count via a conditional sum) — the model is O(buckets),
       not O(vocabulary), which is the entire point of hashed DSIR at
       100 TB;
    3. per-bucket Laplace-smoothed log-ratio in MICRO FIXED POINT
       (floor at 1e-6 — per-term integer scores make the per-doc sum
       order-independent and engine-portable);
    4. broadcast the O(buckets) ratio table back onto the token
       stream, one grouped integer sum per doc;
    5. Gumbel perturbation from the md5 bucket of the doc id (same
       primitive as hash_split: reproducible, growth-stable).

    Returns (id_col, logw_micro, score_micro) — one row per document
    that has at least one token.

    Residual portability risk (ADVICE r10, documented by design): the
    micro fixed point makes the per-doc SUM order-independent, but the
    per-bucket ``floor(ln(...) * 1e6)`` itself is computed by the
    engine's libm — a 1-ulp ``log()`` difference between two engines
    at a value landing EXACTLY on a micro boundary could flip one
    bucket's integer by 1 (probability ~1e-10 per bucket for
    correctly-rounded libms; zero observed across JVM/DuckDB at every
    shipped SF). Verification against a foreign engine should treat
    the micro scores as quantized-but-floating-derived: prefer the
    keep-SET comparison (top-k ids) or a ±1-micro tolerance over
    byte-exact hashing if an engine pair ever disagrees."""
    flagged = df.select(
        F.col(id_col),
        F.when(target_cond, F.lit(1)).otherwise(F.lit(0)).alias("__is_tgt"),
        F.col(text_col).alias("__text"),
    )
    toks = flagged.select(
        id_col,
        "__is_tgt",
        F.explode(
            F.split(F.trim(F.lower(F.col("__text"))), r"\s+")
        ).alias("__term"),
    )
    tb = toks.select(
        id_col,
        "__is_tgt",
        hash_bucket(F.col("__term"), salt, buckets).alias("__bucket"),
    )
    stats = tb.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__c_raw"),
        F.sum("__is_tgt").alias("__c_tgt"),
    )
    totals = stats.agg(
        F.sum("__c_raw").alias("__n_raw"), F.sum("__c_tgt").alias("__n_tgt")
    )
    ratio = stats.crossJoin(F.broadcast(totals)).select(
        "__bucket",
        F.floor(
            (
                F.log((F.col("__c_tgt") + 1.0) / (F.col("__n_tgt") + buckets))
                - F.log((F.col("__c_raw") + 1.0) / (F.col("__n_raw") + buckets))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("__r_micro"),
    )
    logw = (
        tb.join(F.broadcast(ratio), "__bucket")
        .groupBy(id_col)
        .agg(F.sum("__r_micro").alias("logw_micro"))
    )
    u = (
        hash_bucket(F.col(id_col), gumbel_salt, BUCKETS) + F.lit(0.5)
    ) / F.lit(float(BUCKETS))
    gumbel_micro = F.floor(-F.log(-F.log(u)) * 1_000_000).cast("bigint")
    return logw.select(
        id_col,
        "logw_micro",
        (F.col("logw_micro") + gumbel_micro).alias("score_micro"),
    )
