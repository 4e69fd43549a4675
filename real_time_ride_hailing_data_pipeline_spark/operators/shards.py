"""Training-shard writer: materialize a corpus as N balanced shard
directories per split — the hand-off format a training job actually
reads.

Why not just ``df.write.parquet``: task-count output gives however
many files the previous stage had (thousands of small files after a
shuffle, or a handful of huge ones after a coalesce), and training
dataloaders want a FIXED number of similar-sized shards per split for
deterministic epoch sharding across data-parallel workers.

Design:
- shard id = ``hash_bucket(id, salt) % n_shards`` (sampling.py) — the
  same deterministic hash family as the split itself, so shard
  membership is reproducible and append-stable, NOT ``rand()`` or
  round-robin (partition-order dependent).
- layout ``path/split=<s>/shard=<k>/`` via dynamic partitioning; the
  pre-write ``repartition`` is keyed on (split, shard), so each
  (split, shard) combination lives in exactly ONE task and writes
  exactly ONE file — file count is exact by construction, and the
  uniform shard hash keeps sizes balanced. At 100 TB the shuffle is
  the unavoidable cost of re-clustering and cannot skew (keys are
  uniform by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark.operators.sampling import hash_bucket


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    split_col: str = "split",
    salt: str = "shard-v1",
) -> None:
    """Write ``df`` as ``path/<split>=…/shard=<0..n_shards-1>/`` with
    exactly one parquet file per shard directory, sharded
    deterministically by id."""
    sharded = df.withColumn(
        "shard", (hash_bucket(id_col, salt) % F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, split_col, "shard")
        .write.mode("overwrite")
        .partitionBy(split_col, "shard")
        .parquet(path)
    )
