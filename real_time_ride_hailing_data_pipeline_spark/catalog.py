"""Test-data catalog: load the driver's parquet tables as DataFrames /
temp views.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet file
each under an sf directory.

At 100 TB these would be partitioned/bucketed external tables; the
loader keeps the access path identical (``spark.read.parquet``) so the
only change at scale is the path + partition layout. Every query in the
engine goes through here, which guarantees predicate pushdown and
column pruning apply at the scan (parquet v2 source).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Applied for every table (not just events) so results never depend
    # on table-load order; idempotent, works under the driver's session.
    configure_runtime(spark)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects outright. With nanosAsLong set (configure_runtime) the
        # column reads as long; rebuild the timestamp with exact integer
        # arithmetic — nanos DIV 1000 matches DuckDB's nanos->micros
        # truncation.
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
