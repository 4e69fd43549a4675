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


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zone TIMESTAMP (LTZ),
    whatever parquet physical encoding the fixture was written with.

    The driver has regenerated ``events.parquet`` across rounds with
    different encodings, so this is schema-driven, not assumed:

    - ``bigint``        — parquet TIMESTAMP(NANOS) read as long under
      ``spark.sql.legacy.parquet.nanosAsLong``; rebuild with exact
      integer arithmetic (nanos DIV 1000 == DuckDB's nanos->micros
      truncation).
    - ``timestamp_ntz`` — parquet ``timestamp[us]`` without a zone
      (Spark 4 reads it as TIMESTAMP_NTZ). Under the UTC session the
      plain cast is value-identical to the DuckDB oracle's naive-UTC
      reading, and yields the LTZ type that ``withWatermark`` requires
      (NTZ is not a legal event-time type).
    - ``timestamp``     — already LTZ; pass through.

    This is the ONLY place in the engine that touches event-time dtype
    logic; batch (``load_table``), streaming (``streaming/job.py``) and
    generator paths all route here.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Applied for every table (not just events) so results never depend
    # on table-load order; idempotent, works under the driver's session.
    configure_runtime(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_time(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
