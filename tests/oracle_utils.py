"""Local replica of the driver's oracle comparison: run a registry
query on Spark and its oracle SQL on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

from real_time_ride_hailing_data_pipeline_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise below the rounding we apply in queries
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def assert_driver_canonicalizable(name: str, sdf) -> None:
    """The correctness driver canonicalizes through pandas before
    hashing; array/map/struct columns break its ``factorize`` with
    'unhashable type' (the r6 collect_sorted_event_types failure).
    Registry queries must ship scalar columns — flatten arrays via
    ``array_join`` on both sides."""
    from pyspark.sql import types as T

    for f in sdf.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            raise AssertionError(
                f"{name}: driver-incompatible column "
                f"{f.name}:{f.dataType.simpleString()} — flatten it "
                "(array_join / to_json) before registering an oracle"
            )


def compare_query(spark, sf_dir: str, fn, sql: str, *, registry_name: str | None = None) -> None:
    sdf = fn(spark, sf_dir)
    if registry_name is not None:
        assert_driver_canonicalizable(registry_name, sdf)
    spark_cols = sorted(sdf.columns)
    spark_rows = sdf.collect()

    con = duckdb_conn(sf_dir)
    res = con.sql(sql)
    duck_cols = sorted(res.columns)
    duck_rows = res.fetchall()
    colmap_duck = {c: i for i, c in enumerate(res.columns)}

    assert spark_cols == duck_cols, f"columns differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count differs: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    def _key(t):
        # None-safe, mixed-type-safe ordering
        return tuple((v is None, str(type(v)), str(v)) for v in t)

    s_set = sorted(
        (tuple(_norm(row[c]) for c in spark_cols) for row in spark_rows), key=_key
    )
    d_set = sorted(
        (tuple(_norm(row[colmap_duck[c]]) for c in spark_cols) for row in duck_rows),
        key=_key,
    )
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mism, f"{len(mism)} value mismatches; first 3: {mism[:3]}"
