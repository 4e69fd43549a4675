"""Scalar-function layer: exact cross-engine arithmetic (functions.exact)."""

from real_time_ride_hailing_data_pipeline_spark.functions.exact import (  # noqa: F401
    DUCKDB_DECIMAL_DOT,
    RATIO4,
    decimal_dot,
)
