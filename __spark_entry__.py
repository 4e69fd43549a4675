"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline's
windowed city-metrics aggregation, /root/reference/spark_jobs/
streaming_job.py:117-125) on sf0.001. ``queries()`` / ``oracle_sql()``
expose the full operator registry from
``real_time_ride_hailing_data_pipeline_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from real_time_ride_hailing_data_pipeline_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.all_queries()["city_window_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; fuzzy/non-SQL ops are omitted
    (driver records a rows-only check for those)."""
    return q.all_oracles()
