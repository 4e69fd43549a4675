"""PySpark-native analytics engine with the query and data-processing
capabilities of moaskary/Real_Time_Ride_Hailing_Data_Pipeline.

The reference is a Kafka -> Spark Structured Streaming -> Postgres
ride-hailing pipeline (see /root/reference/spark_jobs/streaming_job.py).
This engine re-expresses that surface — and a full relational +
LLM-data-pipeline operator library — as idiomatic Spark DataFrame /
SQL / Structured Streaming code designed for a 1000-executor, 100 TB
deployment while remaining testable on local[N].

Layout:
    session.py    SparkSession factory (scale-aware config)
    catalog.py    test-data table loader / temp-view registration
    queries.py    registry: every operator as (PySpark fn, oracle SQL)
    functions/    exact cross-engine arithmetic builders
    sources/      batch + streaming source adapters (parquet, JSON-wire,
                  synthetic ride-event generator, Kafka import-guarded)
    operators/    the query library: ride pipeline, relational ops,
                  dedup, similarity, text analysis, multimodal
    streaming/    watermarked streaming jobs + idempotent upsert sink
    plans/        plan-inspection helpers (pushdown / broadcast asserts)
"""

from real_time_ride_hailing_data_pipeline_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
