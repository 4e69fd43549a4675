"""Synthetic ride-event generator — Spark-native rebuild of the
reference's Faker producer (/root/reference/producer/run_producer.py:21-47).

The reference generates rows one at a time in a Python loop and ships
them through Kafka at 1-5 events/s. A Spark-first generator is a
*distributed projection*: ``spark.range(n)`` (batch) or the
``rate-micro-batch`` source (streaming) plus column expressions —
uuid(), rand(), element_at over a literal city array — producing
millions of events/s with zero Python in the row path.

Distribution parity with run_producer.py:
  - city       ~ uniform over the 10-city list   (run_producer.py:16-19,79)
  - duration   ~ uniform 5-60 minutes            (run_producer.py:25)
  - fare       ~ uniform 5-150, round 2          (run_producer.py:43)
  - tip        ~ uniform 0-50, round 2           (run_producer.py:44)
  - lat/lon    random coordinates as strings     (run_producer.py:35-42)
  - event_timestamp = now (epoch seconds float)  (run_producer.py:46)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CITIES = [
    "New York",
    "Los Angeles",
    "Chicago",
    "Houston",
    "Phoenix",
    "Philadelphia",
    "San Antonio",
    "San Diego",
    "Dallas",
    "San Jose",
]


def _ride_columns(seed_col: str, base_ts) -> list:
    """Column expressions shared by the batch and streaming generators.

    ``base_ts`` is a Column of epoch seconds (double) for the event
    time; pickup is up to 2h before it, dropoff = pickup + 5-60 min.
    """
    cities = F.array(*[F.lit(c) for c in CITIES])
    # element_at is 1-based; pmod keeps the index in range regardless of
    # how the seed column is produced.
    city = F.element_at(cities, (F.pmod(F.col(seed_col), F.lit(len(CITIES))) + 1).cast("int"))
    duration_s = (F.rand(1) * (60 - 5) * 60 + 5 * 60).cast("long")
    pickup_epoch = base_ts - (F.rand(2) * 7200).cast("long")
    dropoff_epoch = pickup_epoch + duration_s
    fmt = "yyyy-MM-dd'T'HH:mm:ss"
    return [
        F.expr("uuid()").alias("trip_id"),
        F.expr("uuid()").alias("driver_id"),
        F.expr("uuid()").alias("customer_id"),
        F.date_format(F.timestamp_seconds(pickup_epoch), fmt).alias("pickup_datetime"),
        F.date_format(F.timestamp_seconds(dropoff_epoch), fmt).alias("dropoff_datetime"),
        F.struct(
            F.format_number(F.rand(3) * 180 - 90, 6).alias("latitude"),
            F.format_number(F.rand(4) * 360 - 180, 6).alias("longitude"),
        ).alias("pickup_location"),
        F.struct(
            F.format_number(F.rand(5) * 180 - 90, 6).alias("latitude"),
            F.format_number(F.rand(6) * 360 - 180, 6).alias("longitude"),
        ).alias("dropoff_location"),
        F.round(F.rand(7) * (150 - 5) + 5, 2).alias("fare_amount"),
        F.round(F.rand(8) * 50, 2).alias("tip_amount"),
        city.alias("city"),
        base_ts.cast("double").alias("event_timestamp"),
    ]


def ride_events_batch(
    spark: SparkSession,
    n: int = 10_000,
    start_epoch: float = 1_700_000_000.0,
    events_per_second: float = 5.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batch generator: ``n`` events paced at ``events_per_second``
    starting from ``start_epoch`` — a deterministic-shape replay of the
    producer's infinite loop (run_producer.py:74-83). Partitioned via
    spark.range, so generation parallelizes across executors."""
    base = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    ts = F.lit(start_epoch) + F.col("id") / F.lit(events_per_second)
    return base.select(*_ride_columns("id", ts))


def ride_events_stream(
    spark: SparkSession,
    rows_per_second: int = 5,
) -> DataFrame:
    """Streaming generator on the ``rate`` source — the engine's
    broker-free stand-in for the Kafka producer (S2/S3). Same schema,
    same distributions, true event-time from the rate source clock."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    ts = F.col("timestamp").cast("double")
    return raw.select(*_ride_columns("value", ts))


def ride_events_as_json(df: DataFrame) -> DataFrame:
    """Serialize to the Kafka wire format the reference producer emits
    (run_producer.py:60: json.dumps(...).encode): a single binary
    ``value`` column."""
    return df.select(F.to_json(F.struct(*df.columns)).cast("binary").alias("value"))
