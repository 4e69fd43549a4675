"""Source-adapter tests: the Kafka adapters' guarded surface and a
CSV source round trip (spark.read.csv with explicit schema equals the
parquet-derived truth).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark import catalog
from real_time_ride_hailing_data_pipeline_spark.sources import kafka as ka

SF = "/root/testdata/sf0.001"


def test_kafka_adapters_fail_loudly_without_classpath(spark):
    """S1/S3: with no spark-sql-kafka on the classpath the adapters
    must raise the explicit KafkaUnavailableError at construction —
    not a cryptic failure at stream start."""
    with pytest.raises(ka.KafkaUnavailableError, match="spark.jars.packages"):
        ka.kafka_ride_stream(spark, broker="localhost:9092")
    events = catalog.load_table(spark, SF, "events")
    with pytest.raises(ka.KafkaUnavailableError):
        ka.write_stream_to_kafka(events, "localhost:9092", "t", "/tmp/ck")


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV source surface: events materialized to CSV (timestamps as
    exact epoch micros, money as exact cents — no float formatting in
    the text round trip) read back with an explicit schema must
    aggregate identically to the parquet original."""
    events = catalog.load_table(spark, SF, "events")
    csv_dir = str(tmp_path / "events_csv")
    events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    ).write.option("header", True).mode("overwrite").csv(csv_dir)

    back = (
        spark.read.option("header", True)
        .schema("event_id long, ts_us long, user_id long, event_type string, value_c long")
        .csv(csv_dir)
        .select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
            (F.col("value_c") / 100.0).alias("value"),
        )
    )
    agg = lambda df: {  # noqa: E731
        tuple(r)
        for r in df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .collect()
    }
    assert agg(back) == agg(events)


def test_python_stream_reader_offsets_and_replay():
    """SimpleDataSourceStreamReader contract: monotone capped offsets,
    deterministic slices, and readBetweenOffsets (the restart-replay
    path) regenerating exactly the committed range."""
    from real_time_ride_hailing_data_pipeline_spark.sources.python_datasource import (
        RideEventsStreamReader,
    )

    r = RideEventsStreamReader({"n": 25, "rows_per_batch": 10})
    off = r.initialOffset()
    assert off == {"offset": 0}
    batches = []
    for _ in range(5):  # two past exhaustion
        it, off = r.read(off)
        batches.append(list(it))
    assert [len(b) for b in batches] == [10, 10, 5, 0, 0]
    assert off == {"offset": 25}  # capped, never advances past n
    all_rows = [row for b in batches for row in b]
    assert [row[0] for row in all_rows] == list(range(25))
    # replay of the middle committed range is byte-identical
    replay = list(r.readBetweenOffsets({"offset": 10}, {"offset": 20}))
    assert replay == batches[1]
