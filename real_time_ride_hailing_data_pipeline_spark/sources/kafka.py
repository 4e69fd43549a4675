"""Kafka source/sink adapters (S1/S3), import-guarded.

The test container has no Kafka broker and no spark-sql-kafka package,
so these functions only *construct* readers/writers; they raise a clear
error if the Kafka data source is unavailable. The call signatures
mirror the reference exactly:

  source: readStream.format("kafka").option("kafka.bootstrap.servers",
          broker).option("subscribe", topic)
          .option("startingOffsets", "earliest")
          (/root/reference/spark_jobs/streaming_job.py:99-104)
  sink:   KafkaProducer JSON loop (/root/reference/producer/
          run_producer.py:58-61) -> writeStream.format("kafka") with
          to_json(struct(*)) — rate limiting via maxOffsetsPerTrigger
          instead of sleep().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KafkaUnavailableError(RuntimeError):
    pass


def _require_kafka(spark: SparkSession) -> None:
    try:
        # Cheap classpath probe: resolves only if spark-sql-kafka is on
        # the classpath.
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise KafkaUnavailableError(
            "Kafka data source not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10 via spark.jars.packages"
        ) from exc


def kafka_ride_stream(
    spark: SparkSession,
    broker: str,
    topic: str = "ride_events",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a ride-event topic (S1)."""
    _require_kafka(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def write_stream_to_kafka(
    df: DataFrame,
    broker: str,
    topic: str,
    checkpoint_location: str,
):
    """Streaming JSON sink to Kafka (S3). Caller starts the query."""
    _require_kafka(df.sparkSession)
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )
