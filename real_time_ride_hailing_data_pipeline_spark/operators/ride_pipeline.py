"""The reference pipeline, re-expressed as composable Spark transforms.

Reference trace (/root/reference/spark_jobs/streaming_job.py):
  - ride-event JSON schema            streaming_job.py:78-96
  - binary->string cast + from_json   streaming_job.py:107-109   (P1-P3)
  - epoch-double -> timestamp cast    streaming_job.py:111       (P5)
  - 10-min watermark                  streaming_job.py:114       (T1)
  - 1-min tumbling window x city agg  streaming_job.py:117-125   (A1-A3, T2)
  - count(trip_id), avg(fare_amount)  streaming_job.py:123-124
  - projection/rename window.end ->   streaming_job.py:18-23     (P4)
    last_updated
  - legacy ISO-timestamp casts        streaming_job.py:211-213   (P6)

Every function here takes a DataFrame and returns a DataFrame, so the
same code path serves ``spark.read`` (batch backfill / testing) and
``spark.readStream`` (production) — batch/streaming parity is the core
Structured Streaming design point.

Scale notes: the windowed aggregation shuffles on (window, city).
City cardinality in the reference is 10 — a skew hazard at 100 TB
(hot cities dominate). AQE skew handling is enabled in session.py;
for the streaming path, state is partitioned by the full composite
key (window, city), so the number of distinct windows × cities bounds
state size, and the watermark evicts closed windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Consumer-declared ride-event schema (streaming_job.py:78-96). Lat/lon
# deliberately strings, pickup/dropoff ISO strings — matching the wire
# format the reference producer emits (run_producer.py:29-47).
LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("latitude", T.StringType()),
        T.StructField("longitude", T.StringType()),
    ]
)

RIDE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("trip_id", T.StringType()),
        T.StructField("driver_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("pickup_datetime", T.StringType()),
        T.StructField("dropoff_datetime", T.StringType()),
        T.StructField("pickup_location", LOCATION_SCHEMA),
        T.StructField("dropoff_location", LOCATION_SCHEMA),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("city", T.StringType()),
        T.StructField("event_timestamp", T.DoubleType()),
    ]
)

# Schema used when parsing with corrupt-record capture: PERMISSIVE mode
# needs the corrupt column declared inside the struct.
RIDE_EVENT_SCHEMA_WITH_CORRUPT = T.StructType(
    list(RIDE_EVENT_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
)


def parse_ride_events(
    raw: DataFrame,
    value_col: str = "value",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Kafka-wire bytes/string -> typed ride-event columns (P1-P3).

    The reference silently nulls malformed JSON (from_json PERMISSIVE,
    streaming_job.py:107-109, despite ProjectStory.txt:19 claiming
    validation). With ``keep_corrupt=True`` malformed payloads are
    retained in a ``_corrupt_record`` column for dead-lettering —
    the behavior the reference *intended*.
    """
    schema = RIDE_EVENT_SCHEMA_WITH_CORRUPT if keep_corrupt else RIDE_EVENT_SCHEMA
    json_str = F.col(value_col).cast("string")  # P1: binary -> string
    parsed = raw.select(
        F.from_json(
            json_str,
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("data")
    )
    return parsed.select("data.*")  # P3: struct flatten


def with_event_time(df: DataFrame, source_col: str = "event_timestamp") -> DataFrame:
    """Epoch-seconds double -> TimestampType event-time column (P5)."""
    return df.withColumn(source_col, F.col(source_col).cast(T.TimestampType()))


def with_trip_times(df: DataFrame) -> DataFrame:
    """ISO-8601 pickup/dropoff strings -> timestamps + trip duration (P6).

    Restores the legacy cast the reference dropped
    (streaming_job.py:211-213); duration enables trip-length analytics.
    """
    pickup = F.to_timestamp("pickup_datetime")
    dropoff = F.to_timestamp("dropoff_datetime")
    return (
        df.withColumn("pickup_ts", pickup)
        .withColumn("dropoff_ts", dropoff)
        .withColumn(
            "trip_duration_sec",
            (F.unix_timestamp(dropoff) - F.unix_timestamp(pickup)).cast("long"),
        )
    )


def city_window_metrics(
    df: DataFrame,
    time_col: str = "event_timestamp",
    key_col: str = "city",
    window_duration: str = "1 minute",
    slide_duration: str | None = None,
    id_col: str = "trip_id",
    fare_col: str = "fare_amount",
    watermark: str | None = None,
    exact_cents_avg: bool = False,
) -> DataFrame:
    """Tumbling (or sliding) window x key: trip count + average fare.

    The reference's core computation (A1-A3/T1-T3): 1-minute tumbling
    window, count(trip_id) AS total_trips, avg(fare_amount) AS
    average_fare. ``watermark`` applies only on streaming inputs
    (10 minutes in the reference, streaming_job.py:114); pass None for
    batch. Slide defaults to the window width (tumbling), matching
    window(col, "1 minute", "1 minute") at streaming_job.py:119.

    The plan Spark produces: partial HashAggregate per input partition
    -> exchange on (window, key) -> final HashAggregate (streaming:
    merged with the state store). Map-side partial aggregation means
    shuffle volume is O(|windows| x |cities|) per partition, not O(rows)
    — the property that makes this viable at 100 TB.

    ``exact_cents_avg=True`` computes ``average_fare`` in exact integer
    arithmetic: fares are 2-decimal currency (the sink column is
    NUMERIC(10,2), reference infra/init.sql:5), so each fare is an exact
    integer number of cents; the average rounded half-up to the cent is
    ``(2*sum_cents + n) DIV (2*n) / 100``. Unlike ``round(avg(double),
    2)``, this is deterministic across engines and summation orders —
    float avg lands on half-cent boundaries for small groups and rounds
    differently in different engines (IEEE-754 vs decimal half-up).
    The shuffle shape is identical (partial sum+count map-side).
    """
    if watermark is not None:
        df = df.withWatermark(time_col, watermark)
    win = F.window(F.col(time_col), window_duration, slide_duration or window_duration)
    if exact_cents_avg:
        df = df.withColumn("_fare_cents", F.round(F.col(fare_col) * 100).cast("long"))
        return (
            df.groupBy(win.alias("window"), F.col(key_col))
            .agg(
                F.count(id_col).alias("total_trips"),
                F.sum("_fare_cents").alias("_sum_cents"),
                F.count(fare_col).alias("_n_fares"),
            )
            .withColumn(
                "average_fare",
                F.expr("(2 * _sum_cents + _n_fares) DIV (2 * _n_fares)") / 100.0,
            )
            .drop("_sum_cents", "_n_fares")
        )
    return df.groupBy(win.alias("window"), F.col(key_col)).agg(
        F.count(id_col).alias("total_trips"),
        F.avg(fare_col).alias("average_fare"),
    )


def to_city_metrics_output(df: DataFrame, key_col: str = "city") -> DataFrame:
    """Final projection (P4): flatten the window struct, rename
    window.end -> last_updated (streaming_job.py:18-23), round the
    average to the sink's NUMERIC(10,2) scale (infra/init.sql:5 — the
    reference leaves rounding to Postgres; we make it explicit)."""
    return df.select(
        F.col(key_col),
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("last_updated"),
        F.col("total_trips"),
        F.round(F.col("average_fare"), 2).alias("average_fare"),
    )


def ride_pipeline_batch(raw: DataFrame, keep_corrupt: bool = False) -> DataFrame:
    """Full reference pipeline, batch form: parse -> cast -> window agg
    -> output projection. Identical transforms run the streaming form
    (streaming/job.py adds watermark + sink)."""
    df = parse_ride_events(raw, keep_corrupt=keep_corrupt)
    if keep_corrupt:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    df = with_event_time(df)
    agg = city_window_metrics(df)
    return to_city_metrics_output(agg)


def events_to_ride_wire(
    events: DataFrame, corrupt_every: int | None = None
) -> DataFrame:
    """Deterministically map the driver's `events` fixture onto the
    reference producer's JSON wire format (run_producer.py:29-47 ->
    json.dumps().encode() :60): one binary ``value`` column.

    Purpose: give the parse path (P1-P3/P5/P6, F1/F5) an
    oracle-checkable round trip — every wire field derives from
    `events` columns, so a DuckDB query over `events` predicts the
    parsed-and-aggregated output exactly. ``corrupt_every=N`` mangles
    every Nth record (by event_id) to exercise the corrupt-record
    capture path.

    Field mapping (all deterministic):
      trip_id       = event_id as string     fare_amount = value
      driver_id     = 'd-' || user_id        tip_amount  = round(value/10, 2)
      customer_id   = 'c-' || user_id        city        = event_type
      pickup        = ts truncated to second (ISO)
      dropoff       = pickup + (event_id % 3600 + 300) sec
      locations     = lat/lon strings derived from user_id
      event_timestamp = epoch seconds (double) of ts
    """
    fmt = "yyyy-MM-dd'T'HH:mm:ss"
    pickup = F.date_trunc("second", F.col("ts"))
    duration_s = (F.pmod(F.col("event_id"), F.lit(3600)) + 300).cast("long")
    dropoff = F.timestamp_seconds(F.unix_timestamp(pickup) + duration_s)
    loc = lambda seed_off: F.struct(  # noqa: E731
        (F.pmod(F.col("user_id") + seed_off, F.lit(180)) - 90).cast("string").alias("latitude"),
        (F.pmod(F.col("user_id") * 7 + seed_off, F.lit(360)) - 180).cast("string").alias("longitude"),
    )
    wire = events.select(
        F.to_json(
            F.struct(
                F.col("event_id").cast("string").alias("trip_id"),
                F.concat(F.lit("d-"), F.col("user_id")).alias("driver_id"),
                F.concat(F.lit("c-"), F.col("user_id")).alias("customer_id"),
                F.date_format(pickup, fmt).alias("pickup_datetime"),
                F.date_format(dropoff, fmt).alias("dropoff_datetime"),
                loc(0).alias("pickup_location"),
                loc(13).alias("dropoff_location"),
                F.col("value").alias("fare_amount"),
                F.round(F.col("value") / 10, 2).alias("tip_amount"),
                F.col("event_type").alias("city"),
                F.col("ts").cast("double").alias("event_timestamp"),
            )
        ).alias("json"),
        F.col("event_id"),
    )
    if corrupt_every is not None:
        wire = wire.withColumn(
            "json",
            F.when(
                F.pmod(F.col("event_id"), F.lit(corrupt_every)) == 0,
                F.concat(F.lit("#corrupt#"), F.col("json")),
            ).otherwise(F.col("json")),
        )
    return wire.select(F.col("json").cast("binary").alias("value"))


def city_running_totals(metrics: DataFrame, key_col: str = "city") -> DataFrame:
    """Per-city running totals over windowed metrics — the quantity the
    reference accumulates *in the sink* (Postgres additive upsert,
    streaming_job.py:41-42). In-engine this is a second aggregation
    over the windowed results, which is idempotent under replay
    (unlike the reference's sink-side addition, which double-counts on
    restart: no checkpoint + startingOffsets=earliest, SURVEY §4)."""
    return metrics.groupBy(key_col).agg(
        F.sum("total_trips").alias("total_trips"),
        F.max("last_updated").alias("last_updated"),
    )
