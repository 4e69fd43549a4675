"""Unit tests for the ride-event generator (S2) and the wire parse
path — the distribution contract of run_producer.py:21-47 and the
JSON round trip (the oracle-checked registry queries cover value-level
parse fidelity; these cover the random generator the oracles can't).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark.operators import ride_pipeline as rp
from real_time_ride_hailing_data_pipeline_spark.sources import generator as gen

N = 2_000


def test_generator_distribution_contract(spark):
    df = gen.ride_events_batch(spark, n=N).cache()
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("city").alias("n_cities"),
        F.min("fare_amount").alias("min_fare"),
        F.max("fare_amount").alias("max_fare"),
        F.min("tip_amount").alias("min_tip"),
        F.max("tip_amount").alias("max_tip"),
        F.countDistinct("trip_id").alias("n_trips"),
    ).first()
    assert stats["n"] == N
    assert stats["n_trips"] == N  # uuid() unique per row
    assert stats["n_cities"] == len(gen.CITIES)
    assert 5 <= stats["min_fare"] and stats["max_fare"] <= 150  # run_producer.py:43
    assert 0 <= stats["min_tip"] and stats["max_tip"] <= 50  # run_producer.py:44
    cities = {r["city"] for r in df.select("city").distinct().collect()}
    assert cities == set(gen.CITIES)
    durations = rp.with_trip_times(df).select("trip_duration_sec")
    bad = durations.filter(
        (F.col("trip_duration_sec") < 5 * 60) | (F.col("trip_duration_sec") > 60 * 60)
    ).count()
    assert bad == 0  # run_producer.py:25: 5-60 minutes
    df.unpersist()


def test_generator_wire_roundtrip_parses_clean(spark):
    """generator -> to_json wire (F5) -> parse (P1-P3): every record
    parses, none corrupt, schema fields survive."""
    wire = gen.ride_events_as_json(gen.ride_events_batch(spark, n=500))
    parsed = rp.parse_ride_events(wire, keep_corrupt=True)
    agg = parsed.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("trip_id").alias("parsed"),
        F.count("_corrupt_record").alias("corrupt"),
    ).first()
    assert agg["total"] == 500 and agg["parsed"] == 500 and agg["corrupt"] == 0
    row = rp.with_event_time(parsed).select("event_timestamp", "pickup_location").first()
    assert row["event_timestamp"] is not None  # P5 cast applied
    assert row["pickup_location"]["latitude"] is not None  # nested struct survived


def test_full_pipeline_batch_on_generator(spark):
    """ride_pipeline_batch end-to-end on generated wire: windows x
    cities with positive counts and fares inside the generator range."""
    wire = gen.ride_events_as_json(gen.ride_events_batch(spark, n=1_000))
    out = rp.ride_pipeline_batch(wire)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["total_trips"] > 0 for r in rows)
    assert all(5 <= r["average_fare"] <= 150 for r in rows)
    assert set(out.columns) == {
        "city", "window_start", "last_updated", "total_trips", "average_fare",
    }


def test_observe_parse_health_single_pass_metrics(spark):
    """observability.observe_parse_health: row/corrupt counters ride
    along the normal action (no extra scan). 500 clean + 3 malformed
    wire records -> n_rows=503, n_corrupt=3 from the SAME job that
    computed the aggregate."""
    from real_time_ride_hailing_data_pipeline_spark.observability import (
        observe_parse_health,
    )

    wire = gen.ride_events_as_json(gen.ride_events_batch(spark, n=500)).select("value")
    # note: an EMPTY string is parsed to a null row, not a corrupt
    # record (from_json PERMISSIVE semantics) — use malformed payloads
    broken = spark.createDataFrame(
        [("{not json",), ('{"trip_id": 1,',), ("[1,2,3]",)], "value string"
    )
    parsed = rp.parse_ride_events(wire.unionByName(broken), keep_corrupt=True)
    observed, obs = observe_parse_health(parsed)
    n_ok = observed.filter(F.col("trip_id").isNotNull()).count()  # the real action
    assert n_ok == 500
    metrics = obs.get
    assert metrics["n_rows"] == 503
    assert metrics["n_corrupt"] == 3
