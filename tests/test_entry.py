"""Smoke the driver contract: entry() runs, queries()/oracle_sql()
keys line up, every oracle key has a query."""

from __future__ import annotations

import importlib.util
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "event_type",
        "window_start",
        "last_updated",
        "total_trips",
        "average_fare",
    }


def test_contract_keys():
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle keys without queries: {missing}"


def test_engine_self_configures_under_non_utc_session(spark):
    """The driver owns its SparkSession and may run under any local
    timezone; the engine must reach oracle-identical results anyway
    because catalog.load_table applies configure_runtime (UTC session
    tz) before any read. Probe: flip the session to America/New_York,
    load a non-events table first (conf order-independence), then
    re-run the flagship events query and compare against the UTC run."""
    from real_time_ride_hailing_data_pipeline_spark import catalog
    from real_time_ride_hailing_data_pipeline_spark import queries as q

    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.session.timeZone")
    baseline = {
        tuple(r) for r in q.all_queries()["city_window_metrics"](spark, sf).collect()
    }
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        catalog.load_table(spark, sf, "customer").limit(1).collect()
        got = {
            tuple(r)
            for r in q.all_queries()["city_window_metrics"](spark, sf).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == baseline
