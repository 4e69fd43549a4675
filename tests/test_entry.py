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
