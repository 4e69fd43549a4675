"""Unit tests for bench.py's harness helpers (no SparkSession): the
streaming machinery/operator split accounting and its zero-overhead
guarantee for batch queries."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import drain_listener  # noqa: E402


class _FakeListener:
    def __init__(self) -> None:
        self.events = 0
        self.trigger_ms = 0
        self.add_batch_ms = 0


def test_drain_is_noop_for_batch_queries():
    """A batch query (no new events, no 'stream' in the name) must not
    pay any poll sleep — 149 registry queries x even 0.1 s would add
    15 s of pure harness time to every bench run."""
    lst = _FakeListener()
    t0 = time.perf_counter()
    drain_listener(lst, baseline_events=0, name="tpch_q1_pricing_summary")
    assert time.perf_counter() - t0 < 0.05


def test_drain_waits_for_stability_then_returns():
    """When events arrived, drain polls until the count stops moving —
    and returns promptly once stable (well under the 2 s cap)."""
    lst = _FakeListener()
    lst.events = 3  # events already delivered during the query
    t0 = time.perf_counter()
    drain_listener(lst, baseline_events=0, name="streaming_city_metrics_replay")
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.0  # two stable polls, not the full 2 s timeout
