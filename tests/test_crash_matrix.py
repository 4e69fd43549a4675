"""Fault-injection crash matrix for the upsert sink's write surface.

The targeted crash tests in test_streaming.py each pick ONE window
(mid-commit, between commit and snapshot, between schema publish and
overwrite). This matrix sweeps the whole orchestration layer: every
Python-side filesystem mutation (move/copytree/rmtree/replace/remove)
across a merge -> evolving merge -> delete -> merge sequence is a
potential crash point; after each simulated crash the sequence is
REPLAYED from the start (what a streaming restart does — epochs are
idempotent) and the final table, the snapshot log, and every
per-version read must equal the no-crash expectation.

JVM-side parquet writes are not interruptible from here; their
atomicity is delegated to the _SUCCESS/_EPOCH markers the
orchestration checks — which is exactly the layer this sweeps.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
    ParquetUpsertSink,
)

D1 = dt.datetime(2024, 1, 15, 10, 0)
D2 = dt.datetime(2024, 1, 16, 11, 0)


class SimulatedCrash(Exception):
    pass


class _FaultInjector:
    """Raise SimulatedCrash on the Nth instrumented filesystem op."""

    PATCHED = ["move", "copytree", "rmtree"]

    def __init__(self, monkeypatch):
        self.monkeypatch = monkeypatch
        self.count = 0
        self.crash_at: int | None = None

    def arm(self, crash_at: int | None):
        self.count = 0
        self.crash_at = crash_at

    def install(self):
        for name in self.PATCHED:
            orig = getattr(shutil, name)

            def wrapper(*a, _orig=orig, **k):
                self.count += 1
                if self.crash_at is not None and self.count >= self.crash_at:
                    raise SimulatedCrash(f"op #{self.count}")
                return _orig(*a, **k)

            self.monkeypatch.setattr(shutil, name, wrapper)
        orig_replace = os.replace

        def replace_wrapper(*a, **k):
            self.count += 1
            if self.crash_at is not None and self.count >= self.crash_at:
                raise SimulatedCrash(f"op #{self.count}")
            return orig_replace(*a, **k)

        self.monkeypatch.setattr(os, "replace", replace_wrapper)


def _steps(spark, sink):
    """The write sequence as per-epoch closures. A checkpointed
    restart replays ONLY the crashed epoch onward — earlier epochs'
    offsets are committed — so the harness resumes from the step that
    raised, never from scratch (a from-scratch replay would
    legitimately re-snapshot old epochs from the advanced table)."""
    return [
        lambda: sink.write_batch(
            spark.createDataFrame(
                [("a", D1, 10), ("b", D2, 20)],
                "k string, window_start timestamp, total bigint",
            ),
            0,
        ),
        lambda: sink.write_batch(  # schema evolution: adds fare_cents
            spark.createDataFrame(
                [("b", D2, 25, 777), ("c", D2, 30, 888)],
                "k string, window_start timestamp, total bigint, fare_cents bigint",
            ),
            1,
        ),
        lambda: sink.delete_keys(
            spark.createDataFrame(
                [("a", D1)], "k string, window_start timestamp"
            ),
            2,
        ),
        lambda: sink.write_batch(
            spark.createDataFrame(
                [("d", D2, 40, 999)],
                "k string, window_start timestamp, total bigint, fare_cents bigint",
            ),
            3,
        ),
    ]


EXPECTED_LIVE = {
    "b": (25, 777),
    "c": (30, 888),
    "d": (40, 999),
}
EXPECTED_AT = {
    0: {"a": (10, None), "b": (20, None)},
    1: {"a": (10, None), "b": (25, 777), "c": (30, 888)},
    2: {"b": (25, 777), "c": (30, 888)},
    3: EXPECTED_LIVE,
}


def _assert_final_state(spark, sink):
    live = {
        r["k"]: (r["total"], r.asDict().get("fare_cents"))
        for r in sink.read(spark).collect()
    }
    assert live == EXPECTED_LIVE
    assert sink.snapshots() == [0, 1, 2, 3]
    for epoch, want in EXPECTED_AT.items():
        got = {
            r["k"]: (r["total"], r.asDict().get("fare_cents"))
            for r in sink.read_at(spark, epoch).collect()
        }
        assert got == want, f"epoch {epoch}"
    typed = sorted(
        (r["change_type"], r["k"])
        for r in sink.read_changes_typed(spark, 1, 2).collect()
    )
    assert typed == [("delete", "a")]


def test_crash_matrix_every_fs_op_recovers(spark, tmp_path, monkeypatch):
    """Crash after the Nth orchestration-layer FS op, replay, assert
    the exact no-crash state — for a stride of crash points covering
    the whole sequence. A point where recovery diverges (lost
    partition, resurrected row, torn snapshot log) fails loudly with
    the op index."""
    injector = _FaultInjector(monkeypatch)
    injector.install()

    # measure the op budget of a clean run
    base = tmp_path / "baseline"
    sink = ParquetUpsertSink(
        str(base / "t"),
        key_cols=("k", "window_start"),
        snapshot_dir=str(base / "s"),
        schema_evolution=True,
        retries=0,
    )
    injector.arm(None)
    for step in _steps(spark, sink):
        step()
    total_ops = injector.count
    _assert_final_state(spark, sink)
    assert total_ops > 10  # the instrumentation actually sees the ops

    # dense early (creation/first-commit windows), stride-sampled after
    crash_points = list(range(1, min(13, total_ops + 1))) + list(
        range(13, total_ops + 1, 5)
    )
    for crash_at in crash_points:
        root = tmp_path / f"crash{crash_at}"
        sink = ParquetUpsertSink(
            str(root / "t"),
            key_cols=("k", "window_start"),
            snapshot_dir=str(root / "s"),
            schema_evolution=True,
            retries=0,
        )
        steps = _steps(spark, sink)
        injector.arm(crash_at)
        crashed_step = None
        for i, step in enumerate(steps):
            try:
                step()
            except SimulatedCrash:
                crashed_step = i
                break
        assert crashed_step is not None, f"op budget moved? crash_at={crash_at}"
        injector.arm(None)
        for step in steps[crashed_step:]:  # checkpointed-restart replay
            step()
        try:
            _assert_final_state(spark, sink)
        except AssertionError as exc:
            raise AssertionError(
                f"divergence after crash at FS op #{crash_at} "
                f"(step {crashed_step}): {exc}"
            ) from exc
