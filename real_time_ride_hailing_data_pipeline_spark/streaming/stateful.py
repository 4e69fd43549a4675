"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 "(flat)MapGroupsWithState: absent" — the engine adds the
surface): a per-user sessionizer with explicit state.

``F.session_window`` already covers declarative sessionization
(queries.session_window_user_sessions); this operator exists for the
semantics the built-in can't express — custom state transitions,
emit-on-close, per-key timeout policy — which is exactly the
`applyInPandasWithState` niche (custom stateful operators per the
Structured Streaming design). The hot path is Arrow-batched pandas,
never row-at-a-time Python.

Scale: state is one small tuple per active user (session start, last
event, count); the stream shuffles once on user_id; watermark-driven
timeout (GroupStateTimeout.EventTimeTimeout) closes idle sessions and
frees state. On an availableNow replay each user's whole history
arrives in one group batch, so the emitted *closed* sessions equal the
batch gaps-and-islands result minus each user's final (still-open)
session — which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_last", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_epoch_us, session_last_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

GAP_SECONDS = 30 * 60

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_c", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful-processing successor to
    applyInPandasWithState (StatefulProcessor + typed ValueState).
    The engine exercises BOTH APIs: this one's explicit state handle
    supports multiple typed states, timers, and TTL per key.

    Update semantics: every batch emits each touched user's cumulative
    (count, value-cents, last event time); a keyed overwrite sink then
    holds exactly the per-user totals — the in-engine, idempotent form
    of the reference's additive sink accumulation
    (streaming_job.py:41-42).

    The processor class is defined inside this function ON PURPOSE:
    module-level classes are cloudpickled by reference and Python
    workers cannot import this module when the engine runs from a
    plain checkout (no sys.path propagation); a nested class is
    serialized by value.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total_c bigint, last_us bigint"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
            (user_id,) = key
            n, total_c, last_us = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total_c += int(pdf["value_c"].sum())
                last_us = max(
                    last_us, int(pd.to_datetime(pdf["ts"]).max().value // 1000)
                )
            self._state.update((n, total_c, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value_c": [total_c],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    prepared = events.select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def sessionize(
    events: DataFrame, gap_seconds: int = GAP_SECONDS, watermark: str = "1 hour"
) -> DataFrame:
    """Per-user custom sessionizer: emits each CLOSED session (a gap of
    >= ``gap_seconds`` follows it); the trailing open session stays in
    state awaiting the event-time timeout.

    Implementation: each Arrow chunk is sorted and collapsed to
    ``(start_us, last_us, n)`` session intervals with numpy, then the
    chunk intervals plus the stored open-session interval are merged by
    a sorted sweep. Two properties follow:

    * **Late events merge correctly.** An event arriving in a later
      micro-batch with a timestamp inside or before the open session
      (permitted within the watermark) merges into it — or forms its
      own earlier session if it is a full gap before — instead of
      dragging the open session's end backwards.
    * **Memory is O(sessions), not O(events).** A hot user replaying
      100k+ events folds chunk-by-chunk into a handful of interval
      tuples; no per-event Python list of the whole history is kept
      (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds each
      chunk, default 10k rows).
    """
    import numpy as np  # executors
    import pandas as pd

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_last": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        gap_us = gap_seconds * 1_000_000
        intervals: list[tuple[int, int, int]] = []
        if state.exists:
            start_us, last_us, n = state.get
            intervals.append((start_us, last_us, n))
        for pdf in pdfs:
            ts = np.sort(
                pd.to_datetime(pdf["ts"])
                .values.astype("datetime64[us]")
                .astype(np.int64)
            )
            if ts.size == 0:
                continue
            brk = np.nonzero(np.diff(ts) >= gap_us)[0]
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk, [ts.size - 1]))
            intervals.extend(
                (int(ts[s]), int(ts[e]), int(e - s + 1))
                for s, e in zip(starts, ends)
            )
        if not intervals:
            return
        intervals.sort()
        merged: list[tuple[int, int, int]] = [intervals[0]]
        for s, e, c in intervals[1:]:
            ps, pe, pc = merged[-1]
            if s - pe < gap_us:  # overlaps or within gap: same session
                merged[-1] = (ps, max(pe, e), pc + c)
            else:
                merged.append((s, e, c))
        closed = merged[:-1]
        start_us, last_us, n = merged[-1]
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_last": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
