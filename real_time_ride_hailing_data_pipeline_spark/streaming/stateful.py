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
    state awaiting the event-time timeout."""
    import pandas as pd  # executors

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

        ts_us = sorted(
            int(t.value // 1000)
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = 0, 0, 0
        closed: list[tuple[int, int, int]] = []
        gap_us = gap_seconds * 1_000_000
        for t in ts_us:
            if n == 0:  # no open session
                start_us, last_us, n = t, t, 1
            elif t - last_us >= gap_us:  # gap closes the open session
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:  # extends the open session
                last_us, n = t, n + 1
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
