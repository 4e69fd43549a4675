"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic ride-event source, partition-parallel.

Why it exists: the reference's only source is Kafka (S1); the engine's
source surface additionally covers parquet (batch + stream), CSV,
JSON-lines, the rate generator — and, here, the Spark 4 Python
DataSource API, the sanctioned way to attach a source that has no JVM
connector (an internal service, a bespoke format). The read path runs
Python per partition — the slow path by design, for connectors, never
for transforms — and parallelizes across ``partitions`` input splits.

Determinism contract: every field derives from the row id via md5, so
the exact same rows can be produced by any engine — the DuckDB oracle
regenerates them with generate_series + the same nibble arithmetic,
which is what makes a *custom Python source* value-hash checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CITIES = [
    "New York",
    "Los Angeles",
    "Chicago",
    "Houston",
    "Phoenix",
    "Philadelphia",
    "San Antonio",
    "San Diego",
    "Dallas",
    "San Jose",
]

SCHEMA = "event_id bigint, city string, fare_cents bigint"

# Shared default row count: with no options, the batch read and the
# fully-drained stream read of this source produce the SAME event
# space (batch/streaming parity holds for defaults, not just for
# explicitly-matched options).
DEFAULT_N = 10_000


def _fare_cents(event_id: int) -> int:
    """fare in [5.00, 150.00): 500 + (first 12 md5 hex digits of the
    decimal id) mod 14500 — reproducible in SQL on any engine."""
    h = int(hashlib.md5(str(event_id).encode()).hexdigest()[:12], 16)
    return 500 + h % 14500


class RideEventsPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class RideEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", DEFAULT_N))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = (self.n + self.num_partitions - 1) // self.num_partitions
        return [
            RideEventsPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: RideEventsPartition):
        """Yield ``pyarrow.RecordBatch``es (Spark 4's Arrow lane for
        Python data sources): rows cross to the JVM as columnar
        batches instead of per-row Python tuples — the md5 derivation
        is inherently per-value, but the per-row tuple conversion and
        row-by-row pickling disappear (VERDICT r9 item 5). Batches are
        capped at 64k rows to bound executor memory."""
        import pyarrow as pa

        step = 65_536
        for lo in range(partition.start, partition.end, step):
            ids = range(lo, min(lo + step, partition.end))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([CITIES[i % len(CITIES)] for i in ids]),
                    pa.array([_fare_cents(i) for i in ids], pa.int64()),
                ],
                names=["event_id", "city", "fare_cents"],
            )


class RideEventsStreamReader(SimpleDataSourceStreamReader):
    """Spark 4 STREAMING Python data source (the
    ``SimpleDataSourceStreamReader`` API — driver-side reads with
    dict-shaped offsets tracked in the checkpoint log, the sanctioned
    way to stream from a system with no JVM connector).

    Deterministic and bounded: batch k serves rows
    ``[k*rows_per_batch, ...)`` of the same md5-derived event space as
    the batch reader, up to a hard cap — after the cap every read
    returns an empty slice with an unchanged offset, so
    ``processAllAvailable()`` terminates and the materialized result
    is exactly rows ``[0, n)`` regardless of trigger timing. That is
    what makes a custom Python STREAM source value-hash oracle-able.
    """

    def __init__(self, options: dict) -> None:
        self.cap = int(options.get("n", DEFAULT_N))
        self.rows_per_batch = int(options.get("rows_per_batch", 1_000))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.rows_per_batch, self.cap)
        return self._slice(lo, hi), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed range after restart
        return self._slice(int(start["offset"]), int(end["offset"]))

    @staticmethod
    def _slice(lo: int, hi: int):
        return iter(
            [(eid, CITIES[eid % len(CITIES)], _fare_cents(eid)) for eid in range(lo, hi)]
        )


class RideEventsDataSource(DataSource):
    """``spark.read.format("ride_events_py").option("n", ...)`` —
    and ``spark.readStream.format("ride_events_py")`` for the
    streaming reader."""

    @classmethod
    def name(cls) -> str:
        return "ride_events_py"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> RideEventsReader:
        return RideEventsReader(self.options)

    def simpleStreamReader(self, schema) -> RideEventsStreamReader:
        return RideEventsStreamReader(self.options)


def register(spark) -> None:
    """Register the source, shipping this module BY VALUE: the
    DataSource instance is cloudpickled to Python worker processes,
    which import the defining module by name — but workers don't
    inherit a driver-side sys.path mutation (the engine may be loaded
    from a plain checkout, as the correctness driver does). Pickling
    the module by value removes the import requirement entirely."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(RideEventsDataSource)
