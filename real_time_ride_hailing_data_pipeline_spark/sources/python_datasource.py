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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        self.n = int(options.get("n", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = (self.n + self.num_partitions - 1) // self.num_partitions
        return [
            RideEventsPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: RideEventsPartition) -> Iterator[tuple]:
        for eid in range(partition.start, partition.end):
            yield (eid, CITIES[eid % len(CITIES)], _fare_cents(eid))


class RideEventsDataSource(DataSource):
    """``spark.read.format("ride_events_py").option("n", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "ride_events_py"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> RideEventsReader:
        return RideEventsReader(self.options)


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
