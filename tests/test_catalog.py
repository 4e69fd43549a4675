"""Fixture-boundary tests for catalog.normalize_event_time.

The driver regenerated ``events.parquet`` between rounds with a
different parquet timestamp encoding (TIMESTAMP(NANOS) in r1-r2,
``timestamp[us]``/NTZ in r3), which zeroed the r3 suite. This test
synthesizes every encoding the fixture has ever used — nanos-as-long,
micros-NTZ, micros-LTZ — and asserts the loader yields bit-identical
LTZ values for all three, so the next regeneration can't break the
engine again.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_ride_hailing_data_pipeline_spark import catalog

# Naive wall-clock instants; under the UTC session these are the
# oracle-visible values whatever the physical encoding.
_INSTANTS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 3, 15, 12, 34, 56, 789012),
    datetime.datetime(2024, 12, 31, 23, 59, 59, 999999),
]
_IDS = list(range(len(_INSTANTS)))


def _write(tmp_path, name: str, ts_array: pa.Array) -> str:
    table = pa.table({"event_id": pa.array(_IDS, pa.int64()), "ts": ts_array})
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, path)
    return path


@pytest.fixture(scope="module")
def encoded_paths(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ts_encodings")
    # Compute micros exactly from the epoch to avoid float rounding.
    epoch = datetime.datetime(1970, 1, 1)
    micros = [int((dt - epoch) / datetime.timedelta(microseconds=1)) for dt in _INSTANTS]
    return {
        "nanos_long": _write(
            tmp_path, "nanos", pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
        ),
        "micros_ntz": _write(tmp_path, "ntz", pa.array(micros, pa.timestamp("us"))),
        "micros_ltz": _write(
            tmp_path, "ltz", pa.array(micros, pa.timestamp("us", tz="UTC"))
        ),
    }


def _load_ts(spark, path: str) -> list:
    df = catalog.normalize_event_time(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp", (
        "normalize_event_time must yield session-zone TIMESTAMP (LTZ) — "
        "watermarks reject NTZ"
    )
    return [r["ts"] for r in df.orderBy("event_id").collect()]


def test_all_encodings_load_identically(spark, encoded_paths):
    loaded = {name: _load_ts(spark, p) for name, p in encoded_paths.items()}
    assert loaded["nanos_long"] == loaded["micros_ntz"] == loaded["micros_ltz"]
    # And they equal the original wall-clock instants (UTC session).
    assert loaded["micros_ntz"] == _INSTANTS


def test_load_table_events_is_ltz(spark, sf_dir):
    df = catalog.load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() == 1


def test_normalize_passthrough_non_ts(spark):
    # A frame without the column is returned unchanged.
    df = spark.range(3)
    assert catalog.normalize_event_time(df) is df
