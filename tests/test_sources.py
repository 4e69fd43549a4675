"""Source-adapter tests: the Kafka adapters' guarded surface and a
CSV source round trip (spark.read.csv with explicit schema equals the
parquet-derived truth).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark import catalog
from real_time_ride_hailing_data_pipeline_spark.sources import kafka as ka

SF = "/root/testdata/sf0.001"


def test_kafka_adapters_fail_loudly_without_classpath(spark):
    """S1/S3: with no spark-sql-kafka on the classpath the adapters
    must raise the explicit KafkaUnavailableError at construction —
    not a cryptic failure at stream start."""
    with pytest.raises(ka.KafkaUnavailableError, match="spark.jars.packages"):
        ka.kafka_ride_stream(spark, broker="localhost:9092")
    events = catalog.load_table(spark, SF, "events")
    with pytest.raises(ka.KafkaUnavailableError):
        ka.write_stream_to_kafka(events, "localhost:9092", "t", "/tmp/ck")


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV source surface: events materialized to CSV (timestamps as
    exact epoch micros, money as exact cents — no float formatting in
    the text round trip) read back with an explicit schema must
    aggregate identically to the parquet original."""
    events = catalog.load_table(spark, SF, "events")
    csv_dir = str(tmp_path / "events_csv")
    events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    ).write.option("header", True).mode("overwrite").csv(csv_dir)

    back = (
        spark.read.option("header", True)
        .schema("event_id long, ts_us long, user_id long, event_type string, value_c long")
        .csv(csv_dir)
        .select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
            (F.col("value_c") / 100.0).alias("value"),
        )
    )
    agg = lambda df: {  # noqa: E731
        tuple(r)
        for r in df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .collect()
    }
    assert agg(back) == agg(events)


def test_python_stream_reader_offsets_and_replay():
    """SimpleDataSourceStreamReader contract: monotone capped offsets,
    deterministic slices, and readBetweenOffsets (the restart-replay
    path) regenerating exactly the committed range."""
    from real_time_ride_hailing_data_pipeline_spark.sources.python_datasource import (
        RideEventsStreamReader,
    )

    r = RideEventsStreamReader({"n": 25, "rows_per_batch": 10})
    off = r.initialOffset()
    assert off == {"offset": 0}
    batches = []
    for _ in range(5):  # two past exhaustion
        it, off = r.read(off)
        batches.append(list(it))
    assert [len(b) for b in batches] == [10, 10, 5, 0, 0]
    assert off == {"offset": 25}  # capped, never advances past n
    all_rows = [row for b in batches for row in b]
    assert [row[0] for row in all_rows] == list(range(25))
    # replay of the middle committed range is byte-identical
    replay = list(r.readBetweenOffsets({"offset": 10}, {"offset": 20}))
    assert replay == batches[1]


def test_python_datasink_commit_protocol(spark, tmp_path):
    """The manifest-committed JSONL sink's two-phase commit
    (sources/python_datasink.py): task output is invisible until the
    driver publishes a manifest — orphan temp files (a crashed
    attempt) never surface; abort removes an attempt's files."""
    from real_time_ride_hailing_data_pipeline_spark.sources import (
        python_datasink as pdk,
        python_datasource as pds,
    )

    pds.register(spark)
    pdk.register(spark)
    out = str(tmp_path / "out")
    src = spark.read.format("ride_events_py").option("n", 500).load()
    src.write.format("jsonl_commit").option("path", out).mode("append").save()

    # a crashed attempt's orphan: present in the dir, absent from reads
    orphan = os.path.join(out, ".tmp-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write('{"event_id": 999999, "city": "Nowhere", "fare_cents": 1}\n')
    files = pdk.committed_files(out)
    assert orphan not in files
    rows = spark.read.schema(
        "event_id bigint, city string, fare_cents bigint"
    ).json(files)
    assert rows.count() == 500
    assert rows.filter(F.col("city") == "Nowhere").count() == 0

    # abort removes an attempt's temp files (None slots tolerated)
    tmp = os.path.join(out, ".tmp-abortme.jsonl")
    with open(tmp, "w") as f:
        f.write("{}\n")
    pdk._abort([None, pdk.JsonlCommitMessage(files=[tmp], rows=1)])
    assert not os.path.exists(tmp)

    # append mode APPENDS: a second batch write allocates the next
    # generation instead of colliding with (and replacing) the first
    src.limit(200).write.format("jsonl_commit").option("path", out).mode(
        "append"
    ).save()
    assert (
        spark.read.schema("event_id bigint, city string, fare_cents bigint")
        .json(pdk.committed_files(out))
        .count()
        == 700
    )

    # overwrite mode replaces previously committed generations
    src.limit(100).write.format("jsonl_commit").option("path", out).mode(
        "overwrite"
    ).save()
    assert (
        spark.read.schema("event_id bigint, city string, fare_cents bigint")
        .json(pdk.committed_files(out))
        .count()
        == 100
    )
    # ... and its GC ran: exactly one manifest generation remains
    assert len(pdk._manifests(out)) == 1


def test_python_datasink_epoch_replay_is_exactly_once(tmp_path):
    """A replayed micro-batch (same epoch id after a crash between
    sink commit and checkpoint commit) must overwrite itself, not
    append: deterministic per-epoch names + an atomic per-epoch
    manifest replace."""
    import json as _json

    from real_time_ride_hailing_data_pipeline_spark.sources import (
        python_datasink as pdk,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)

    def attempt(payload: str) -> pdk.JsonlCommitMessage:
        tmp = pdk._task_file(out)
        with open(tmp, "w") as f:
            f.write(payload)
        return pdk.JsonlCommitMessage(files=[tmp], rows=1)

    w = pdk.JsonlStreamWriter(out)
    w.commit([attempt('{"v": "first-attempt"}\n')], batchId=7)
    w.commit([attempt('{"v": "replay-attempt"}\n')], batchId=7)

    files = pdk.committed_files(out)
    assert len(files) == 1, files
    with open(files[0]) as f:
        assert _json.load(f) == {"v": "replay-attempt"}
    # exactly one manifest for the epoch, naming exactly one file
    manifests = [n for n in os.listdir(out) if n.startswith("_manifest-")]
    assert manifests == ["_manifest-0000000007.json"]


def test_python_datasink_overwrite_publish_precedes_gc(tmp_path):
    """Overwrite atomicity: the replace manifest is the commit point —
    a reader that races the post-publish GC (or a crash before it)
    still resolves exactly the new snapshot, because committed_files
    discards every generation before the newest replace manifest."""
    import json as _json

    from real_time_ride_hailing_data_pipeline_spark.sources import (
        python_datasink as pdk,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)

    def gen_files(gen: int, replace: bool, payload: str) -> None:
        part = f"part-{gen:010d}-00000.jsonl"
        with open(os.path.join(out, part), "w") as f:
            f.write(payload + "\n")
        with open(os.path.join(out, pdk._manifest_name(gen)), "w") as f:
            _json.dump({"files": [part], "rows": 1, "replace": replace}, f)

    # crash-before-GC state: old generation's manifest+part still on
    # disk next to a newer replace manifest
    gen_files(0, replace=False, payload='{"v": "old"}')
    gen_files(1, replace=True, payload='{"v": "new"}')
    files = pdk.committed_files(out)
    assert [os.path.basename(f) for f in files] == ["part-0000000001-00000.jsonl"]


def test_python_datasink_encodes_non_json_native_types(spark, tmp_path):
    """The sink must survive real Spark column types, not just the
    demo bigint/string schema: timestamps, dates, decimals and binary
    all encode (isoformat / string / base64) instead of raising
    TypeError in every task."""
    import datetime as _dt
    from decimal import Decimal as _D

    from real_time_ride_hailing_data_pipeline_spark.sources import (
        python_datasink as pdk,
    )

    pdk.register(spark)
    out = str(tmp_path / "typed")
    df = spark.createDataFrame(
        [
            (
                _dt.datetime(2024, 3, 1, 12, 30, 45),
                _dt.date(2024, 3, 1),
                _D("12.34"),
                bytearray(b"\x00\xff"),
            )
        ],
        "ts timestamp, d date, dec decimal(10,2), b binary",
    )
    df.write.format("jsonl_commit").option("path", out).mode("append").save()
    files = pdk.committed_files(out)
    assert len(files) == 1
    import base64 as _b64
    import json as _json

    with open(files[0]) as f:
        rec = _json.loads(f.read())
    assert rec["ts"].startswith("2024-03-01T12:30:45")
    assert rec["d"] == "2024-03-01"
    assert rec["dec"] == "12.34"
    assert _b64.b64decode(rec["b"]) == b"\x00\xff"
