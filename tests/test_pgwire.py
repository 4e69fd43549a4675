"""Postgres wire-protocol client + upsert sink (S5, the reference's
ACTUAL dialect executed): literal rendering, wire decode, embedded
server lifecycle, and the full streaming replay-equals-batch /
idempotence parity through a real PostgreSQL transaction.

Reference: /root/reference/spark_jobs/streaming_job.py:26-53 (psycopg2
staging + ``INSERT .. ON CONFLICT DO UPDATE``) — here spoken over the
pure-stdlib wire protocol (sources/pgwire.py), keyed idempotently.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import pytest

from real_time_ride_hailing_data_pipeline_spark import queries as q
from real_time_ride_hailing_data_pipeline_spark.sources.pgwire import (
    EmbeddedPostgres,
    PgError,
    _decode,
    sql_literal,
)
from real_time_ride_hailing_data_pipeline_spark.streaming import job as sj
from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
    PostgresUpsertSink,
    postgres_merge_sql,
)

SF_DIR = "/root/testdata/sf0.001"

needs_pg = pytest.mark.skipif(
    not EmbeddedPostgres.available(), reason="postgres binaries unavailable"
)


# -- literal rendering (no server needed) ---------------------------------


def test_sql_literal_scalars():
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(False) == "FALSE"
    assert sql_literal(42) == "42"
    assert sql_literal(Decimal("12.50")) == "12.50"
    assert sql_literal(0.1) == "0.1"


@needs_pg
def test_decimal_scientific_notation_roundtrip():
    """Decimal str() can emit scientific notation ('1E+2'); PostgreSQL
    accepts it as a numeric literal and preserves the value."""
    client = EmbeddedPostgres.ensure().connect()
    try:
        for v in (Decimal("1E+2"), Decimal("-3.14E-5"), Decimal("0.1")):
            _, rows = client.query(f"SELECT {sql_literal(v)}::numeric AS x")
            assert rows[0][0] == v, (v, rows[0][0])
    finally:
        client.close()


def test_sql_literal_nonfinite_floats_are_quoted():
    """Bare ``inf``/``nan`` are invalid PostgreSQL float8 literals —
    they must render quoted (protocol docs: 'Infinity', 'NaN')."""
    assert sql_literal(float("inf")) == "'Infinity'::float8"
    assert sql_literal(float("-inf")) == "'-Infinity'::float8"
    assert sql_literal(float("nan")) == "'NaN'::float8"


def test_sql_literal_strings_escape_quotes():
    assert sql_literal("o'brien") == "'o''brien'"
    assert sql_literal("héllo • ünïcode") == "'héllo • ünïcode'"
    assert sql_literal("'';DROP TABLE x;--") == "''''';DROP TABLE x;--'"


def test_sql_literal_bytes_hex():
    """Binary (multimodal payload columns) renders as a hex bytea
    literal, never through the quoted-str() branch."""
    assert sql_literal(b"\x00\xff") == "'\\x00ff'::bytea"
    assert sql_literal(bytearray(b"ab")) == "'\\x6162'::bytea"
    assert sql_literal(memoryview(b"\x01")) == "'\\x01'::bytea"


def test_sql_literal_temporals():
    assert (
        sql_literal(dt.datetime(2024, 1, 15, 10, 30, 0, 123456))
        == "TIMESTAMP '2024-01-15 10:30:00.123456'"
    )
    # zero microseconds: isoformat omits the fraction — still a valid
    # pg literal
    assert (
        sql_literal(dt.datetime(2024, 1, 15, 10, 30))
        == "TIMESTAMP '2024-01-15 10:30:00'"
    )
    assert sql_literal(dt.date(2024, 2, 29)) == "DATE '2024-02-29'"


# -- wire decode (no server needed) ---------------------------------------


def test_decode_timestamptz_fractional_offsets():
    """Not just whole-hour offsets: +05:30 / -03:00 normalize to naive
    UTC (second line of defense behind TimeZone=UTC at startup)."""
    got = _decode(b"2024-01-15 10:30:00+05:30", 1184)
    assert got == dt.datetime(2024, 1, 15, 5, 0, 0)
    got = _decode(b"2024-01-15 10:30:00.25-03", 1184)
    assert got == dt.datetime(2024, 1, 15, 13, 30, 0, 250000)


def test_decode_bytea_hex():
    assert _decode(b"\\x00ff6162", 17) == b"\x00\xffab"
    with pytest.raises(PgError):
        _decode(b"not-hex-format", 17)


# -- embedded server lifecycle --------------------------------------------


def test_ensure_raises_clean_pgerror_when_unavailable(monkeypatch):
    """A host without initdb/pg_ctl gets PgError, not a TypeError from
    subprocess.run([None, ...])."""
    monkeypatch.setattr(EmbeddedPostgres, "_instance", None)
    monkeypatch.setattr(EmbeddedPostgres, "available", staticmethod(lambda: False))
    with pytest.raises(PgError, match="unavailable"):
        EmbeddedPostgres.ensure()


@needs_pg
def test_ensure_is_a_per_process_singleton():
    """One server per process (fresh tempdir data dir — parallel test
    sessions each boot their own isolated server, nothing shared)."""
    a = EmbeddedPostgres.ensure()
    b = EmbeddedPostgres.ensure()
    assert a is b
    assert a._base and a._base.startswith("/tmp")


@needs_pg
def test_wire_roundtrip_edge_values():
    """Full client round-trip through a real server: NULL, unicode,
    quotes, non-finite floats, bytes, numeric, timestamps."""
    client = EmbeddedPostgres.ensure().connect()
    try:
        cols, rows = client.query(
            "SELECT "
            + ", ".join(
                [
                    f"{sql_literal(None)}::text AS a",
                    sql_literal("o'brien • ünïcode") + " AS b",
                    sql_literal(float("nan")) + " AS c",
                    sql_literal(float("-inf")) + " AS d",
                    sql_literal(b"\x00\xffhi") + " AS e",
                    sql_literal(Decimal("12.50")) + "::numeric AS f",
                    sql_literal(dt.datetime(2024, 1, 15, 10, 30, 0, 5)) + " AS g",
                ]
            )
        )
        assert cols == ["a", "b", "c", "d", "e", "f", "g"]
        (r,) = rows
        assert r[0] is None
        assert r[1] == "o'brien • ünïcode"
        assert math.isnan(r[2]) and r[3] == float("-inf")
        assert r[4] == b"\x00\xffhi"
        assert r[5] == Decimal("12.50")
        assert r[6] == dt.datetime(2024, 1, 15, 10, 30, 0, 5)
    finally:
        client.close()


@needs_pg
def test_wire_error_recovers_to_ready():
    """A statement error surfaces as PgError and the connection is
    reusable afterwards (ReadyForQuery resync)."""
    client = EmbeddedPostgres.ensure().connect()
    try:
        with pytest.raises(PgError, match="syntax|exist"):
            client.query("SELECT * FROM table_that_does_not_exist_xyz")
        _, rows = client.query("SELECT 7 AS x")
        assert rows == [(7,)]
    finally:
        client.close()


# -- property: literal -> wire -> Python round-trip -----------------------


@needs_pg
def test_literal_roundtrip_property():
    """Hypothesis: arbitrary strings (any unicode, quotes, backslashes),
    ints, finite floats, bytes, and timestamps round-trip exactly
    through sql_literal -> a real server -> the wire decoder. Each
    example batches all values into ONE SELECT so the server round
    trips stay cheap."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    client = EmbeddedPostgres.ensure().connect()
    printable = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        s=printable,
        i=st.integers(min_value=-(2**62), max_value=2**62),
        f=st.floats(allow_nan=False, allow_infinity=False, width=64),
        b=st.binary(max_size=64),
        ts=st.datetimes(
            min_value=dt.datetime(1, 1, 1),
            max_value=dt.datetime(9999, 12, 31),
        ),
    )
    def check(s, i, f, b, ts):
        _, rows = client.query(
            "SELECT "
            + sql_literal(s)
            + "::text AS s, "
            + sql_literal(i)
            + "::bigint AS i, "
            + sql_literal(f)
            + "::float8 AS f, "
            + sql_literal(b)
            + " AS b, "
            + sql_literal(ts)
            + " AS ts"
        )
        (r,) = rows
        assert r[0] == s
        assert r[1] == i
        assert r[2] == f
        assert r[3] == b
        assert r[4] == ts

    try:
        check()
    finally:
        client.close()


# -- merge statement shape ------------------------------------------------


def test_postgres_merge_sql_is_keyed_and_non_additive():
    """The corrected dialect: conflict target is the FULL composite
    key and every value column overwrites (the reference's additive
    city-only form double-counts on replay, streaming_job.py:37-44)."""
    sql = postgres_merge_sql(
        "city_metrics",
        "city_metrics_staging",
        ["city", "window_start"],
        ["total_trips", "average_fare"],
    )
    assert "ON CONFLICT (city, window_start) DO UPDATE" in sql
    assert "total_trips = EXCLUDED.total_trips" in sql
    assert "+" not in sql


# -- the sink, end-to-end -------------------------------------------------


def _batch_result(spark):
    return {
        tuple(r)
        for r in q.all_queries()["city_window_metrics"](spark, SF_DIR).collect()
    }


@needs_pg
def test_postgres_sink_write_batch_is_idempotent(spark):
    """Applying the same micro-batch twice lands in the same state —
    overwrite-per-key through ON CONFLICT, one transaction per batch."""
    df = spark.createDataFrame(
        [
            ("view", dt.datetime(2024, 1, 15, 10, 0), 3, 12.5),
            ("view", dt.datetime(2024, 1, 15, 10, 1), 1, 8.0),
        ],
        "event_type string, window_start timestamp, total_trips long, average_fare double",
    )
    sink = PostgresUpsertSink(table="t_idem", key_cols=("event_type", "window_start"))
    sink.write_batch(df, 0)
    first = {tuple(r) for r in sink.read(spark).collect()}
    sink.write_batch(df, 0)  # replayed epoch
    assert {tuple(r) for r in sink.read(spark).collect()} == first
    # updated aggregate for an existing key overwrites, never adds
    df2 = spark.createDataFrame(
        [("view", dt.datetime(2024, 1, 15, 10, 0), 5, 11.0)], df.schema
    )
    sink.write_batch(df2, 1)
    rows = {tuple(r) for r in sink.read(spark).collect()}
    assert (("view", dt.datetime(2024, 1, 15, 10, 0), 5, 11.0)) in rows
    assert len(rows) == 2


@needs_pg
def test_postgres_sink_enforces_batch_row_bound(spark):
    """The O(batch) driver-memory contract is enforced, not assumed: a
    micro-batch above max_batch_rows fails loudly with the
    DataFrameWriter.jdbc guidance instead of OOMing the driver."""
    df = spark.range(5).selectExpr(
        "CAST(id AS STRING) AS city",
        "timestamp'2024-01-15 10:00:00' + make_interval(0,0,0,0,0,CAST(id AS INT),0)"
        " AS window_start",
        "id AS total_trips",
    )
    sink = PostgresUpsertSink(
        table="t_bound", key_cols=("city", "window_start"), max_batch_rows=3
    )
    with pytest.raises(ValueError, match="max_batch_rows"):
        sink.write_batch(df, 0)


@needs_pg
def test_postgres_sink_binary_column_roundtrip(spark):
    """Multimodal payload columns survive the sink: BinaryType maps to
    BYTEA, literals hex-render, and the wire read-back returns the
    exact bytes (the corruption path the old quoted-str() fallback
    would have hit)."""
    payload = bytes(range(256))
    df = spark.createDataFrame(
        [("img-1", payload, 256), ("img-2", b"", 0)],
        "media_id string, payload binary, n_bytes long",
    )
    sink = PostgresUpsertSink(table="t_media", key_cols=("media_id",))
    sink.write_batch(df, 0)
    got = {r["media_id"]: (bytes(r["payload"]), r["n_bytes"]) for r in sink.read(spark).collect()}
    assert got == {"img-1": (payload, 256), "img-2": (b"", 0)}


@needs_pg
def test_postgres_streaming_replay_equals_batch(spark):
    """The registry entry: a real availableNow StreamingQuery drives
    foreachBatch into a real PostgreSQL server; the merged table equals
    the batch flagship aggregation (batch/streaming parity through the
    reference's literal dialect)."""
    got = {tuple(r) for r in sj.streaming_postgres_replay(spark, SF_DIR).collect()}
    assert got == _batch_result(spark)


@needs_pg
def test_postgres_replay_registry_oracle(spark):
    """Driver-shaped check: the registered query matches its DuckDB
    oracle at sf0.001 (full value-hash tier)."""
    from tests.oracle_utils import compare_query

    queries, oracles = q.all_queries(), q.all_oracles()
    assert "streaming_postgres_replay" in queries
    compare_query(
        spark, SF_DIR, queries["streaming_postgres_replay"],
        oracles["streaming_postgres_replay"],
    )


# -- COPY-IN staging path (VERDICT r6 item 4) -----------------------------


def test_copy_text_fields():
    from real_time_ride_hailing_data_pipeline_spark.sources.pgwire import (
        copy_text,
    )

    assert copy_text(None) == "\\N"
    assert copy_text(True) == "t" and copy_text(False) == "f"
    assert copy_text(42) == "42"
    assert copy_text(Decimal("12.50")) == "12.50"
    assert copy_text(float("nan")) == "NaN"
    assert copy_text(float("inf")) == "Infinity"
    assert copy_text("a\tb\nc\\d\re") == "a\\tb\\nc\\\\d\\re"
    assert copy_text(b"\x00\xff") == "\\\\x00ff"
    assert copy_text(dt.date(2024, 1, 15)) == "2024-01-15"
    # tz-aware normalizes to naive UTC (same as sql_literal)
    aware = dt.datetime(
        2024, 1, 15, 10, 0, tzinfo=dt.timezone(dt.timedelta(hours=5))
    )
    assert copy_text(aware) == "2024-01-15 05:00:00"


def test_sql_literal_tz_aware_normalized_to_utc():
    """ADVICE r6: a tz-aware datetime inside a TIMESTAMP literal would
    have its offset silently dropped by the server — sql_literal must
    normalize to naive UTC first."""
    aware = dt.datetime(
        2024, 1, 15, 10, 0, tzinfo=dt.timezone(dt.timedelta(hours=5))
    )
    assert sql_literal(aware) == "TIMESTAMP '2024-01-15 05:00:00'"


def test_copy_rows_chunking_is_bounded():
    from real_time_ride_hailing_data_pipeline_spark.sources.pgwire import (
        copy_rows,
    )

    rows = [{"x": "v" * 100} for _ in range(50)]
    chunks = list(copy_rows(rows, ["x"], max_frame_bytes=256))
    assert len(chunks) > 10  # ~2 rows per 256-byte frame
    assert all(len(c) <= 256 for c in chunks)
    # no row is ever split across frames (each chunk = whole lines)
    assert all(c.endswith(b"\n") for c in chunks)
    assert b"".join(chunks).count(b"\n") == 50


@needs_pg
def test_copy_in_roundtrip_edge_values():
    """COPY-IN through a real server preserves the same edge values the
    literal path does: NULL, unicode, tabs/newlines/backslashes in
    text, non-finite floats, bytes, numerics, timestamps."""
    from real_time_ride_hailing_data_pipeline_spark.sources.pgwire import (
        copy_rows,
    )

    client = EmbeddedPostgres.ensure().connect()
    try:
        client.query(
            "DROP TABLE IF EXISTS copy_rt;"
            "CREATE TABLE copy_rt (s TEXT, i BIGINT, f FLOAT8, b BYTEA, "
            "ts TIMESTAMP, d NUMERIC)"
        )
        vals = [
            {"s": "tab\there • 'quote\\back\nnewline", "i": -(2**62),
             "f": float("nan"), "b": b"\x00\xffhi",
             "ts": dt.datetime(1, 1, 1, 0, 0, 0, 1), "d": Decimal("1E+2")},
            {"s": None, "i": None, "f": float("-inf"), "b": None,
             "ts": dt.datetime(9999, 12, 31, 23, 59, 59, 999999), "d": None},
        ]
        names = ["s", "i", "f", "b", "ts", "d"]
        client.query(
            "COPY copy_rt (s, i, f, b, ts, d) FROM STDIN",
            copy_data=copy_rows(vals, names),
        )
        _, rows = client.query("SELECT s, i, f, b, ts, d FROM copy_rt ORDER BY ts")
        assert rows[0][0] == vals[0]["s"]
        assert rows[0][1] == vals[0]["i"]
        assert math.isnan(rows[0][2])
        assert rows[0][3] == vals[0]["b"]
        assert rows[0][4] == vals[0]["ts"]
        assert rows[0][5] == vals[0]["d"]
        assert rows[1] == (None, None, float("-inf"), None, vals[1]["ts"], None)
    finally:
        client.query("DROP TABLE IF EXISTS copy_rt")
        client.close()


@needs_pg
def test_copy_in_multistatement_is_one_transaction():
    """The COPY sits inside a multi-statement simple query; a FAILING
    statement after it must roll back the copied rows too — the
    atomicity the staged MERGE relies on."""
    from real_time_ride_hailing_data_pipeline_spark.sources.pgwire import (
        copy_rows,
    )

    client = EmbeddedPostgres.ensure().connect()
    try:
        client.query(
            "DROP TABLE IF EXISTS copy_tx; CREATE TABLE copy_tx (x BIGINT)"
        )
        rows = [{"x": i} for i in range(100)]
        with pytest.raises(PgError):
            client.query(
                "COPY copy_tx (x) FROM STDIN;\n"
                "SELECT 1/0",  # fails AFTER the copy completes
                copy_data=copy_rows(rows, ["x"], max_frame_bytes=64),
            )
        _, out = client.query("SELECT count(*) FROM copy_tx")
        assert out == [(0,)]  # the whole implicit transaction rolled back
        # and the successful form lands everything in one commit
        client.query(
            "COPY copy_tx (x) FROM STDIN",
            copy_data=copy_rows(rows, ["x"], max_frame_bytes=64),
        )
        _, out = client.query("SELECT count(*), sum(x) FROM copy_tx")
        assert out == [(100, Decimal("4950"))]
    finally:
        client.query("DROP TABLE IF EXISTS copy_tx")
        client.close()


@needs_pg
def test_postgres_sink_multichunk_batch_lands_atomically(spark, monkeypatch):
    """Sink-level proof for VERDICT r6 item 4: a micro-batch whose COPY
    stream spans MANY CopyData frames commits atomically and stays
    idempotent under replay."""
    from real_time_ride_hailing_data_pipeline_spark.sources import pgwire

    real_copy_rows = pgwire.copy_rows
    frames = []

    def tiny_frames(rows, names, max_frame_bytes=1 << 20):
        for chunk in real_copy_rows(rows, names, max_frame_bytes=128):
            frames.append(len(chunk))
            yield chunk

    monkeypatch.setattr(pgwire, "copy_rows", tiny_frames)
    sink = PostgresUpsertSink(table="copy_chunk_metrics")
    t0 = dt.datetime(2024, 1, 1)
    schema = "city string, window_start timestamp, total_trips long"
    batch = spark.createDataFrame(
        [(f"city_{i:04d}", t0, i) for i in range(200)], schema
    )
    sink.write_batch(batch, 0)
    assert len(frames) > 50  # the load genuinely streamed in chunks
    out = {tuple(r) for r in sink.read(spark).collect()}
    assert len(out) == 200
    sink.write_batch(batch, 0)  # replay: idempotent, not additive
    assert {tuple(r) for r in sink.read(spark).collect()} == out
    client = sink._connect()
    client.query("DROP TABLE IF EXISTS copy_chunk_metrics")
    client.query("DROP TABLE IF EXISTS copy_chunk_metrics_staging")


@needs_pg
def test_copy_text_roundtrip_property():
    """Hypothesis twin of test_literal_roundtrip_property for the
    COPY-IN path: arbitrary strings (tabs, newlines, backslashes, any
    unicode), ints, finite floats, bytes, timestamps and NULLs
    round-trip exactly through copy_rows -> COPY FROM STDIN -> the
    wire decoder — value fidelity of the staging stream equals the
    literal path it replaced."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from real_time_ride_hailing_data_pipeline_spark.sources.pgwire import (
        copy_rows,
    )

    client = EmbeddedPostgres.ensure().connect()
    client.query(
        "DROP TABLE IF EXISTS copy_prop;"
        "CREATE TABLE copy_prop (s TEXT, i BIGINT, f FLOAT8, b BYTEA, "
        "ts TIMESTAMP)"
    )
    printable = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        s=st.one_of(st.none(), printable),
        i=st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
        f=st.floats(allow_nan=False, allow_infinity=False, width=64),
        b=st.one_of(st.none(), st.binary(max_size=64)),
        ts=st.datetimes(
            min_value=dt.datetime(1, 1, 1),
            max_value=dt.datetime(9999, 12, 31),
        ),
    )
    def check(s, i, f, b, ts):
        row = {"s": s, "i": i, "f": f, "b": b, "ts": ts}
        client.query(
            "TRUNCATE copy_prop;\n"
            "COPY copy_prop (s, i, f, b, ts) FROM STDIN",
            copy_data=copy_rows([row], ["s", "i", "f", "b", "ts"],
                                max_frame_bytes=32),
        )
        _, rows = client.query("SELECT s, i, f, b, ts FROM copy_prop")
        assert rows == [(s, i, f, b, ts)]

    try:
        check()
    finally:
        client.query("DROP TABLE IF EXISTS copy_prop")
        client.close()


@needs_pg
def test_sink_drops_cached_connection_on_query_failure():
    """with_retries only helps if each attempt dials fresh: a failure
    mid-COPY leaves the wire desynced, so _query must close and drop
    the cached client before re-raising — the retry's _connect() then
    opens a new socket instead of reusing the broken one."""
    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        PostgresUpsertSink,
    )

    sink = PostgresUpsertSink(table="conn_drop_t", key_cols=["k"])

    class _BrokenClient:
        closed = False

        def query(self, *_a, **_k):
            raise ConnectionError("mid-frame send failure")

        def close(self):
            self.closed = True

    broken = _BrokenClient()
    sink._client = broken
    with pytest.raises(ConnectionError):
        sink._query("SELECT 1")
    assert broken.closed
    assert sink._client is None
    # and the next _query dials a REAL fresh connection and succeeds
    cols, rows = sink._query("SELECT 41 + 1 AS v")
    assert rows == [(42,)]
