"""Every registry query with an oracle is checked against DuckDB at
sf0.001 (the driver's own gate re-runs this comparison at sf0.01)."""

from __future__ import annotations

import pytest

from real_time_ride_hailing_data_pipeline_spark import queries as q
from tests.oracle_utils import compare_query

_WITH_ORACLE = sorted(q.all_oracles().keys())


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    # registry_name turns on the driver-canonicalizable schema guard
    # (no array/map/struct output columns — the r6 failure class)
    compare_query(
        spark,
        sf_dir,
        q.all_queries()[name],
        q.all_oracles()[name],
        registry_name=name,
    )


@pytest.mark.slow  # whole-registry sweep (275 s in the r14 baseline):
# every entry EXECUTES, including ~90 streaming/lakehouse lifecycles.
# The 210 oracle-backed entries stay covered by the default run's
# parametrized oracle test above; this sweep adds only the handful of
# rows-only entries and runs in the slow tier (pytest.ini).
def test_every_query_returns_rows(spark, sf_dir):
    for name, fn in q.all_queries().items():
        df = fn(spark, sf_dir)
        assert df.count() > 0, name
        assert len(df.columns) > 0, name


def test_approx_distinct_within_hll_error_bounds(spark, sf_dir):
    """agg_approx_distinct_users carries no value oracle (HLL sketches
    are implementation-specific), but the estimate is still a testable
    CLAIM: per group it must land within 3×rsd of the exact count from
    its value-checked twin agg_distinct_users_per_type (rsd=0.02, so
    ±6% — ~99.7% confidence under the HLL++ error model)."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q.all_queries()["agg_approx_distinct_users"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in q.all_queries()["agg_distinct_users_per_type"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        assert abs(approx[etype] - n) <= max(1, 3 * 0.02 * n), (
            etype,
            approx[etype],
            n,
        )


def test_side_effecting_queries_are_reentrant(spark, sf_dir):
    """Queries with session-global side effects (saveAsTable bucketed
    tables, embedded-Derby databases, Python DataSource / UDTF
    registration) must be safely re-runnable in one session — the
    driver, bench and verify all call them repeatedly. Two runs must
    return identical rows."""
    from real_time_ride_hailing_data_pipeline_spark import queries as q

    for name in (
        "bucketed_join_no_shuffle",
        "jdbc_source_partitioned_read",
        "python_datasource_city_fares",
        "udtf_sentence_stats",
    ):
        fn = q.all_queries()[name]
        first = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        second = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert first == second and len(first) > 0, name


def test_oracle_outputs_are_driver_canonicalizable(sf_dir):
    """Regression guard for the r6 red-row CLASS (VERDICT r6 item 3):
    the correctness driver canonicalizes both result sets through
    pandas before hashing, so an oracle FINAL column that DuckDB types
    HUGEINT (uncast integer ``sum``) lands as float64 while Spark emits
    int64 — a value-identical hash mismatch — and a LIST/STRUCT/MAP
    column kills ``factorize`` outright (unhashable).  Every oracle's
    output relation must therefore be scalar-typed with no HUGEINT.
    Fix sites: wrap sums in CAST(... AS BIGINT); flatten arrays through
    array_to_string / array_join on BOTH sides."""
    from tests.oracle_utils import duckdb_conn

    con = duckdb_conn(sf_dir)
    flagged = []
    for name, sql in q.all_oracles().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if (
                "HUGEINT" in t
                or t.startswith("LIST")
                or "[]" in t
                or t.startswith("STRUCT")
                or t.startswith("MAP")
            ):
                flagged.append((name, col, t))
    assert not flagged, f"driver-incompatible oracle columns: {flagged}"


def test_collect_sorted_arrays_raw_form(spark, sf_dir):
    """The raw ``sort_array(collect_set(...))`` array aggregate — the
    pre-r7 form of collect_sorted_event_types — stays value-checked
    here (the local harness tuple-normalizes lists) even though the
    registry entry ships the array_join'd scalar for the driver."""
    from pyspark.sql import functions as F

    from real_time_ride_hailing_data_pipeline_spark import catalog

    def raw(spark, sf_dir):
        events = catalog.load_table(spark, sf_dir, "events")
        return (
            events.filter(F.col("user_id") % 31 == 0)
            .groupBy("user_id")
            .agg(
                F.sort_array(F.collect_set("event_type")).alias("event_types"),
                F.countDistinct("event_type").alias("n_types"),
            )
            .orderBy("user_id")
        )

    compare_query(
        spark,
        sf_dir,
        raw,
        """
        SELECT user_id,
               list_sort(list(DISTINCT event_type)) AS event_types,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events WHERE user_id % 31 = 0
        GROUP BY 1 ORDER BY 1
        """,
    )


def test_edit_distance_pairs_survive_unicode_and_empty_docs(spark, tmp_path):
    """Adversarial fixture for the two latent divergences in the
    edit-distance tier: (a) DuckDB levenshtein counts BYTES, Spark
    counts CHARACTERS — the registry pair projects to printable ASCII
    on both sides so they agree on any corpus; (b) two documents that
    normalize to empty text hit _ml = 0 — sim is defined as 1.0
    instead of DIVIDE_BY_ZERO under ANSI mode."""
    docs = [
        (0, "héllo wörld the quick brown fox"),   # multi-byte chars
        (1, "hello world the quick brown fox"),
        (2, "  "),                                 # normalizes to ""...
        (3, "    "),                               # ...as does this: ml = 0
        (4, "café au lait • menu"),
        (5, "cafe au lait ? menu"),
        # ASCII control whitespace survives the projection as
        # whitespace (norm " "), it must NOT become '?'
        (6, "\t \n"),
    ]
    sf = str(tmp_path / "sf")
    import os as _os

    _os.makedirs(sf)
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    _pq.write_table(
        _pa.table(
            {
                "doc_id": [i for i, _ in docs],
                "text": [t for _, t in docs],
                "lang": ["xx"] * len(docs),
                "source": ["unit"] * len(docs),
                "n_chars": [len(t) for _, t in docs],
            }
        ),
        _os.path.join(sf, "documents.parquet"),
    )
    compare_query(
        spark,
        sf,
        q.all_queries()["dedup_edit_distance_pairs"],
        q.all_oracles()["dedup_edit_distance_pairs"],
    )
    # the empty-pair row exists and carries the defined sim
    rows = {
        (r["doc_a"], r["doc_b"]): (r["edit_distance"], r["sim"])
        for r in q.all_queries()["dedup_edit_distance_pairs"](spark, sf).collect()
    }
    assert rows[(2, 3)] == (0, 1.0)


def test_range_frame_oracle_floors_fractional_seconds(spark, tmp_path):
    """Adversarial fixture for the epoch-rounding divergence: two
    events ~3600 s apart whose sub-second fractions straddle .5 — a
    rounding oracle (bare CAST(epoch() AS BIGINT)) puts the second
    event's trailing frame on the wrong side of the hour; the floor()
    oracle must agree with Spark's unix_timestamp."""
    import datetime as _dt
    import os as _os

    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    events = [
        # (event_id, ts, user_id): frame of e2 = [t2-3600, t2];
        # floor(t1)=0 (frac .4), floor(t2)=3600 (frac .6) -> IN frame;
        # rounding would give t1=0? no: round(.4)=0, round(3600.6)=3601
        # -> t1 OUT of frame -> n_trailing differs
        (1, base + _dt.timedelta(seconds=0, microseconds=400_000), 0),
        (2, base + _dt.timedelta(seconds=3600, microseconds=600_000), 0),
        # a second user with the mirrored straddle
        (3, base + _dt.timedelta(seconds=0, microseconds=600_000), 50),
        (4, base + _dt.timedelta(seconds=3601, microseconds=400_000), 50),
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf)
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    _pq.write_table(
        _pa.table(
            {
                "event_id": _pa.array([e[0] for e in events], _pa.int64()),
                "ts": _pa.array([e[1] for e in events], _pa.timestamp("us")),
                "user_id": _pa.array([e[2] for e in events], _pa.int64()),
                "event_type": ["click"] * len(events),
                "value": _pa.array([1.0] * len(events), _pa.float64()),
                "props": ["{}"] * len(events),
            }
        ),
        _os.path.join(sf, "events.parquet"),
    )
    compare_query(
        spark,
        sf,
        q.all_queries()["window_range_trailing_stats"],
        q.all_oracles()["window_range_trailing_stats"],
    )


def test_expectations_flag_dirty_rows_including_nulls(spark, tmp_path):
    """Adversarial fixture for the expectations audit: one violation
    per rule plus NULL-valued rows — NULL predicate results must count
    as violations on BOTH engines (Spark eqNullSafe vs DuckDB IS NOT
    TRUE; a bare FILTER(NOT pred) would silently pass NULLs)."""
    import datetime as _dt
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    good_ts = _dt.datetime(2024, 1, 1)
    rows = [
        # event_id, ts, user_id, event_type, value, props
        (1, good_ts, 1, "click", 1.0, "{}"),              # clean
        (2, good_ts, 1, "click", -5.0, "{}"),             # value rule
        (3, good_ts, 1, "teleport", 1.0, "{}"),           # type rule
        (4, _dt.datetime(1999, 1, 1), 1, "view", 1.0, "{}"),  # ts rule
        (5, good_ts, 1, "view", 1.0, "not json"),         # props rule
        (6, good_ts, 1, None, None, None),                # NULLs: 3 rules
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf)
    _pq.write_table(
        _pa.table(
            {
                "event_id": _pa.array([r[0] for r in rows], _pa.int64()),
                "ts": _pa.array([r[1] for r in rows], _pa.timestamp("us")),
                "user_id": _pa.array([r[2] for r in rows], _pa.int64()),
                "event_type": _pa.array([r[3] for r in rows], _pa.string()),
                "value": _pa.array([r[4] for r in rows], _pa.float64()),
                "props": _pa.array([r[5] for r in rows], _pa.string()),
            }
        ),
        _os.path.join(sf, "events.parquet"),
    )
    compare_query(
        spark,
        sf,
        q.all_queries()["expectations_event_quality"],
        q.all_oracles()["expectations_event_quality"],
    )
    counts = {
        r["rule"]: r["n_violations"]
        for r in q.all_queries()["expectations_event_quality"](spark, sf).collect()
    }
    assert counts == {
        "value_non_negative": 2,   # -5.0 and the NULL value
        "known_event_type": 2,     # 'teleport' and the NULL type
        "ts_in_range": 1,
        "props_is_json": 2,        # 'not json' and the NULL props
    }


def test_year_spine_fills_gap_years_with_zero_rows(spark, tmp_path):
    """The point of the recursive-CTE spine: a year with NO orders
    must still appear, as an explicit zero row, on BOTH engines — a
    bare GROUP BY year would silently drop it."""
    import datetime as _dt
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    rows = [  # years 2000 and 2003 only — 2001/2002 are the gap
        (1, _dt.date(2000, 3, 1), 100.0),
        (2, _dt.date(2000, 9, 1), 50.0),
        (3, _dt.date(2003, 6, 1), 25.0),
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf)
    _pq.write_table(
        _pa.table(
            {
                "o_orderkey": _pa.array([r[0] for r in rows], _pa.int64()),
                "o_orderdate": _pa.array([r[1] for r in rows], _pa.date32()),
                "o_totalprice": _pa.array([r[2] for r in rows], _pa.float64()),
            }
        ),
        _os.path.join(sf, "orders.parquet"),
    )
    compare_query(
        spark,
        sf,
        q.all_queries()["recursive_cte_year_spine"],
        q.all_oracles()["recursive_cte_year_spine"],
    )
    got = {
        r["yr"]: (r["n_orders"], r["revenue_cents"])
        for r in q.all_queries()["recursive_cte_year_spine"](spark, sf).collect()
    }
    assert got == {
        2000: (2, 15000),
        2001: (0, 0),
        2002: (0, 0),
        2003: (1, 2500),
    }


def test_median_mode_null_semantics(spark, tmp_path):
    """Adversarial fixture for agg_median_mode_per_type: Spark's
    mode()/median() SKIP NULL inputs, so (a) a NULL-majority group
    must elect the most frequent NON-NULL value, not NULL, and (b) an
    all-NULL group has mode NULL (via the oracle's LEFT JOIN) — the
    two shapes a naive oracle ranking (which lets the NULL group win
    on count) gets wrong. Also exercises the deterministic lowest-
    value tie-break, and gives approx_topk_event_types a NULL
    event_type row (the sketch skips NULLs; the oracle filters them)."""
    import datetime as _dt
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from tests.oracle_utils import compare_query as _cmp

    ts = _dt.datetime(2024, 1, 1)
    rows = [
        # event_id, event_type, value
        (1, "a", None), (2, "a", None), (3, "a", 5.0),   # NULL-majority
        (4, "b", None), (5, "b", None),                   # all-NULL
        (6, "c", 1.0), (7, "c", 1.0), (8, "c", 2.0), (9, "c", 2.0),  # tie
        (10, None, 7.0),                                  # NULL type
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf)
    _pq.write_table(
        _pa.table(
            {
                "event_id": _pa.array([r[0] for r in rows], _pa.int64()),
                "ts": _pa.array([ts] * len(rows), _pa.timestamp("us")),
                "user_id": _pa.array([1] * len(rows), _pa.int64()),
                "event_type": _pa.array([r[1] for r in rows], _pa.string()),
                "value": _pa.array([r[2] for r in rows], _pa.float64()),
                "props": _pa.array(["{}"] * len(rows), _pa.string()),
            }
        ),
        _os.path.join(sf, "events.parquet"),
    )
    for name in ("agg_median_mode_per_type", "approx_topk_event_types"):
        _cmp(spark, sf, q.all_queries()[name], q.all_oracles()[name])
    got = {
        r["event_type"]: (r["median_value"], r["mode_value_int"])
        for r in q.all_queries()["agg_median_mode_per_type"](spark, sf).collect()
    }
    assert got["a"] == (5.0, 5)      # NULLs skipped, not elected
    assert got["b"] == (None, None)  # all-NULL group
    assert got["c"] == (1.5, 1)      # tie breaks to the lowest value
