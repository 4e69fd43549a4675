"""Every registry query with an oracle is checked against DuckDB at
sf0.001 (the driver's own gate re-runs this comparison at sf0.01)."""

from __future__ import annotations

import pytest

from real_time_ride_hailing_data_pipeline_spark import queries as q
from tests.oracle_utils import compare_query

_WITH_ORACLE = sorted(q.all_oracles().keys())


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, q.all_queries()[name], q.all_oracles()[name])


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
