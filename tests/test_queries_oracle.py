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
