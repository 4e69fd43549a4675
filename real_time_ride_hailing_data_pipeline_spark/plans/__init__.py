"""Physical-plan inspection helpers (plans.inspect)."""

from real_time_ride_hailing_data_pipeline_spark.plans.inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    assert_sort_merge_join,
    physical_plan,
)
