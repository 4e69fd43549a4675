#!/usr/bin/env python
"""Targeted per-entry retime under bench conditions (r14, guide §1):
same session shape as bench.py (local[32], 32-file derived layout,
JVM + Arrow-pool + datasource-lane warmups), N warm samples per named
entry, printed as one JSON line per entry. For before/after evidence
on the entries this round touches — the full bench stays the
round-over-round artifact.

Usage: python benchmarks/r14opt/time_entries.py N entry [entry...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402  — reuse the bench's layout + warmup helpers
from real_time_ride_hailing_data_pipeline_spark import queries as q  # noqa: E402
from real_time_ride_hailing_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="retime", cpus=cpus, shuffle_partitions=cpus)
    registry = q.all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "double")
    spark.range(cpus * 4, numPartitions=cpus).select(
        warm(F.col("id").cast("double"))
    ).collect()
    bench_dir = bench.multifile_layout(spark, sf_dir)
    for name in names:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            registry[name](spark, bench_dir).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {"entry": name, "samples": samples, "min": min(samples)}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
