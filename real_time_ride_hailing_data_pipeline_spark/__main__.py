"""CLI: run any registered query against a parquet dataset directory.

The reference's entry points are two Prefect flows pinned to one
pipeline (`/root/reference/spark_jobs/streaming_job.py:138-142`,
`producer/run_producer.py:96-98`); the engine generalizes them into a
query runner over the whole registry (orchestration itself is out of
scope per SURVEY §3.3).

    python -m real_time_ride_hailing_data_pipeline_spark list
    python -m real_time_ride_hailing_data_pipeline_spark run city_window_metrics \
        --sf-dir /root/testdata/sf0.01 --limit 20 --explain
"""

from __future__ import annotations

import argparse
import sys

from real_time_ride_hailing_data_pipeline_spark import queries as q
from real_time_ride_hailing_data_pipeline_spark.catalog import DEFAULT_SF_DIR
from real_time_ride_hailing_data_pipeline_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="real_time_ride_hailing_data_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries (* = has DuckDB oracle)")
    runp = sub.add_parser("run", help="run one query and print its result")
    runp.add_argument("query", help="registry name (see `list`)")
    runp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    runp.add_argument("--limit", type=int, default=50, help="max rows to show")
    runp.add_argument("--explain", action="store_true", help="print the physical plan")
    args = parser.parse_args(argv)

    registry, oracles = q.all_queries(), q.all_oracles()
    if args.cmd == "list":
        for name in sorted(registry):
            print(f"{'*' if name in oracles else ' '} {name}")
        return 0

    if args.query not in registry:
        print(f"unknown query {args.query!r}; `list` shows the registry", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"cli:{args.query}")
    try:
        df = registry[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
