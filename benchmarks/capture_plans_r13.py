#!/usr/bin/env python
"""Capture .explain("formatted") for every registry entry (r13
optimization round, guide §1: plan-shape audit before touching code).

Writes one file per entry to the output dir. Streaming entries that
execute a StreamingQuery when called are executed too (their returned
DataFrame is the sink read-back; that is the plan we can capture), so
running this script costs real work — run it off the timed path.

Usage: python benchmarks/capture_plans_r13.py OUTDIR [sf_dir] [only...]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from real_time_ride_hailing_data_pipeline_spark import queries as q
from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan
from real_time_ride_hailing_data_pipeline_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-capture", cpus=8, shuffle_partitions=8)
    registry = q.all_queries()
    names = sorted(only & set(registry)) if only else sorted(registry)
    for name in names:
        path = os.path.join(outdir, f"{name}.txt")
        if os.path.exists(path):
            continue
        t0 = time.perf_counter()
        try:
            df = registry[name](spark, sf_dir)
            plan = physical_plan(df)
            err = ""
        except Exception as exc:  # noqa: BLE001 — record and continue
            plan, err = "", f"{type(exc).__name__}: {exc}"
        dt = time.perf_counter() - t0
        with open(path, "w") as fh:
            fh.write(f"# query: {name}\n# sf_dir: {sf_dir}\n")
            fh.write(f"# capture_wall_s: {dt:.2f} (includes any eager execution)\n")
            if err:
                fh.write(f"# ERROR: {err}\n")
            fh.write(plan)
        print(f"{name}: {dt:.1f}s{' ERR' if err else ''}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
