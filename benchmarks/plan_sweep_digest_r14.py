#!/usr/bin/env python
"""Full-registry plan-sweep digest (r14, VERDICT r13 item 8): capture
the physical plan of EVERY registry entry and write ONE digest file
with per-entry counts of the load-bearing node types, so the
"zero CartesianProduct / zero BatchEvalPython across 217 entries"
claim is checkable from a committed artifact instead of asserted.

Streaming entries execute their replay when called (the returned
DataFrame is the sink read-back — that is the plan we can capture),
so this costs real work; run it off any timed path.

Usage: python benchmarks/plan_sweep_digest_r14.py OUT.md [sf_dir]
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

# node markers counted per plan; the first two must be zero everywhere
MARKERS = [
    ("CartesianProduct", "cartesian"),
    ("BatchEvalPython", "batch_eval_py"),
    ("ArrowEvalPython", "arrow_eval_py"),
    ("Exchange", "exchange"),
    ("BroadcastHashJoin", "bhj"),
    ("SortMergeJoin", "smj"),
    ("ShuffledHashJoin", "shj"),
    ("MapInPandas", "map_in_pandas"),
    ("MapInArrow", "map_in_arrow"),
    ("PartitionFilters: [", "partition_filters"),
    ("PushedFilters: [", "pushed_filters"),
]


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plan-sweep", cpus=8, shuffle_partitions=8)
    registry = q.all_queries()
    rows: list[tuple] = []
    errors: dict[str, str] = {}
    for name in sorted(registry):
        t0 = time.perf_counter()
        try:
            plan = physical_plan(registry[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        counts = tuple(plan.count(marker) for marker, _ in MARKERS)
        rows.append((name, round(time.perf_counter() - t0, 1), counts))
        print(f"{name}: {rows[-1][1]}s", flush=True)
    spark.stop()

    cart = [n for n, _, c in rows if c[0]]
    bep = [n for n, _, c in rows if c[1]]
    with open(out_path, "w") as fh:
        fh.write("# Plan-sweep digest (r14)\n\n")
        fh.write(f"sf_dir: {sf_dir}; entries captured: {len(rows)}; ")
        fh.write(f"errors: {len(errors)}\n\n")
        fh.write(f"- CartesianProduct anywhere: **{len(cart)}** {cart}\n")
        fh.write(f"- BatchEvalPython anywhere: **{len(bep)}** {bep}\n\n")
        fh.write("| entry | capture_s | " + " | ".join(k for _, k in MARKERS) + " |\n")
        fh.write("|---|---|" + "---|" * len(MARKERS) + "\n")
        for name, dt, counts in rows:
            fh.write(
                f"| {name} | {dt} | "
                + " | ".join(str(c) for c in counts)
                + " |\n"
            )
        if errors:
            fh.write("\n## Errors\n\n")
            for name, err in sorted(errors.items()):
                fh.write(f"- {name}: {err}\n")
    print(f"wrote {out_path}: {len(rows)} entries, {len(errors)} errors")


if __name__ == "__main__":
    main()
