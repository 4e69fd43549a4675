"""r11 scale-up measurement (VERDICT r10 item 5): the r10 lakehouse
features — z-order file skipping, bloom point lookups, consolidated
one-JSON planning, the CDF feed — re-measured on 1x / 10x / 100x
replicas of the sf0.1 events table (rows AND files scale: the
compaction target keeps ~constant rows per file, so the 100x layout
has ~100x the file count). Records selected/total pruning ratios,
plan-time (driver-side file selection, no Spark job), bloom build
wall, and CDF read wall. Results land in BASELINE.md (round 11).

Run: python benchmarks/scale_lakehouse_r11.py [sf_dir]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        ParquetUpsertSink,
    )

    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n_base = base.count()
    results = []
    for scale in (1, 10, 100):
        reps = [
            base.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 100_000_000)
            )
            for i in range(scale)
        ]
        df = reps[0]
        for r in reps[1:]:
            df = df.unionByName(r)
        work = tempfile.mkdtemp(prefix=f"scale_lh_{scale}x_")
        sink = ParquetUpsertSink(
            os.path.join(work, "t"),
            key_cols=("event_id", "ts"),
            partition_source="ts",
            snapshot_dir=os.path.join(work, "snap"),
        )
        t0 = time.time()
        sink.write_batch(df, 0)
        t_write = time.time() - t0
        sink.set_clustering(["value", "user_id"], mode="zorder")
        t0 = time.time()
        sink.compact(spark, files_per_partition=max(1, scale))
        t_zorder = time.time() - t0
        t0 = time.time()
        sink.create_bloom_index(spark, "event_id")
        t_bloom_build = time.time() - t0
        files_total = sink.describe_files(spark).count()
        # z-order pruning: both dims (value leading-free ranges)
        thr_v = df.stat.approxQuantile("value", [0.999], 0.0001)[0]
        thr_u = df.stat.approxQuantile(
            "user_id", [0.999], 0.0001
        )[0]
        t0 = time.time()
        _, sel_v, tot_v = sink.read_pruned(spark, "value", lower=thr_v)
        plan_v = time.time() - t0
        t0 = time.time()
        _, sel_u, tot_u = sink.read_pruned(spark, "user_id", lower=thr_u)
        plan_u = time.time() - t0
        # the full stack: value predicate + 7-day partition window
        lo = df.agg(F.min("ts")).collect()[0][0]
        import datetime as dt

        hi = lo + dt.timedelta(days=7)
        t0 = time.time()
        _, sel_s, tot_s = sink.read_pruned(
            spark, "value", lower=thr_v, source_lower=lo, source_upper=hi
        )
        plan_s = time.time() - t0
        # bloom point lookup: 3 probes, plan-only then executed
        probes = [
            r[0]
            for r in df.select("event_id").orderBy("event_id").limit(3).collect()
        ]
        t0 = time.time()
        dfp, sel_p, tot_p = sink.read_point(spark, "event_id", probes)
        plan_p = time.time() - t0
        t0 = time.time()
        n_hits = dfp.count()
        exec_p = time.time() - t0
        # CDF: one DV delete commit, then the typed change feed
        doomed = df.select("event_id", "ts").orderBy("event_id").limit(100)
        sink.delete_keys(doomed, 1, mode="merge_on_read")
        t0 = time.time()
        changes = sink.read_changes_typed(spark, 0, 1).count()
        t_cdf = time.time() - t0
        row = {
            "scale": scale,
            "rows": n_base * scale,
            "files_total": files_total,
            "t_write_s": round(t_write, 2),
            "t_zorder_compact_s": round(t_zorder, 2),
            "t_bloom_build_s": round(t_bloom_build, 2),
            "zorder_value": f"{sel_v}/{tot_v}",
            "zorder_user": f"{sel_u}/{tot_u}",
            "stack_value_7d": f"{sel_s}/{tot_s}",
            "point": f"{sel_p}/{tot_p}",
            "point_hits": n_hits,
            "plan_ms": {
                "value": round(plan_v * 1e3),
                "user": round(plan_u * 1e3),
                "stack": round(plan_s * 1e3),
                "point": round(plan_p * 1e3),
            },
            "point_exec_s": round(exec_p, 2),
            "cdf_rows": changes,
            "cdf_read_s": round(t_cdf, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"all": results}))
    spark.stop()


if __name__ == "__main__":
    main()
