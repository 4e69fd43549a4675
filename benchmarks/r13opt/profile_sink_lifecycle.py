#!/usr/bin/env python
"""Phase-by-phase profile of the lakehouse_point_lookup_time_travel
lifecycle (guide §1: isolate the expensive query, label jobs), with
file-count census after each phase."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from real_time_ride_hailing_data_pipeline_spark import queries as q
from real_time_ride_hailing_data_pipeline_spark.session import get_spark
from real_time_ride_hailing_data_pipeline_spark.streaming.job import _workdir
from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import ParquetUpsertSink
from real_time_ride_hailing_data_pipeline_spark import catalog

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtrh_bench_mf_cached"
spark = get_spark(app_name="profile", cpus=32, shuffle_partitions=32)
# warm
spark.range(1_000_000).selectExpr("sum(id)").collect()

def census(root):
    n = 0; b = 0
    for dp, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                n += 1; b += os.path.getsize(os.path.join(dp, f))
    return n, b

base = catalog.load_table(spark, sf_dir, "events").select(
    "event_id", "ts", "user_id", "event_type", "value")
workdir = _workdir("rtrh_prof_")
sink = ParquetUpsertSink(os.path.join(workdir, "t"), key_cols=("event_id","ts"),
    partition_source="ts", snapshot_dir=os.path.join(workdir, "snap"))

t = time.perf_counter()
def mark(label):
    global t
    now = time.perf_counter()
    n, b = census(workdir)
    print(f"{label:28s} {now-t:7.2f}s  files={n:5d}  bytes={b/1e6:.1f}MB", flush=True)
    t = now

spark.sparkContext.setJobDescription("write_batch epoch0")
sink.write_batch(base, 0); mark("write_batch(base,0)")
sink.compact(spark, files_per_partition=8, sort_by="value"); mark("compact(8,sort=value)")
sink.create_bloom_index(spark, "event_id"); mark("create_bloom_index")
smallest = base.select("event_id","ts").orderBy("event_id").limit(3).collect(); mark("probe collect")
probes = [r["event_id"] for r in smallest]
sink.delete_keys(spark.createDataFrame([(smallest[0]["event_id"], smallest[0]["ts"])],
    "event_id bigint, ts timestamp"), 1, mode="merge_on_read"); mark("delete_keys(mor,1)")
sink.write_batch(base.withColumn("value", F.col("value")+100000.0), 2); mark("write_batch(poison,2)")
df, selected, total = sink.read_point_at(spark, 1, "event_id", probes)
df.collect(); mark(f"read_point_at sel={selected}/{total}")
spark.stop()
