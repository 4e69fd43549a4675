"""r11 OCC throughput measurement: N writer PROCESSES applying
disjoint-partition update batches through write_batch_occ
concurrently, vs the SAME batches applied serially through the
full-lock write_batch in one session. Equal total cores both ways
(serial: one local[32]; concurrent: 4 children local[8]). A
file-based barrier excludes JVM startup from the concurrent timing;
final table contents are asserted identical. Results in BASELINE.md
(round 11).

Run: python benchmarks/occ_throughput_r11.py [sf_dir]
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_WRITERS = 4
BATCHES_PER_WRITER = 6

CHILD = """
import os, sys, time, datetime as dt
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
widx = int(sys.argv[1]); table = sys.argv[2]; sf_dir = sys.argv[3]
barrier = sys.argv[4]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import ParquetUpsertSink
sink = ParquetUpsertSink(table, key_cols=("event_id", "ts"), partition_source="ts")
base = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
    "event_id", "ts", "user_id", "event_type", "value")
mine = base.filter(F.pmod(F.dayofyear("ts"), F.lit({n})) == widx)
batches = [mine.filter(F.col("event_id") % {b} == i).withColumn(
    "value", F.col("value") + F.lit(float(1000 * (i + 1)))) for i in range({b})]
for df in batches:  # plan + cache nothing; just make sure lazy plans exist
    df.schema
open(os.path.join(barrier, f"ready-{{widx}}"), "w").close()
while not os.path.exists(os.path.join(barrier, "go")):
    time.sleep(0.02)
t0 = time.time()
for i, df in enumerate(batches):
    sink.write_batch_occ(df, 1 + widx * 100 + i)
wall = time.time() - t0
with open(os.path.join(barrier, f"done-{{widx}}"), "w") as fh:
    fh.write(str(wall))
spark.stop()
"""


def table_hash(spark, path):
    from pyspark.sql import functions as F

    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        ParquetUpsertSink,
    )

    sink = ParquetUpsertSink(path, key_cols=("event_id", "ts"), partition_source="ts")
    df = sink.read(spark)
    return (
        df.select(
            F.expr(
                "bit_xor(xxhash64(event_id, ts, user_id, event_type, "
                "round(value, 6)))"
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        ParquetUpsertSink,
    )

    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="occ_tp_")
    serial_t = os.path.join(work, "serial")
    conc_t = os.path.join(work, "conc")
    for t in (serial_t, conc_t):
        sink = ParquetUpsertSink(t, key_cols=("event_id", "ts"), partition_source="ts")
        sink.write_batch(base, 0)
    # -- serial: the same 24 batches through the full-lock write_batch
    sink = ParquetUpsertSink(
        serial_t, key_cols=("event_id", "ts"), partition_source="ts"
    )
    t0 = time.time()
    for w in range(N_WRITERS):
        mine = base.filter(F.pmod(F.dayofyear("ts"), F.lit(N_WRITERS)) == w)
        for i in range(BATCHES_PER_WRITER):
            sink.write_batch(
                mine.filter(F.col("event_id") % BATCHES_PER_WRITER == i).withColumn(
                    "value", F.col("value") + F.lit(float(1000 * (i + 1)))
                ),
                1 + w * 100 + i,
            )
    serial_wall = time.time() - t0
    # -- concurrent: 4 processes, disjoint day-of-year partition sets
    barrier = os.path.join(work, "barrier")
    os.makedirs(barrier, exist_ok=True)
    prog = CHILD.format(repo=REPO, n=N_WRITERS, b=BATCHES_PER_WRITER)
    procs = [
        subprocess.Popen([sys.executable, "-c", prog, str(w), conc_t, sf_dir, barrier])
        for w in range(N_WRITERS)
    ]
    while len([f for f in os.listdir(barrier) if f.startswith("ready-")]) < N_WRITERS:
        time.sleep(0.05)
    t0 = time.time()
    open(os.path.join(barrier, "go"), "w").close()
    for p in procs:
        p.wait(timeout=1800)
        assert p.returncode == 0, p.returncode
    conc_wall = time.time() - t0
    per_writer = [
        float(open(os.path.join(barrier, f"done-{w}")).read())
        for w in range(N_WRITERS)
    ]
    hs, hc = table_hash(spark, serial_t), table_hash(spark, conc_t)
    print(
        json.dumps(
            {
                "serial_wall_s": round(serial_wall, 2),
                "concurrent_wall_s": round(conc_wall, 2),
                "speedup": round(serial_wall / conc_wall, 2),
                "per_writer_wall_s": [round(w, 2) for w in per_writer],
                "content_equal": (hs["h"] == hc["h"] and hs["n"] == hc["n"]),
                "rows": hs["n"],
                "writers": N_WRITERS,
                "batches_per_writer": BATCHES_PER_WRITER,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
