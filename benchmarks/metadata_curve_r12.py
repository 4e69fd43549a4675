"""r12 metadata-growth curve at 1,000 commits (VERDICT r11 item 6):
the r11 bounded-growth *test* runs 60 commits; this drives a real
1,000-commit table build with the snapshot log + retention on and
measures, at checkpoints along the way,

- per-commit wall (mean of the 10 commits before each checkpoint),
- live-read plan+execute time (the consolidated-JSON plan path),
- pruned point-lookup time (zone-map/stats file skipping),
- time-travel open time at the newest version (O(1) self-contained
  manifest, never a chain replay),
- on-disk metadata footprint: file count + bytes under the snapshot
  log and the table root's JSON sidecars.

Flat read/plan/time-travel times and retention-bounded metadata
across the full 1,000 commits are the pass condition; a replay cost
bending upward would call for a manifest-chain checkpoint (the
manifests here are already self-contained per version, so no chain
exists to replay — the measurement proves it stays that way).

Run (exclusively — timings): python benchmarks/metadata_curve_r12.py
Results land in BASELINE.md (round 12).
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_COMMITS = 1000
CHECKPOINTS = {1, 50, 100, 250, 500, 750, 1000}
MAX_SNAPSHOTS = 12


def meta_footprint(table: str, snap: str) -> tuple[int, int]:
    """(n_files, bytes) of everything that is METADATA: the snapshot
    log in full plus the table root's JSON sidecars (manifests,
    schemas, stats, blooms, consolidated cache) — data parquet
    excluded."""
    n = b = 0
    for root, _dirs, files in os.walk(snap):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".parquet"):
                continue  # epoch data copies are data, not metadata
            n += 1
            b += os.path.getsize(p)
    for root, _dirs, files in os.walk(table):
        for f in files:
            if f.endswith(".json") or f in ("_TOUCHED", "_EPOCHS"):
                n += 1
                b += os.path.getsize(os.path.join(root, f))
    return n, b


def main() -> None:
    import datetime as dt

    from pyspark.sql import SparkSession, functions as F

    from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
        ParquetUpsertSink,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    work = tempfile.mkdtemp(prefix="rtrh_meta_curve_")
    table = os.path.join(work, "t")
    snap = os.path.join(work, "snap")
    sink = ParquetUpsertSink(
        table,
        key_cols=("k", "window_start"),
        snapshot_dir=snap,
        max_snapshots=MAX_SNAPSHOTS,
    )
    # 8 hot partitions, keyed upserts cycling through them — the
    # long-lived incremental-ingest shape whose metadata must not grow
    days = [dt.datetime(2024, 1, 1 + d, 12, 0) for d in range(8)]
    schema = "k string, window_start timestamp, total bigint"
    curve = []
    recent: list[float] = []
    try:
        for c in range(1, N_COMMITS + 1):
            d = days[c % len(days)]
            batch = spark.createDataFrame(
                [(f"k{c % 40}", d, c), (f"k{(c * 7) % 40}", d, c + 1)], schema
            )
            t0 = time.perf_counter()
            sink.write_batch(batch, c)
            recent.append(time.perf_counter() - t0)
            if len(recent) > 10:
                recent.pop(0)
            if c in CHECKPOINTS:
                t0 = time.perf_counter()
                n_rows = sink.read(spark).count()
                t_read = time.perf_counter() - t0
                t0 = time.perf_counter()
                pruned, _read, _skip = sink.read_pruned(
                    spark,
                    "total",
                    lower=0,
                    source_lower=days[3],
                    source_upper=days[3],
                )
                pruned.filter(F.col("k") == "k3").count()
                t_pruned = time.perf_counter() - t0
                newest = sink.snapshots()[-1]
                t0 = time.perf_counter()
                sink.read_at(spark, newest).count()
                t_tt = time.perf_counter() - t0
                n_meta, b_meta = meta_footprint(table, snap)
                curve.append(
                    {
                        "commits": c,
                        "commit_wall_mean10": round(
                            sum(recent) / len(recent), 4
                        ),
                        "read_wall": round(t_read, 4),
                        "pruned_lookup_wall": round(t_pruned, 4),
                        "time_travel_wall": round(t_tt, 4),
                        "live_snapshots": len(sink.snapshots()),
                        "meta_files": n_meta,
                        "meta_bytes": b_meta,
                        "rows": n_rows,
                    }
                )
                print(json.dumps(curve[-1]), flush=True)
        print(
            json.dumps(
                {
                    "metric": "metadata_curve_1000_commits",
                    "max_snapshots": MAX_SNAPSHOTS,
                    "curve": curve,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
