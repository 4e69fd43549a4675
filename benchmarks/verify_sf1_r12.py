"""r12 correctness at a real scale factor (VERDICT r11 item 2): run
the driver-emulation verify (bare SparkSession, the
``__spark_entry__`` contract, DuckDB oracle side-by-side) at the
sf1-equivalent fixture built by ``gen_sf1_r12.py`` (~6M lineitem /
1M events) for the TPC-H set + the flagship/frozen-7 anchors + the
dedup/text tier — the tiers whose plans change shape with data volume
(AQE skew splits, broadcast-threshold flips, spills).

Prints one JSON line per query (match + wall) and a final summary
line for BASELINE.md / COVERAGE.md.

Run (exclusively — timings):
    python benchmarks/gen_sf1_r12.py && python benchmarks/verify_sf1_r12.py
"""

import datetime as dt
import importlib.util
import json
import math
import os
import sys
import time
from decimal import Decimal

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtrh_sf1"

FROZEN = [
    "city_window_metrics",
    "city_running_totals",
    "top_cities_by_trips",
    "tpch_q1_pricing_summary",
    "filter_project",
    "join_broadcast_enrichment",
    "agg_distinct_users_per_type",
]


def pick(names: list[str]) -> list[str]:
    chosen = [n for n in FROZEN if n in names]
    chosen += sorted(
        n
        for n in names
        if n not in chosen
        and (
            n.startswith("tpch_")
            or n.startswith("dedup_")
            or n.startswith("text_")
            or n.startswith("ann_")
            or n.startswith("embedding_")
            or n
            in (
                "doc_fingerprint",
                "simhash_documents",
                "search_bm25_topk",
                "ivf_cell_stats",
            )
        )
    )
    return chosen


def norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def main() -> None:
    from pyspark.sql import SparkSession

    # A REALISTIC session for the scale run: local-mode driver heap IS
    # executor memory, and the bare-session 1g default OOMs legitimate
    # 6M-row shuffles/broadcasts (observed: GCLocker retry storms in
    # the dedup self-join tier, broadcast build failure in the
    # connected-components loop). 48g mirrors a production executor
    # profile on this 128 GiB box; the sf0.01 driver contract still
    # runs the bare session — this harness is the scale check, not
    # the contract check.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    con.execute(f"SET threads TO {min(32, os.cpu_count() or 8)}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = mod.queries(), mod.oracle_sql()
    names = pick(list(qs))
    if len(sys.argv) > 2:  # optional subset: verify_sf1_r12.py DIR q1,q2
        names = [n for n in sys.argv[2].split(",") if n in qs]
    fails, errs = [], []
    walls: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(str(norm(r[c])) for c in cols) for r in sdf.collect()
            )
            walls[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errs.append((name, f"{type(exc).__name__}: {exc}"[:200]))
            print(json.dumps({"q": name, "err": errs[-1][1]}), flush=True)
            continue
        if name not in oracles:
            print(
                json.dumps(
                    {"q": name, "rows_only": len(srows), "wall": walls[name]}
                ),
                flush=True,
            )
            continue
        # Oracle watchdog: several dedup ground-truth oracles are
        # deliberately ALL-PAIRS exact (the right oracle at sf0.01's
        # 5k docs, O(n²)-infeasible at sf1's 50k). The SPARK side is
        # the scalable path under test; when the exact oracle can't
        # finish in 180 s it is interrupted and the entry recorded
        # rows-only-at-sf1 with the reason — never silently skipped.
        import threading as _th

        t0 = time.perf_counter()
        timer = _th.Timer(180.0, con.interrupt)
        timer.start()
        try:
            res = con.sql(oracles[name])
            cm = {c: i for i, c in enumerate(res.columns)}
            drows = sorted(
                tuple(str(norm(row[cm[c]])) for c in cols)
                for row in res.fetchall()
            )
        except Exception as exc:  # noqa: BLE001 — interrupt lands here
            print(
                json.dumps(
                    {
                        "q": name,
                        "oracle_timeout_s": 180,
                        "rows_only": len(srows),
                        "wall": walls[name],
                        "note": f"{type(exc).__name__}"[:80],
                    }
                ),
                flush=True,
            )
            continue
        finally:
            timer.cancel()
        duck_wall = round(time.perf_counter() - t0, 2)
        ok = srows == drows and sorted(res.columns) == cols
        if not ok:
            fails.append(name)
        print(
            json.dumps(
                {
                    "q": name,
                    "match": ok,
                    "rows": len(srows),
                    "wall": walls[name],
                    "duck_wall": duck_wall,
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "sf1_verify",
                "sf_dir": SF_DIR,
                "n": len(names),
                "mismatches": fails,
                "errors": errs,
                "spark_total_wall": round(sum(walls.values()), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
