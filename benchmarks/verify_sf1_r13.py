"""r13 sf1 correctness harness (VERDICT r12 items 2+3): the r12
driver-emulation verify (bare ``__spark_entry__`` contract, DuckDB
oracle side-by-side) extended with PLANTED-TRUTH oracles for the 5
dedup entries that were rows-only at sf1 — their exact ground-truth
oracles are all-pairs O(n^2) SQL, infeasible at 50k docs, so
``gen_sf1_r13.py`` computes the truth at generation time (candidate
lift + exact re-evaluation; construction self-checked by brute force
at small scale) and this harness re-derives each entry's expected
output from ``duplicate_truth.parquet`` / ``semantic_truth.parquet``
with the entries' own predicates and rounding. Every comparison is a
FULL value-hash (rows sorted, columns sorted, 6-dp float norm), same
as the driver.

Run: python benchmarks/gen_sf1_r13.py && python benchmarks/verify_sf1_r13.py
     [sf_dir] [q1,q2,...]
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


def planted_oracles(sf_dir: str) -> dict[str, str]:
    """Truth-table-backed oracle SQL for the dedup tier — each derives
    the entry's exact output from the planted stats with the entry's
    own predicate and integer-DIV rounding (no all-pairs anywhere)."""
    truth = os.path.join(sf_dir, "duplicate_truth.parquet")
    sem = os.path.join(sf_dir, "semantic_truth.parquet")
    docs = os.path.join(sf_dir, "documents.parquet")
    jacc = f"""
    SELECT doc_a, doc_b,
           ((2 * overlap * 10000 + u) // (2 * u)) / 10000.0 AS jaccard
    FROM (SELECT doc_a, doc_b, overlap,
                 size_a + size_b - overlap AS u
          FROM read_parquet('{truth}'))
    WHERE ((2 * overlap * 10000 + u) // (2 * u)) / 10000.0 >= 0.5
    """
    return {
        "dedup_near_duplicates": jacc,
        "dedup_ngram_jaccard": jacc,
        "dedup_containment_pairs": f"""
    SELECT doc_a, doc_b, overlap, min_size,
           ((2 * overlap * 10000 + min_size) // (2 * min_size)) / 10000.0
             AS containment
    FROM (SELECT doc_a, doc_b, overlap,
                 least(size_a, size_b) AS min_size
          FROM read_parquet('{truth}'))
    WHERE overlap * 5 >= min_size * 4
    """,
        "dedup_cluster_assignment": f"""
    WITH RECURSIVE pairs AS ({jacc}),
    e AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    r(a, b) AS (
      SELECT a, b FROM e
      UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
    ),
    rep AS (SELECT a AS doc_id, least(a, min(b)) AS rep_id FROM r GROUP BY a)
    SELECT d.doc_id,
           coalesce(rep.rep_id, d.doc_id) AS rep_id,
           coalesce(rep.rep_id, d.doc_id) = d.doc_id AS is_representative
    FROM read_parquet('{docs}') d LEFT JOIN rep ON d.doc_id = rep.doc_id
    """,
        "dedup_semantic_keep_list": f"""
    SELECT vec_id, label, rep_id, keep FROM read_parquet('{sem}')
    """,
    }


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

    # production-shaped heap for the scale run (see verify_sf1_r12.py:
    # the bare 1g default OOMs legitimate 6M-row work; the sf0.01
    # driver contract still runs the bare session)
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
    oracles = {**oracles, **planted_oracles(SF_DIR)}
    names = pick(list(qs))
    if len(sys.argv) > 2:
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
                "metric": "sf1_verify_r13",
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
