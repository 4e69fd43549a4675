"""r12 sf1-equivalent fixture generator (VERDICT r11 item 2): scale
the driver's sf0.1 tables 10x into /tmp/rtrh_sf1 (~6M lineitem, ~1M
events) so correctness can be checked at a scale where plan behavior
(AQE splits, broadcast thresholds, spills) actually changes.

Method: 10 replicas of every fact table with ALL surrogate keys
shifted by replica*(max_key+1) — referential integrity (orders ->
customer, lineitem -> orders/part/supplier, events' user universe)
holds inside each replica by construction; dims (region, nation) stay
as-is so FK targets are shared. Value/timestamp distributions are the
driver's own, at 10x density. documents' text gets a per-replica
suffix for r>0 so the corpus is near-dup-heavy rather than
exact-dup-degenerate (realistic for the dedup tier); replica 0 is
verbatim. Deterministic — no RNG anywhere.

The oracle story is unchanged: verify_sf1_r12.py runs the SAME
parquet through Spark and DuckDB, so the generator only needs to be
realistic, not identical to the driver's.

Run: python benchmarks/gen_sf1_r12.py [out_dir]  (~1 min, no Spark)
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtrh_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def emit(t: str, sql: str) -> None:
        dest = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dest}' (FORMAT parquet, "
            f"ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

    # key offsets = max+1 per table, so replica keyspaces never collide
    off = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        off[t] = con.sql(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")
    emit(
        "customer",
        f"SELECT c_custkey + r * {off['customer']} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment "
        f"FROM {src('customer')} CROSS JOIN range({REPS}) t(r)",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + r * {off['supplier']} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal "
        f"FROM {src('supplier')} CROSS JOIN range({REPS}) t(r)",
    )
    emit(
        "part",
        f"SELECT p_partkey + r * {off['part']} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice "
        f"FROM {src('part')} CROSS JOIN range({REPS}) t(r)",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + r * {off['orders']} AS o_orderkey, "
        f"o_custkey + r * {off['customer']} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority "
        f"FROM {src('orders')} CROSS JOIN range({REPS}) t(r)",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + r * {off['orders']} AS l_orderkey, "
        f"l_partkey + r * {off['part']} AS l_partkey, "
        f"l_suppkey + r * {off['supplier']} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate "
        f"FROM {src('lineitem')} CROSS JOIN range({REPS}) t(r)",
    )
    # events keep the user universe (10x events per user — densification,
    # the realistic scale-up for a stream) and shift event ids
    emit(
        "events",
        f"SELECT event_id + r * {off['events']} AS event_id, ts, user_id, "
        f"event_type, value, props "
        f"FROM {src('events')} CROSS JOIN range({REPS}) t(r)",
    )
    emit(
        "documents",
        f"SELECT doc_id, text, lang, source, length(text) AS n_chars "
        f"FROM (SELECT doc_id + r * {off['documents']} AS doc_id, "
        f"CASE WHEN r = 0 THEN text ELSE text || ' rep' || r END AS text, "
        f"lang, source "
        f"FROM {src('documents')} CROSS JOIN range({REPS}) t(r))",
    )
    emit(
        "embeddings",
        f"SELECT vec_id + r * {off['embeddings']} AS vec_id, embedding, "
        f"label FROM {src('embeddings')} CROSS JOIN range({REPS}) t(r)",
    )
    print("done:", out)


if __name__ == "__main__":
    main()
