"""r13 sf1 fixture generator WITH PLANTED DEDUP GROUND TRUTH
(VERDICT r12 item 2): the r12 10x replica scale-up left the 5 dedup
entries rows-only at sf1 because their exact ground-truth oracles are
all-pairs O(n^2) SQL (2.5B candidate pairs at 50k docs). This
generator emits the same sf1 tables AND computes the truth at
GENERATION time, where the replica structure makes it tractable
without any all-pairs stage at sf1 scale:

- ``duplicate_truth.parquet`` — every (doc_a < doc_b) pair of the sf1
  corpus whose trigram-shingle stats pass jaccard >= 0.5 OR
  containment >= 0.8 (the thresholds the dedup entries use), with the
  exact (overlap, size_a, size_b) so any measure re-derives from it.
  Method: a true sf1 pair either lives INSIDE one base document's
  replica group (suffix edits only — all such pairs are enumerated:
  reps^2/2 per base doc) or descends from a base-corpus pair, whose
  exhaustive stats are computable at BASE scale (5k docs — the one
  all-pairs pass, run once here, never at sf1). Candidate lift keeps
  generous margins below the thresholds (jaccard >= 0.3, containment
  >= 0.5, or tiny-doc overlap) to absorb the +-1-shingle shifts the
  per-replica suffix can cause; every lifted candidate is then
  re-evaluated EXACTLY against the generated sf1 texts (list_intersect
  on the real shingle sets — no analytic approximation survives into
  the truth). ``--selfcheck`` validates the construction end-to-end:
  on a small source the same truth is recomputed by brute all-pairs at
  the GENERATED scale and asserted identical (run in
  tests/test_scale_paths.py at sf0.001 and manually at sf0.01).

- ``semantic_truth.parquet`` — the dedup_semantic_keep_list answer at
  sf1, lifted EXACTLY: replicas carry identical embedding arrays, so
  in-cell cosine pairs at sf1 are precisely the base pairs x replica
  combinations plus the within-group cos=1 cliques; each base
  component therefore lifts to one sf1 component whose min id is the
  BASE rep id (replica 0 keeps the smallest ids). The base-scale
  closure runs the entry's own recursive-CTE oracle (in-cell pairs at
  2k vectors), and the lift is ``rep(vec) = base_rep(vec % offset)``
  — no approximation anywhere.

Run: python benchmarks/gen_sf1_r13.py [out_dir] [--src DIR] [--reps N]
     [--selfcheck]   (~2-4 min at the default sf0.1 source)
"""

import argparse
import os

import duckdb

DEFAULT_SRC = "/root/testdata/sf0.1"

# exact-decimal dot product, identical to queries._DOT_DECIMAL_DUCK
# (bit-stable across engines; the semantic truth must reproduce the
# entry's own cosine rounding)
_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) "
    "AS DECIMAL(30,12))))"
)

# trigram shingle set of a text column — the same definition the dedup
# entries and their oracles use (queries.py:_NEAR_DUP_PAIR_CTES)
_SHINGLES = r"""
    SELECT doc_id,
           list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 2, 1)),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
    FROM (SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM {rel})
"""


def emit_tables(con, src: str, out: str, reps: int) -> dict[str, int]:
    """The r12 replica scale-up (gen_sf1_r12.py), parameterized by
    source/replica count so the self-check can run it at toy scale."""

    def s(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def emit(t: str, sql: str) -> None:
        dest = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dest}' (FORMAT parquet, ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

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
        off[t] = con.sql(f"SELECT max({k}) + 1 FROM {s(t)}").fetchone()[0]

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {s(t)}")
    emit(
        "customer",
        f"SELECT c_custkey + r * {off['customer']} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment "
        f"FROM {s('customer')} CROSS JOIN range({reps}) t(r)",
    )
    emit(
        "supplier",
        f"SELECT s_suppkey + r * {off['supplier']} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM {s('supplier')} CROSS JOIN range({reps}) t(r)",
    )
    emit(
        "part",
        f"SELECT p_partkey + r * {off['part']} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice "
        f"FROM {s('part')} CROSS JOIN range({reps}) t(r)",
    )
    emit(
        "orders",
        f"SELECT o_orderkey + r * {off['orders']} AS o_orderkey, "
        f"o_custkey + r * {off['customer']} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority "
        f"FROM {s('orders')} CROSS JOIN range({reps}) t(r)",
    )
    emit(
        "lineitem",
        f"SELECT l_orderkey + r * {off['orders']} AS l_orderkey, "
        f"l_partkey + r * {off['part']} AS l_partkey, "
        f"l_suppkey + r * {off['supplier']} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate "
        f"FROM {s('lineitem')} CROSS JOIN range({reps}) t(r)",
    )
    emit(
        "events",
        f"SELECT event_id + r * {off['events']} AS event_id, ts, user_id, "
        f"event_type, value, props "
        f"FROM {s('events')} CROSS JOIN range({reps}) t(r)",
    )
    emit(
        "documents",
        f"SELECT doc_id, text, lang, source, length(text) AS n_chars "
        f"FROM (SELECT doc_id + r * {off['documents']} AS doc_id, "
        f"CASE WHEN r = 0 THEN text ELSE text || ' rep' || r END AS text, "
        f"lang, source FROM {s('documents')} CROSS JOIN range({reps}) t(r))",
    )
    emit(
        "embeddings",
        f"SELECT vec_id + r * {off['embeddings']} AS vec_id, embedding, "
        f"label FROM {s('embeddings')} CROSS JOIN range({reps}) t(r)",
    )
    return off


def emit_duplicate_truth(con, src: str, out: str, reps: int, off_doc: int) -> int:
    """The shingle-measure ground truth at generated scale: candidate
    lift (within-group + margin-kept base pairs x replica combos), then
    EXACT re-evaluation against the generated texts."""
    sh_src = _SHINGLES.format(rel=f"read_parquet('{src}/documents.parquet')")
    sh_out = _SHINGLES.format(
        rel=f"read_parquet('{os.path.join(out, 'documents.parquet')}')"
    )
    # one EXHAUSTIVE pass at BASE scale only, via the exact inverted-
    # index join (equivalent to all-pairs: a pair sharing no shingle
    # has i = 0 and cannot meet any margin; the list_intersect
    # all-pairs form is O(n^2 * |sh|), >28 min even at 5k docs) —
    # margins comfortably under the 0.5/0.8 thresholds absorb the
    # +-1-shingle suffix shifts; the tiny-doc branch keeps every
    # sharing pair where one side has <= 4 shingles (there a single
    # shingle shift can move any ratio)
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE base_cands AS
        WITH t AS ({sh_src}),
        ex AS (SELECT doc_id, len(sh)::BIGINT AS sz, unnest(sh) AS s FROM t),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS i,
                 any_value(a.sz) AS sa, any_value(b.sz) AS sb
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b FROM p
        WHERE 10 * i >= 3 * (sa + sb - i)   -- jaccard >= 0.3
           OR 2 * i >= least(sa, sb)        -- containment >= 0.5
           OR least(sa, sb) <= 4            -- tiny docs: any sharing pair
        """
    )
    n_base = con.sql("SELECT count(*) FROM base_cands").fetchone()[0]
    print(f"base candidate pairs: {n_base}", flush=True)
    # lift: within-group pairs for every base doc + base candidates
    # under every (r, s) replica combination, oriented doc_a < doc_b
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE sf_cands AS
        SELECT DISTINCT least(x, y) AS doc_a, greatest(x, y) AS doc_b
        FROM (
          SELECT doc_id + r.r * {off_doc} AS x, doc_id + s.s * {off_doc} AS y
          FROM (SELECT DISTINCT doc_id FROM read_parquet('{src}/documents.parquet'))
          CROSS JOIN range({reps}) r(r) CROSS JOIN range({reps}) s(s)
          WHERE r.r < s.s
          UNION ALL
          SELECT doc_a + r.r * {off_doc}, doc_b + s.s * {off_doc}
          FROM base_cands
          CROSS JOIN range({reps}) r(r) CROSS JOIN range({reps}) s(s)
        )
        """
    )
    # exact re-evaluation on the GENERATED corpus; keep pairs passing
    # either dedup threshold under the entries' own exact predicates
    dest = os.path.join(out, "duplicate_truth.parquet")
    con.execute(
        f"""
        COPY (
          WITH t AS ({sh_out}),
          ev AS (
            SELECT c.doc_a, c.doc_b,
                   len(list_intersect(a.sh, b.sh))::BIGINT AS overlap,
                   len(a.sh)::BIGINT AS size_a, len(b.sh)::BIGINT AS size_b
            FROM sf_cands c
            JOIN t a ON a.doc_id = c.doc_a
            JOIN t b ON b.doc_id = c.doc_b
          )
          SELECT * FROM ev
          WHERE ((2 * overlap * 10000 + (size_a + size_b - overlap))
                 // (2 * (size_a + size_b - overlap))) / 10000.0 >= 0.5
             OR overlap * 5 >= least(size_a, size_b) * 4
          ORDER BY doc_a, doc_b
        ) TO '{dest}' (FORMAT parquet)
        """
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
    print(f"duplicate_truth: {n} pairs", flush=True)
    return n


def emit_semantic_truth(con, src: str, out: str, reps: int, off_vec: int) -> int:
    """dedup_semantic_keep_list's answer at generated scale via the
    EXACT analytic lift (identical replica embeddings): base in-cell
    closure with the entry's own cosine + rounding, then
    rep(v) = base_rep(v % offset)."""
    dot_ab = _DOT.format(a="a.embedding", b="b.embedding")
    dot_self = _DOT.format(a="embedding", b="embedding")
    dest = os.path.join(out, "semantic_truth.parquet")
    con.execute(
        f"""
        COPY (
          WITH RECURSIVE n AS (
            SELECT label, vec_id, embedding,
                   sqrt(CAST({dot_self} AS DOUBLE)) AS nrm
            FROM read_parquet('{src}/embeddings.parquet')
          ), pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(CAST({dot_ab} AS DOUBLE) / (a.nrm * b.nrm), 6) >= 0.4
          ), e AS (
            SELECT vec_a AS a, vec_b AS b FROM pairs
            UNION SELECT vec_b, vec_a FROM pairs
          ), r(a, b) AS (
            SELECT a, b FROM e
            UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
          ), rep AS (SELECT a AS vec_id, least(a, min(b)) AS rep_id FROM r GROUP BY a)
          SELECT v.vec_id, v.label,
                 coalesce(rep.rep_id, v.vec_id % {off_vec}) AS rep_id,
                 coalesce(rep.rep_id, v.vec_id % {off_vec}) = v.vec_id AS keep
          FROM read_parquet('{os.path.join(out, 'embeddings.parquet')}') v
          LEFT JOIN rep ON v.vec_id % {off_vec} = rep.vec_id
          ORDER BY v.vec_id
        ) TO '{dest}' (FORMAT parquet)
        """
    )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
    print(f"semantic_truth: {n} rows", flush=True)
    return n


def selfcheck(con, out: str) -> None:
    """Recompute both truths by BRUTE FORCE at the generated scale and
    assert the planted tables match — only tractable for small sources
    (sf0.001/sf0.01); validates the candidate-lift margins and the
    semantic analytic lift end-to-end."""
    sh_out = _SHINGLES.format(
        rel=f"read_parquet('{os.path.join(out, 'documents.parquet')}')"
    )
    # brute force via the exact inverted-index join (EQUIVALENT to
    # all-pairs: a pair with zero shared shingles has overlap 0 and
    # can pass neither threshold) — shares NO code or margin with the
    # candidate-lift path, so a lift miss shows up as an asymmetric
    # row; the all-pairs list_intersect form is O(n^2 * |sh|) and
    # infeasible even at the 5k-doc self-check scale
    diff = con.sql(
        f"""
        WITH t AS ({sh_out}),
        ex AS (SELECT doc_id, len(sh)::BIGINT AS sz, unnest(sh) AS s FROM t),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS overlap,
                 any_value(a.sz) AS size_a, any_value(b.sz) AS size_b
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        brute_true AS (
          SELECT * FROM shared
          WHERE ((2 * overlap * 10000 + (size_a + size_b - overlap))
                 // (2 * (size_a + size_b - overlap))) / 10000.0 >= 0.5
             OR overlap * 5 >= least(size_a, size_b) * 4
        ),
        planted AS (
          SELECT * FROM read_parquet('{os.path.join(out, 'duplicate_truth.parquet')}')
        )
        SELECT count(*) FROM (
          SELECT * FROM brute_true EXCEPT SELECT * FROM planted
          UNION ALL
          SELECT * FROM planted EXCEPT SELECT * FROM brute_true
        )
        """
    ).fetchone()[0]
    if diff:
        raise AssertionError(
            f"duplicate_truth selfcheck FAILED: {diff} asymmetric rows "
            f"vs brute-force all-pairs"
        )
    dot_ab = _DOT.format(a="a.embedding", b="b.embedding")
    dot_self = _DOT.format(a="embedding", b="embedding")
    diff2 = con.sql(
        f"""
        WITH RECURSIVE n AS (
          SELECT label, vec_id, embedding,
                 sqrt(CAST({dot_self} AS DOUBLE)) AS nrm
          FROM read_parquet('{os.path.join(out, 'embeddings.parquet')}')
        ), pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE round(CAST({dot_ab} AS DOUBLE) / (a.nrm * b.nrm), 6) >= 0.4
        ), e AS (
          SELECT vec_a AS a, vec_b AS b FROM pairs
          UNION SELECT vec_b, vec_a FROM pairs
        ), r(a, b) AS (
          SELECT a, b FROM e
          UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
        ), rep AS (SELECT a AS vec_id, least(a, min(b)) AS rep_id FROM r GROUP BY a),
        brute AS (
          SELECT v.vec_id, v.label,
                 coalesce(rep.rep_id, v.vec_id) AS rep_id,
                 coalesce(rep.rep_id, v.vec_id) = v.vec_id AS keep
          FROM read_parquet('{os.path.join(out, 'embeddings.parquet')}') v
          LEFT JOIN rep ON v.vec_id = rep.vec_id
        ),
        planted AS (
          SELECT * FROM read_parquet('{os.path.join(out, 'semantic_truth.parquet')}')
        )
        SELECT count(*) FROM (
          SELECT * FROM brute EXCEPT SELECT * FROM planted
          UNION ALL
          SELECT * FROM planted EXCEPT SELECT * FROM brute
        )
        """
    ).fetchone()[0]
    if diff2:
        raise AssertionError(
            f"semantic_truth selfcheck FAILED: {diff2} asymmetric rows "
            f"vs brute-force in-cell closure"
        )
    print("selfcheck OK: planted truth == brute-force truth", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/rtrh_sf1")
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--selfcheck", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    off = emit_tables(con, args.src, args.out, args.reps)
    emit_duplicate_truth(con, args.src, args.out, args.reps, off["documents"])
    emit_semantic_truth(con, args.src, args.out, args.reps, off["embeddings"])
    if args.selfcheck:
        selfcheck(con, args.out)
    print("done:", args.out)


if __name__ == "__main__":
    main()
