"""Executable claims for the IVF trained coarse quantizer
(operators/ivf.py). Since r5 the registry entries (ivf_cell_stats,
ann_ivf_topk) carry FULL DuckDB value-hash oracles (integer
fixed-point training unrolled in SQL — tests/test_queries_oracle.py);
this module keeps the approximation-QUALITY claims the oracle can't
express: determinism, assignment coverage, Lloyd convergence, and
recall against the exact brute-force baseline."""

from __future__ import annotations

from real_time_ride_hailing_data_pipeline_spark import catalog
from real_time_ride_hailing_data_pipeline_spark.operators import ivf
from real_time_ride_hailing_data_pipeline_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"
K = 8


def _emb(spark):
    return catalog.load_table(spark, SF, "embeddings")


def test_training_is_bit_deterministic(spark):
    """Two independent trainings must produce identical centroids:
    seeds are md5-ordered (no RNG) and per-dimension sums are exact
    decimals (order-independent), so partitioning can't leak in."""
    emb = _emb(spark)
    c1 = ivf.train_coarse_quantizer(emb, k=K, iters=3)
    c2 = ivf.train_coarse_quantizer(emb, k=K, iters=3)
    assert c1 == c2


def test_every_vector_assigned_to_exactly_one_valid_cell(spark):
    emb = _emb(spark)
    cents = ivf.train_coarse_quantizer(emb, k=K, iters=2)
    stats = ivf.cell_stats(emb, cents).collect()
    assert sum(r["n_vectors"] for r in stats) == emb.count()
    assert all(0 <= r["cell"] < K for r in stats)


def test_lloyd_distortion_never_increases(spark):
    """Each Lloyd pass can only lower total squared distortion — the
    convergence invariant. Compare distortion after 1 vs 4 passes."""
    emb = _emb(spark)

    def total_distortion(iters: int) -> float:
        cents = ivf.train_coarse_quantizer(emb, k=K, iters=iters)
        rows = ivf.cell_stats(emb, cents).collect()
        return sum(r["n_vectors"] * r["avg_dist_sq"] for r in rows)

    assert total_distortion(4) <= total_distortion(1) + 1e-9


def test_ivf_recall_against_brute_force(spark):
    """Probing 4 of 8 cells must recover >=40% of the exact top-10 per
    query and >=50% on average (the synthetic embeddings are near
    uniform — the weakest case for IVF; measured 0.5-0.7 here)."""
    emb = _emb(spark)
    cents = ivf.train_coarse_quantizer(emb, k=K, iters=4)
    recalls = []
    for qid in [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(3).collect()]:
        q = emb.filter(f"vec_id = {qid}")
        exact = {r["vec_id"] for r in sim.brute_force_topk(emb, q, k=10).collect()}
        approx = {r["vec_id"] for r in ivf.ivf_topk(emb, q, cents, k=10, nprobe=4).collect()}
        recalls.append(len(exact & approx) / 10)
    assert min(recalls) >= 0.4, recalls
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_cell_assignment_is_map_only(spark):
    """The assignment column must be a pure expression over the scan:
    centroids ride inside the codegen'd projection, so the plan has no
    Exchange, no join, and no Python."""
    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import physical_plan

    emb = _emb(spark)
    cents = ivf.train_coarse_quantizer(emb, k=K, iters=1)
    plan = physical_plan(ivf.assign_cells(emb, cents))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_ingest_equals_full_rebuild_and_stays_pruned(
    spark, tmp_path
):
    """r13 index maintenance: build the cell index on 3/4 of the
    corpus, ingest the remaining quarter in three batches through
    ingest_into_cell_index — the probe over the maintained index must
    (a) still carry PartitionFilters on `cell` (appends never break
    pruning) and (b) value-match the same probe over a from-scratch
    full-corpus index: per-vector assignment makes base+delta
    bit-identical to a rebuild."""
    from pyspark.sql import functions as F

    from real_time_ride_hailing_data_pipeline_spark.plans.inspect import (
        physical_plan,
    )

    emb = _emb(spark)
    cents = ivf.train_coarse_quantizer(emb, k=K, iters=2)
    maintained = str(tmp_path / "maintained")
    rebuilt = str(tmp_path / "rebuilt")
    ivf.build_cell_index(emb.filter(F.col("vec_id") % 4 != 3), cents, maintained)
    delta = emb.filter(F.col("vec_id") % 4 == 3)
    for i in range(3):
        ivf.ingest_into_cell_index(
            delta.filter(F.col("vec_id") % 3 == i), cents, maintained, i
        )
    # crash-replay idempotence: re-delivering an epoch (same batch,
    # same epoch id — what a checkpoint replay does) must REPLACE its
    # partitions, not append duplicates
    ivf.ingest_into_cell_index(
        delta.filter(F.col("vec_id") % 3 == 1), cents, maintained, 1
    )
    ivf.build_cell_index(emb, cents, rebuilt)
    # the replayed epoch left no duplicates and lost no rows
    idx = spark.read.parquet(maintained)
    n = emb.count()
    assert idx.count() == n
    assert idx.select("vec_id").distinct().count() == n
    query = emb.orderBy("vec_id").limit(1)
    df_m = ivf.ivf_topk_indexed(spark, maintained, query, cents, k=5, nprobe=3)
    plan = physical_plan(df_m)
    assert "PartitionFilters" in plan, plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]
    got = [(r["vec_id"], r["sim"]) for r in df_m.collect()]
    want = [
        (r["vec_id"], r["sim"])
        for r in ivf.ivf_topk_indexed(
            spark, rebuilt, query, cents, k=5, nprobe=3
        ).collect()
    ]
    assert got == want and len(got) == 5, (got, want)
    # lifecycle close: compaction folds the epochs into one file per
    # cell, loses nothing, and the probe answer is unchanged
    stats = ivf.compact_cell_index(spark, maintained)
    assert stats["files_after"] <= stats["files_before"]
    idx2 = spark.read.parquet(maintained)
    # exactly one file per POPULATED cell
    assert stats["files_after"] == idx2.select("cell").distinct().count()
    assert idx2.count() == n
    assert idx2.select("vec_id").distinct().count() == n
    got2 = [
        (r["vec_id"], r["sim"])
        for r in ivf.ivf_topk_indexed(
            spark, maintained, query, cents, k=5, nprobe=3
        ).collect()
    ]
    assert got2 == want, (got2, want)


def test_compaction_recovers_from_mid_swap_crash(spark, tmp_path):
    """compact_cell_index's swap is two renames; a crash between them
    leaves `path` missing and `path + '.old'` holding the pre-swap
    index (plus a complete `.compact` rewrite). The next call must
    restore and proceed — not wedge, not lose rows."""
    import os
    import shutil

    from pyspark.sql import functions as F

    emb = _emb(spark)
    cents = ivf.train_coarse_quantizer(emb, k=K, iters=2)
    index = str(tmp_path / "index")
    ivf.build_cell_index(emb.filter(F.col("vec_id") % 2 == 0), cents, index)
    ivf.ingest_into_cell_index(
        emb.filter(F.col("vec_id") % 2 == 1), cents, index, 0
    )
    n = emb.count()
    # simulate the worst crash window: path renamed away, rewrite left
    shutil.copytree(index, index + ".compact")
    os.rename(index, index + ".old")
    stats = ivf.compact_cell_index(spark, index)
    idx = spark.read.parquet(index)
    assert idx.count() == n
    assert idx.select("vec_id").distinct().count() == n
    assert not os.path.exists(index + ".old")
    assert not os.path.exists(index + ".compact")
    assert stats["files_after"] == idx.select("cell").distinct().count()
