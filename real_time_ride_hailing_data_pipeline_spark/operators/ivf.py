"""IVF (inverted-file) approximate nearest neighbour: a TRAINED coarse
quantizer instead of the pre-given cluster label that
``similarity.bucketed_cosine_pairs`` uses as its cell.

Part of the LLM-training-data operator set (SURVEY.md §7 Stage 3); the
reference pipeline has no vector surface. This module closes the
"production needs a trained quantizer" caveat from the r2 review of
``operators/similarity.py``: k-means cells are learned from the data,
then ANN search probes only the ``nprobe`` cells nearest the query.

Scale design (the 100 TB story):

- **Training state is tiny and driver-resident by design.** Centroids
  are k x dim doubles (k<=256, dim<=4096 -> a few MB at most). Each
  Lloyd iteration is ONE distributed pass: a map-only assignment (the
  centroids are embedded as literals in a single column expression —
  no join, no shuffle of the fact side) followed by a per-dimension
  aggregation whose shuffle, after map-side partial aggregation, is
  bounded by partitions x k x dim rows — independent of table size.
- **Assignment is an expression, not a join.** ``array_min`` over an
  array of (distance, index) structs: struct ordering gives the min
  distance with deterministic index tie-break, entirely inside
  whole-stage codegen. The same expression serves training, cell
  materialization, and query routing.
- **Search prunes the scan.** A vector's cell is a plain integer
  column; written ``partitionBy("cell")`` the ``cell IN (probes)``
  predicate is partition pruning, so a k=1024 index scans ~nprobe/1024
  of the corpus. Scoring within probed cells reuses the exact-decimal
  cosine from ``similarity`` (engine-stable scores).
- **Deterministic end to end, no RNG.** Seeds are the k vectors with
  the smallest md5(vec_id) (a fixed pseudo-random-but-portable order);
  per-dimension centroid updates sum exact DECIMALs (order-independent)
  and divide once as doubles; distances fold sequentially per row.
  Two trainings of the same data give bit-identical centroids — tested.

Like the HLL and LSH queries, the registry entries are rows-only by
design (k-means is not expressible as a one-shot DuckDB oracle); the
executable claims — determinism, every-vector-assigned, distortion
monotonicity, recall vs the brute-force oracle-backed baseline — live
in tests/test_ivf.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark.operators.similarity import (
    cosine_similarity_expr,
)

Centroids = list[list[float]]


def _dist_struct_array(vec_col: str, centroids: Centroids) -> str:
    """SQL expression: array of (squared-L2-distance, centroid-index)
    structs, one per centroid, with the centroid components inlined as
    literals — evaluation is map-only and codegen'd."""
    entries = []
    for j, c in enumerate(centroids):
        lits = ",".join(repr(float(x)) + "D" for x in c)
        entries.append(
            f"named_struct('d', aggregate(zip_with({vec_col}, array({lits}), "
            f"(x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), "
            f"0D, (acc, v) -> acc + v), 'j', {j})"
        )
    return f"array({','.join(entries)})"


def nearest_cell_expr(vec_col: str, centroids: Centroids) -> Column:
    """Index of the nearest centroid (squared L2), ties to the lowest
    index via struct ordering. Pure column expression: no join, no
    shuffle, no Python."""
    return F.expr(f"array_min({_dist_struct_array(vec_col, centroids)}).j")


def nearest_cells_expr(vec_col: str, centroids: Centroids, nprobe: int) -> Column:
    """The ``nprobe`` nearest centroid indices (for query routing):
    sort the distance structs, take the index slice."""
    arr = _dist_struct_array(vec_col, centroids)
    return F.expr(
        f"transform(slice(array_sort({arr}), 1, {nprobe}), s -> s.j)"
    )


def train_coarse_quantizer(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Centroids:
    """Lloyd's k-means over the embedding column; returns the k
    centroids as a driver-side list (kilobytes — the broadcastable
    model, analogous to collecting HLL registers).

    Seeds: the k rows with the smallest md5(vec_id) — deterministic,
    engine-portable, and scattered (md5 order is uncorrelated with
    insertion order). Each iteration: map-only assignment via
    ``nearest_cell_expr`` + one (cell, dim) aggregation with exact
    DECIMAL sums, so re-training is bit-reproducible regardless of
    partitioning. Empty cells keep their previous centroid (standard
    Lloyd fallback, deterministic)."""
    seeds = (
        embeddings.orderBy(F.md5(F.col(id_col).cast("string").cast("binary")))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids: Centroids = [[float(x) for x in r[0]] for r in seeds]

    for _ in range(iters):
        assigned = embeddings.select(
            nearest_cell_expr(vec_col, centroids).alias("cell"),
            F.col(vec_col).alias("_v"),
        )
        # per-(cell, dim) exact sums; shuffle rows <= partitions*k*dim
        per_dim = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("x").cast("double").cast("decimal(30,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new: dict[int, dict[int, float]] = {}
        for r in per_dim:
            new.setdefault(r["cell"], {})[r["pos"]] = float(r["s"]) / r["n"]
        centroids = [
            [new[j][p] for p in range(len(centroids[j]))] if j in new else centroids[j]
            for j in range(k)
        ]
    return centroids


def assign_cells(
    embeddings: DataFrame,
    centroids: Centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize each vector's IVF cell — the column a production
    index writes ``partitionBy`` so probe filters become partition
    pruning. Map-only."""
    return embeddings.withColumn("cell", nearest_cell_expr(vec_col, centroids))


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    centroids: Centroids,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by cosine: score only vectors in the nprobe
    cells nearest the query vector. The probe set is computed on the
    (1-row) query side and broadcast; ``cell IN probes`` prunes the
    big side before any scoring. Same output contract as
    ``similarity.brute_force_topk`` (vec_id, sim) — recall is bounded
    against it in tests."""
    emb = assign_cells(embeddings, centroids, id_col, vec_col)
    q = F.broadcast(
        query.select(F.col(vec_col).alias("_qvec")).withColumn(
            "_probes", nearest_cells_expr("_qvec", centroids, nprobe)
        )
    )
    scored = (
        emb.join(q, F.array_contains(F.col("_probes"), F.col("cell")))
        .select(F.col(id_col), cosine_similarity_expr(vec_col, "_qvec").alias("sim"))
    )
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def cell_stats(
    embeddings: DataFrame,
    centroids: Centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-quality summary per cell: population and mean squared
    distance to the centroid (the distortion k-means minimizes).
    One map-only pass + a k-row aggregate."""
    arr = _dist_struct_array(vec_col, centroids)
    assigned = embeddings.select(
        F.expr(f"array_min({arr}).j").alias("cell"),
        F.expr(f"array_min({arr}).d").alias("dist_sq"),
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("dist_sq"), 6).alias("avg_dist_sq"),
        )
        .orderBy("cell")
    )
