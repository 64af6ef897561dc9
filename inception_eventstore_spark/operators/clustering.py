"""Embedding-space clustering for corpus curation.

Training-data pipelines cluster document embeddings to diversify,
balance, and prune a corpus (SemDeDup, DSIR, cluster-balanced mixes).
This module supplies the Spark-first pieces:

- ``kmeans_fit``: DISTRIBUTED Lloyd's — unlike the bounded driver-side
  training used for the IVF quantizer (``similarity.build_ivf_index``,
  which deliberately trains on a sample because quantizer quality
  saturates), this iterates over the FULL table for workloads whose
  cluster means must reflect every row. Per iteration: one Arrow-batched
  assignment pass (broadcast centroid matrix, one matmul per batch) and
  one map-side-combinable centroid update (posexplode → partial
  sum/count per (cell, dim) → k·dim tiny rows to the driver). No
  caching requirement, no full-table shuffle: the wide shuffle payload
  is k·dim·partitions partial aggregates, independent of table size.
- ``assign_clusters``: the same Arrow assignment as a standalone op.
- ``assign_clusters_exact``: a join-based JVM-expression assignment
  (no Python) used by the oracle-paired declared query — distance is a
  deterministic index-order left fold, ties broken by centroid id, so
  any engine reproduces it bit-for-bit.
- ``cluster_sizes`` / ``inertia``: the fit diagnostics.
- ``balanced_sample``: deterministic per-cluster top-n by a portable
  md5 order — the cluster-balancing step, growth-stable like
  ``sampling.hash_split`` (adding rows never flips which earlier rows
  are kept, given distinct ids).
"""

from __future__ import annotations

import numpy as np
# module-scope pandas: pandas_udf resolves stringized type hints
# ('pd.Series' under future-annotations) via module globals
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.similarity import (
    _cell_assign_udf,
    _lloyd_kmeans,
)


def assign_clusters(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment (Arrow batch matmul, hot path)."""
    from inception_eventstore_spark.functions.spread import spread

    return spread(embeddings).withColumn(
        out_col, _cell_assign_udf(centroids)(F.col(vec_col))
    )


def _fold_sq_dist(a: Column, b: Column) -> Column:
    """Σ (a_i-b_i)² as an index-order left fold from 0.0 — the addition
    order is pinned, so any engine that folds left reproduces the exact
    IEEE double (the declared-query oracle does)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters_exact(
    embeddings: DataFrame,
    centroid_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """Join-based assignment: broadcast the centroid rows, score every
    (row, centroid) pair with the deterministic fold distance, keep the
    argmin per row (ties → smallest centroid id).

    All-JVM expressions — slower per row than the Arrow matmul (the
    fold is interpreted) but bit-for-bit portable; use for small k and
    correctness surfaces, ``assign_clusters`` for the hot path.
    Returns (id, cluster, dist2)."""
    pairs = embeddings.select(
        F.col(id_col), F.col(vec_col).alias("_v")
    ).crossJoin(
        F.broadcast(
            centroid_df.select(
                F.col(cid_col).alias("_cid"), F.col(cvec_col).alias("_cv")
            )
        )
    )
    scored = pairs.select(
        id_col,
        F.col("_cid"),
        _fold_sq_dist(F.col("_v"), F.col("_cv")).alias("dist2"),
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "_cid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("_cid").alias("cluster"), "dist2")
    )


def _update_centroids(
    assigned: DataFrame,
    k: int,
    prev: np.ndarray,
    vec_col: str,
    cluster_col: str,
) -> np.ndarray:
    """One centroid update: posexplode the vectors, partial-aggregate
    (sum, count) per (cluster, dim) — map-side combine shrinks the
    shuffle to k·dim rows per input partition — and finish on the
    driver. Empty clusters keep their previous centroid."""
    sums = (
        assigned.select(
            F.col(cluster_col).alias("_c"),
            F.posexplode(F.col(vec_col)).alias("_d", "_x"),
        )
        .groupBy("_c", "_d")
        .agg(
            F.sum(F.col("_x").cast("double")).alias("_s"),
            F.count("*").alias("_n"),
        )
        .collect()
    )
    C = prev.copy()
    counts = np.zeros(k, dtype=np.int64)
    for r in sums:
        C[r._c, r._d] = r._s
        counts[r._c] = r._n
    for c in range(k):
        if counts[c] > 0:
            C[c] /= counts[c]
        # else: keep previous centroid (empty-cluster carry-over)
    return C


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_sample: int = 16_384,
    tol: float = 1e-6,
) -> list[list[float]]:
    """Full-data Lloyd's over the cluster. Initialization is the
    deterministic hash-ordered driver sample (k-means++ on ≤
    ``init_sample`` points); every subsequent assign/update pass runs
    distributed over the whole table. Returns the k×dim centroid list.

    Per-iteration cost at 100 TB: one table scan (Arrow assignment) +
    one partial aggregation whose shuffle volume is k·dim per input
    partition — the table itself is never shuffled or cached."""
    init_rows = (
        embeddings.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(init_sample)
        .collect()
    )
    if not init_rows:
        raise ValueError("cannot fit k-means on an empty DataFrame")
    X = np.array([r["_v"] for r in init_rows], dtype=np.float64)
    C = _lloyd_kmeans(X, k, seed, max_iter=3)
    k = C.shape[0]
    for _ in range(max_iter):
        assigned = assign_clusters(
            embeddings, [list(map(float, c)) for c in C], vec_col=vec_col
        )
        newC = _update_centroids(assigned, k, C, vec_col, "cluster")
        shift = float(np.abs(newC - C).max())
        C = newC
        if shift <= tol:
            break
    return [list(map(float, c)) for c in C]


def cluster_sizes(assigned: DataFrame,
                  cluster_col: str = "cluster") -> DataFrame:
    return assigned.groupBy(cluster_col).agg(F.count("*").alias("n"))


def inertia(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> float:
    """Σ min-centroid squared distance (the k-means objective)."""
    cent = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    d2 = _fold_sq_dist(
        F.col(vec_col), F.element_at(cent, F.col(cluster_col) + 1)
    )
    return assigned.select(F.sum(d2).alias("s")).collect()[0]["s"]


def balanced_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
) -> DataFrame:
    """Deterministic n-per-cluster sample: rank by the portable
    md5(group ∥ id) order inside each cluster, keep the first n.

    One window shuffle on the cluster key; the md5 rank makes the
    choice seed-free and reproducible in any engine (unlike
    ``sampleBy``, whose picks depend on Spark's RNG stream and
    therefore on partitioning)."""
    key = F.md5(
        F.concat_ws("|", F.col(group_col).cast("string"),
                    F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def semantic_dedup_flags(
    embeddings: DataFrame,
    centroid_df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """(id, cluster, is_dup): SemDeDup (Abbas et al. 2023) — semantic
    near-duplicate removal bucketed by embedding CLUSTER instead of an
    LSH family: assign every vector to its nearest centroid, compare
    pairs only WITHIN a cluster, and among each pair with cosine >=
    ``threshold`` keep the member LESS similar to its cluster centroid
    (the paper's keep-the-outlier rule — it preserves diversity),
    deterministic tiebreak by id. ``is_dup`` = 1 marks the member a
    curation pass drops.

    Scale: the within-cluster comparison is all-pairs BY DESIGN — the
    cluster count is the dial that keeps cells small (SemDeDup uses
    50k clusters for LAION); cost is Σ|cell|², never corpus². One
    shuffle on the cluster key; assignment + centroid cosine run in
    ONE Arrow kernel per batch (a k-cell fold expression re-evaluates
    k·dim interpreted lambdas per row — at 16 cells that dominated the
    whole operator), pair cosines in another; the keep-rule ranks on
    the 6-dp-rounded centroid cosine, so the drop set is
    engine-portable wherever pair cosines and assignment margins sit
    away from their boundaries (same expansion-vs-fold ulp contract as
    `assign_clusters` vs `assign_clusters_exact`, pinned in pytest).
    Centroids are collected driver-side — they are bounded driver
    state by construction, exactly as in `build_ivf_index`."""
    from inception_eventstore_spark.functions.spread import spread
    from inception_eventstore_spark.operators.similarity import (
        _cosine_pair_udf,
    )

    crows = centroid_df.select(cid_col, cvec_col).orderBy(cid_col).collect()
    if not crows:
        raise ValueError("centroid_df is empty")
    cids = [int(r[0]) for r in crows]
    C = np.asarray(
        [[float(x) for x in r[1]] for r in crows], dtype=np.float64
    )
    Cn = (C**2).sum(axis=1)
    Cnorm = np.sqrt(Cn)

    @F.pandas_udf("ci int, cc double")
    def assign_cc(v: pd.Series) -> pd.DataFrame:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        D = (M**2).sum(1)[:, None] - 2.0 * (M @ C.T) + Cn[None, :]
        ci = D.argmin(axis=1)  # first min = lowest cid (sorted above)
        dots = (M * C[ci]).sum(axis=1)
        cc = dots / (np.linalg.norm(M, axis=1) * Cnorm[ci])
        return pd.DataFrame(
            {"ci": ci.astype("int32"), "cc": np.round(cc, 6)}
        )

    cid_arr = F.array(*[F.lit(c).cast("long") for c in cids])
    m = (
        spread(embeddings)
        .select(
            F.col(id_col),
            F.col(vec_col).alias("_v"),
            assign_cc(F.col(vec_col)).alias("_s"),
        )
        .select(
            id_col,
            "_v",
            F.element_at(cid_arr, F.col("_s.ci") + 1).alias("cluster"),
            F.col("_s.cc").alias("_cc"),
        )
    )
    # m feeds BOTH pair sides and the final flag join — materialize the
    # assignment + centroid-cosine pass once (lazy local checkpoint,
    # computed on first use) instead of three times
    m = m.localCheckpoint(eager=False)
    left = m.select(
        "cluster",
        F.col(id_col).alias("_ia"),
        F.col("_v").alias("_va"),
        F.col("_cc").alias("_ca"),
    )
    right = m.select(
        "cluster",
        F.col(id_col).alias("_ib"),
        F.col("_v").alias("_vb"),
        F.col("_cc").alias("_cb"),
    )
    # pair (a drops) iff some same-cluster b has cos >= t and b ranks
    # LOWER on (centroid-cosine, id) — b is the kept outlier
    dup = (
        left.join(right, "cluster")
        .where(
            (F.col("_ia") != F.col("_ib"))
            & (
                (F.col("_cb") < F.col("_ca"))
                | ((F.col("_cb") == F.col("_ca"))
                   & (F.col("_ib") < F.col("_ia")))
            )
        )
        .where(
            _cosine_pair_udf()(F.col("_va"), F.col("_vb"))
            >= float(threshold)
        )
        .select(F.col("_ia").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        m.join(dup, id_col, "left")
        .select(
            id_col,
            F.col("cluster").cast("bigint").alias("cluster"),
            F.coalesce(F.col("_dup"), F.lit(0)).cast("bigint").alias(
                "is_dup"
            ),
        )
    )


def dbscan_2d(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int = 5,
) -> DataFrame:
    """Grid-bucketed DBSCAN (Ester 1996) over 2-d points — density
    clustering without an all-pairs join: each point lands in an
    eps-sized grid cell, candidate neighbors come ONLY from the 3×3
    adjacent cells (a 9-way map-side explode joined on the cell key —
    every true eps-neighbor is inside that stencil, so the pruning is
    lossless), and exact dist² ≤ eps² filters the survivors.

    Roles: a point with ≥ ``min_pts`` neighbors (EXCLUDING itself) is
    a ``core``; core points within eps connect into clusters via the
    large-star/small-star connected-components operator (cluster id =
    smallest core id, deterministic); a non-core point within eps of a
    core is a ``border`` assigned to its smallest-id neighboring
    cluster (the deterministic tie-break for DBSCAN's order-dependent
    border assignment); everything else is ``noise`` (cluster NULL).

    Determinism: cells are floor(x/eps) on identically-computed
    doubles; dist² is the fixed-order expression (Δx² + Δy²) compared
    against the in-engine product eps·eps — bit-identical in any
    IEEE engine, so roles and clusters replay exactly.

    Scale: the only data-sized shuffles are the cell-key equi-join
    (each point moves 9× — the stencil, not the data, is the constant)
    and the neighbor-count partial agg; within-cell pair fan-out is
    bounded by the densest cell, which eps controls — the same dial
    the SemDeDup cell count turns. CC is O(log² n) rounds on the
    core-core edge list only.
    """
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    e = float(eps)
    pts = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).withColumns(
        {
            "_cx": F.floor(F.col("_x") / F.lit(e)).cast("bigint"),
            "_cy": F.floor(F.col("_y") / F.lit(e)).cast("bigint"),
        }
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.withColumn("_o", F.explode(offsets)).select(
        F.col("_id").alias("_ia"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        (F.col("_cx") + F.col("_o.dx")).alias("_kx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_ky"),
    )
    right = pts.select(
        F.col("_id").alias("_ib"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        F.col("_cx").alias("_kx"),
        F.col("_cy").alias("_ky"),
    )
    dx = F.col("_xa") - F.col("_xb")
    dy = F.col("_ya") - F.col("_yb")
    pairs = (
        left.join(right, ["_kx", "_ky"])
        .where(
            (F.col("_ia") != F.col("_ib"))
            & (dx * dx + dy * dy <= F.lit(e) * F.lit(e))
        )
        .select("_ia", "_ib")
        .localCheckpoint(eager=False)  # reused by counts, edges, borders
    )
    ncount = pairs.groupBy(F.col("_ia").alias("_id")).agg(
        F.count("*").cast("bigint").alias("_nn")
    )
    roles = pts.select("_id").join(ncount, "_id", "left").select(
        "_id",
        (F.coalesce("_nn", F.lit(0)) >= min_pts).alias("_core"),
    ).localCheckpoint(eager=False)
    cores = roles.where("_core").select("_id")
    core_edges = (
        pairs.join(cores.withColumnRenamed("_id", "_ia"), "_ia")
        .join(cores.withColumnRenamed("_id", "_ib"), "_ib")
        .select("_ia", "_ib")
    )
    from inception_eventstore_spark.operators.components import (
        connected_components,
    )

    cc = connected_components(core_edges, src="_ia", dst="_ib")
    core_assign = (
        cores.join(
            cc.withColumnRenamed("node", "_id"), "_id", "left"
        )
        # isolated cores (no core neighbor) head their own cluster
        .select(
            "_id",
            F.coalesce("component", F.col("_id")).alias("cluster"),
            F.lit("core").alias("role"),
        )
    )
    borders = (
        pairs.join(
            core_assign.select(
                F.col("_id").alias("_ib"),
                F.col("cluster").alias("_bc"),
            ),
            "_ib",
        )
        .groupBy(F.col("_ia").alias("_id"))
        .agg(F.min("_bc").alias("cluster"))
        .join(roles.where(~F.col("_core")).select("_id"), "_id")
        .select("_id", "cluster", F.lit("border").alias("role"))
    )
    assigned = core_assign.unionByName(borders)
    return (
        pts.select("_id")
        .join(assigned, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.col("cluster").cast("bigint").alias("cluster"),
        )
    )
