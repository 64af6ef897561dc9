"""Distributed PCA over an embedding column.

Dimensionality reduction is a standard pre-step for clustering /
near-dup detection over embeddings (reduce 1k-d model outputs to the
50-100 dims that carry the variance, then run k-means / LSH there).
The scale-correct decomposition for d ≪ n is the classic one-pass
moment accumulation:

1. ``embedding_moments``: each Arrow batch contributes its Gram matrix
   Σxxᵀ, column sums Σx and count — d²+d+1 numbers per batch computed
   as ONE numpy matmul (`mapInPandas`), then a single partial-agg
   shuffle of those tiny partials. The corpus is scanned once; nothing
   driver-side scales with n.
2. ``embedding_covariance``: sample covariance entries
   (Σxy − ΣxΣy/n)/(n−1) as (i, j, cov) rows — the value-oracle
   surface (DuckDB's ``covar_samp`` over exploded pairs agrees to 6
   decimals).
3. ``pca_components``: eigendecomposition of the d×d covariance on the
   driver (numpy ``eigh`` — d is tens-to-hundreds; this is microseconds
   and NOT a distributed problem). Component sign is fixed by making
   each eigenvector's largest-|coordinate| entry positive, so results
   are deterministic across BLAS builds.
4. ``pca_project``: x → Wᵀ(x − μ) as one Arrow-batched matmul per
   batch — map-side only, no shuffle; the components ride into the
   closure as a broadcast-by-value numpy array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_partials(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """The aggregated (i, j, sxy, sx, sy, n) moment table as a
    DataFrame — one MapInPandas pass over the corpus emitting d²-row
    numpy Gram partials per batch, then one partial-agg shuffle of
    those tiny rows. Exposed separately so the plan can be audited
    (PLANS.md) and the table persisted/reused."""
    first = emb.select(F.size(vec_col).alias("d")).where(F.col("d") > 0).first()
    if first is None:
        raise ValueError("no non-empty vectors to fit moments on")
    dim = int(first["d"])

    def batches(it):
        for pdf in it:
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = M.T @ M
            out = {
                "i": np.repeat(np.arange(dim), dim),
                "j": np.tile(np.arange(dim), dim),
                "sxy": g.ravel(),
                "sx": np.repeat(M.sum(axis=0), dim),
                "sy": np.tile(M.sum(axis=0), dim),
                "n": np.full(dim * dim, len(M), dtype=np.int64),
            }
            yield pd.DataFrame(out)

    partials = emb.select(vec_col).mapInPandas(
        batches, "i int, j int, sxy double, sx double, sy double, n long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("n").alias("n"),
    )


def embedding_moments(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, int]:
    """(gram Σxxᵀ, colsum Σx, n) accumulated in one corpus pass."""
    tot = moment_partials(emb, vec_col).collect()
    dim = max(r["i"] for r in tot) + 1
    gram = np.zeros((dim, dim))
    colsum = np.zeros(dim)
    n = 0
    for r in tot:
        gram[r["i"], r["j"]] = r["sxy"]
        if r["j"] == 0:
            colsum[r["i"]] = r["sx"]
            n = int(r["n"])
    return gram, colsum, n


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
    upper_only: bool = True,
) -> DataFrame:
    """Sample covariance matrix as (i, j, cov) rows (i ≤ j when
    ``upper_only``) — computed from the one-pass moments, returned as a
    (tiny, d²-row) DataFrame so it can be value-verified and joined.

    The heavy lifting happened in ``embedding_moments``; this is d²
    arithmetic on the driver re-parallelized for the verification
    surface."""
    gram, colsum, n = embedding_moments(emb, vec_col)
    if n < 2:
        raise ValueError(f"need >= 2 vectors for covariance, got {n}")
    dim = len(colsum)
    rows = []
    for i in range(dim):
        for j in range(i if upper_only else 0, dim):
            cov = (gram[i, j] - colsum[i] * colsum[j] / n) / (n - 1)
            rows.append((i, j, float(cov)))
    spark = emb.sparkSession
    out = spark.createDataFrame(rows, "i bigint, j bigint, cov double")
    # + 0.0 canonicalizes IEEE -0.0 → +0.0 after rounding (the oracle
    # does the same — they'd hash differently otherwise)
    return out.select("i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov"))


def pca_components(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(components W [k×d], mean μ [d]) for the top-k principal axes,
    eigenvalue-descending, sign-fixed (largest-|coord| entry > 0)."""
    gram, colsum, n = embedding_moments(emb, vec_col)
    if n < 2:
        raise ValueError(f"need >= 2 vectors for PCA, got {n}")
    mu = colsum / n
    cov = (gram - np.outer(colsum, colsum) / n) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order].T  # k × d
    for r in range(W.shape[0]):
        lead = np.argmax(np.abs(W[r]))
        if W[r, lead] < 0:
            W[r] = -W[r]
    return W, mu


def pca_project(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
    components: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """emb + ``out_col``: array<double> of the k principal coordinates
    Wᵀ(x − μ). Pass ``components`` to reuse a fitted (W, μ) — e.g.
    project new batches under the model fitted on a reference corpus."""
    W, mu = components if components is not None else pca_components(
        emb, k, vec_col
    )
    Wt = W.T.copy()

    @F.pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        Y = (M - mu[None, :]) @ Wt
        return pd.Series(list(Y))

    return emb.withColumn(out_col, proj(F.col(vec_col)))


def pinned_basis_project(
    emb: DataFrame,
    k: int = 8,
    basis_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "coords",
    orthogonalize: bool = True,
) -> DataFrame:
    """emb + ``out_col``: coordinates of every vector against a PINNED
    basis built from the embeddings of ``basis_ids`` (default ids
    1..k) — the ivf_pinned pattern applied to projection: every basis
    number is a float64 function of table rows, so a SQL oracle can
    replay basis construction AND projection and value-check the
    distributed Arrow matmul kernel that eigen-PCA (``pca_project``)
    shares. Eigen-PCA itself stays numpy-pinned in tests —
    eigendecomposition has no SQL twin.

    ``orthogonalize=True``: classical Gram-Schmidt orthonormal basis —
    the mathematically nicer frame, for in-engine use.
    ``orthogonalize=False``: unit-NORMALIZED raw directions u_r =
    v_r/‖v_r‖ only — the cross-engine-oracle-safe frame. GS is a
    cancellation amplifier: its dot-product sums pick up engine
    summation-order jitter and the measured basis divergence between
    numpy and DuckDB reaches ~1e-11 per entry, enough to flip 6-dp
    rounding boundaries on the projected coordinates (observed: 1 of
    4000 values at sf0.001). Normalize-only keeps every coordinate
    within an ulp-jitter (~1e-15) of both engines — boundary risk
    ~1e-9 — because the only cross-engine freedom left is the order of
    one 64-term product sum.
    """
    ids = list(basis_ids) if basis_ids is not None else list(
        range(1, k + 1)
    )
    if len(ids) != k:
        raise ValueError(f"need exactly k={k} basis ids, got {len(ids)}")
    rows = (
        emb.where(F.col(id_col).isin(ids))
        .select(id_col, vec_col)
        .collect()
    )
    by_id = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64)
             for r in rows}
    missing = [i for i in ids if i not in by_id]
    if missing:
        raise ValueError(f"basis ids missing from table: {missing}")
    V = np.stack([by_id[i] for i in ids])
    U: list[np.ndarray] = []
    for r in range(k):
        w = V[r].copy()
        if orthogonalize:
            for s in range(r):
                w = w - (V[r] @ U[s]) * U[s]
        nrm = float(np.sqrt(w @ w))
        if nrm == 0.0:
            raise ValueError(
                f"basis vector {ids[r]} is linearly dependent on "
                "earlier ones"
            )
        U.append(w / nrm)
    W = np.stack(U)  # k × d rows; orthonormal iff orthogonalize
    return pca_project(
        emb, k, vec_col, out_col,
        components=(W, np.zeros(W.shape[1])),
    )
