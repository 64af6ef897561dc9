"""Embedding similarity search (SURVEY §2 F extensions).

Baseline: brute-force top-k over the full table — one broadcast of the
query vector, one narrow pass, one ordered limit (Spark's TakeOrdered is
a per-partition top-k + driver merge, no full sort shuffle).

Scale path: random-hyperplane LSH buckets — signatures computed once and
persisted alongside the table at ingest; a query probes only its own
bucket (optionally hamming-adjacent buckets), then exact re-rank. All
math in JVM column expressions (zip_with / aggregate over DOUBLE).

Near-dup variant: all-pairs cosine ≥ threshold within LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a left-fold in index order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2",
) -> DataFrame:
    """Exact top-k: (id, dist) ascending for l2, descending cosine → the
    output column is always ``dist`` ordered best-first, ties broken by
    id.

    The L2 path routes through `multi_query_topk`'s vectorized Arrow
    kernel with |Q| = 1 — one numpy matmul per batch, local top-k per
    partition, a k-row window reduce — instead of the interpreted
    ``F.aggregate`` fold (~30x slower per CLAUDE.md's own invariant;
    the fold stays in `dot`/`l2_distance` as the engine-portable
    oracle twin used by `assign_clusters_exact` and the declared
    queries). Cosine keeps the fold: no declared query or smoke runs
    it over bulk data."""
    if metric == "l2":
        out = multi_query_topk(
            embeddings,
            [(0, [float(x) for x in query_vector])],
            k=k,
            id_col=id_col,
            vec_col=vec_col,
        )
        return out.orderBy("rank").select(id_col, "dist")
    if metric == "cosine":
        q = F.array(*[F.lit(float(x)) for x in query_vector])
        d = -cosine_similarity(F.col(vec_col), q)
        return (
            embeddings.select(F.col(id_col), d.alias("dist"))
            .orderBy(F.col("dist").asc(), F.col(id_col).asc())
            .limit(k)
        )
    raise ValueError(f"unknown metric {metric!r}")


def _plane_signs(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane vectors (same on driver and every
    executor — plain python PRNG seeded per plane)."""
    import random

    return [
        [
            1.0 if random.Random(seed * 1_000_003 + p * 8_191 + i).random() < 0.5
            else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64,
                         seed: int = 7) -> Column:
    """Random-hyperplane LSH signature: bit p = sign(v · r_p) with r_p a
    deterministic ±1 vector. The plane vectors are LITERAL arrays baked
    into the plan (constants — computing them per row from hashes cost
    n_planes·dim hash calls per row). Returns a LONG bucket id
    (n_planes ≤ 63)."""
    signs = _plane_signs(n_planes, dim, seed)

    def plane_bit(p: int) -> Column:
        r = F.array(*[F.lit(s) for s in signs[p]])
        s = F.aggregate(
            F.zip_with(vec, r, lambda x, sgn: x.cast("double") * sgn),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + plane_bit(p)
    return sig


def hamming_ball(sig: int, n_planes: int, radius: int) -> list[int]:
    """All bucket ids within hamming distance ``radius`` of ``sig`` —
    the multiprobe set shared by the ad-hoc and persisted-index paths."""
    probe = {sig}
    frontier = {sig}
    for _ in range(max(0, radius)):
        frontier = {s ^ (1 << p) for s in frontier for p in range(n_planes)}
        probe |= frontier
    return sorted(probe)


def rank_cells(centroids: list[list[float]],
               query_vector: list[float]) -> list[int]:
    """Cell indices ordered by centroid L2 distance to the query
    (driver-side — the centroid list is tiny by construction)."""
    import math

    def _l2(a: list[float], b: list[float]) -> float:
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    return sorted(range(len(centroids)),
                  key=lambda c: _l2(centroids[c], query_vector))


def lsh_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
    probe_radius: int = 2,
) -> DataFrame:
    """Approximate top-k (l2): restrict the exact scan to rows whose LSH
    bucket is within hamming distance ``probe_radius`` of the query's
    bucket, then re-rank exactly. Recall/candidate-volume is tuned via
    n_planes × probe_radius; the expected candidate set is
    |table|·Σ C(n_planes, r)/2^{n_planes}.

    If the input already carries a ``_sig`` column (an
    ``ann_index.LshVectorIndex`` table, where it's the partition
    column), it is trusted and the probe is a pruned scan; otherwise
    signatures are computed on the fly — the ad-hoc path for tables
    not indexed at ingest."""
    dim = len(query_vector)
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    if "_sig" in embeddings.columns:
        sigged = embeddings
    else:
        from inception_eventstore_spark.functions.spread import spread

        sigged = spread(embeddings).withColumn(
            "_sig", _signature_udf(n_planes, dim, seed)(F.col(vec_col))
        )
    qsig = _py_signature([float(x) for x in query_vector], n_planes, dim, seed)
    probe = hamming_ball(qsig, n_planes, probe_radius)
    cand = sigged.where(F.col("_sig").isin(probe))
    return (
        cand.select(F.col(id_col), l2_distance(F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def multi_query_topk(
    corpus: DataFrame,
    queries: list[tuple],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT batch top-k — the serving shape: many query vectors
    answered in ONE corpus scan, instead of one scan per query.

    ``queries`` is a list of (query_id, vector). Stage 1 computes the
    full distance matrix per Arrow batch with one numpy matmul (the
    query matrix rides into the closure, broadcast by value) and emits
    only each batch's LOCAL top-k per query — so the shuffle carries
    ≤ batches·|Q|·k tiny rows, never |corpus|·|Q| pairs. Stage 2 is a
    window top-k over that reduced set. Returns (query_id, rank,
    vec_id, dist) — exact, ties broken by id, verified against a
    DuckDB cross-join oracle."""
    if not queries:
        raise ValueError("queries must be non-empty")
    qids = [int(q) for q, _ in queries]
    Q = np.asarray([v for _, v in queries], dtype=np.float64)
    Qn = (Q**2).sum(axis=1)

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            # ||x-q||² per (row, query); sqrt deferred to the reduce
            D = (M**2).sum(1)[:, None] - 2.0 * (M @ Q.T) + Qn[None, :]
            kk = min(k, len(ids))
            out_q, out_id, out_d = [], [], []
            for j, qid in enumerate(qids):
                # lexsort: distance then id — the local cut keeps the
                # SAME rows the global (dist, id) order would, so
                # equal-distance ties at the k boundary are lossless
                # (argpartition alone cuts ties arbitrarily)
                top = np.lexsort((ids, D[:, j]))[:kk]
                out_q.extend([qid] * kk)
                out_id.extend(ids[top])
                out_d.extend(D[top, j])
            yield pd.DataFrame(
                {"query_id": out_q, id_col: out_id, "_d2": out_d}
            )

    reduced = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, f"query_id long, {id_col} long, _d2 double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("_d2").asc(), F.col(id_col).asc()
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            id_col,
            F.sqrt(F.greatest("_d2", F.lit(0.0))).alias("dist"),
        )
    )


def _lloyd_kmeans(
    X: "np.ndarray", n_cells: int, seed: int, max_iter: int
) -> "np.ndarray":
    """Driver-side k-means: k-means++ seeding + Lloyd iterations, all
    numpy matmuls. Empty cells are reseeded to the point farthest from
    its assigned centroid (standard FAISS-style repair)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    k = min(n_cells, n)
    C = np.empty((k, X.shape[1]), dtype=np.float64)
    C[0] = X[rng.integers(n)]
    d2 = ((X - C[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        total = d2.sum()
        idx = rng.choice(n, p=d2 / total) if total > 0 else rng.integers(n)
        C[i] = X[idx]
        d2 = np.minimum(d2, ((X - C[i]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        D = (X**2).sum(1)[:, None] - 2.0 * (X @ C.T) + (C**2).sum(1)[None, :]
        a = D.argmin(axis=1)
        newC = C.copy()
        for c in range(k):
            members = a == c
            if members.any():
                newC[c] = X[members].mean(axis=0)
            else:
                newC[c] = X[D.min(axis=1).argmax()]
        if np.allclose(newC, C):
            return newC
        C = newC
    return C


def _cell_assign_udf(centroids: list[list[float]]):
    """Arrow-batched nearest-centroid assignment: one matmul per batch
    against the (tiny) centroid matrix baked into the closure."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = (C**2).sum(axis=1)

    @F.pandas_udf("int")
    def cell(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        D = (M**2).sum(1)[:, None] - 2.0 * (M @ C.T) + Cn[None, :]
        return pd.Series(D.argmin(axis=1).astype(np.int32))

    return cell


def build_ivf_index(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
    train_sample: int = 65_536,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means cells over the embedding space.

    Returns (assigned, centroids) where ``assigned`` is the input plus a
    ``_cell`` column (the inverted-file key — at 100 TB this is the
    partition column the table is written under, so a probe scans only
    its cells) and ``centroids`` is the driver-side cell→center list.

    Trained FAISS-style on a bounded sample, never the full table: a
    deterministic hash-ordered TakeOrdered pulls ≤ ``train_sample``
    vectors to the driver (per-partition top-k, no full sort), Lloyd
    runs there in numpy, and the full table then gets exactly ONE
    vectorized assignment pass. A distributed k-means (pyspark.ml)
    would cache the whole dataset and rescan it every iteration —
    ~max_iter full passes over 100 TB for a quantizer whose quality
    saturates at a few tens of thousands of training points."""
    from inception_eventstore_spark.functions.spread import spread

    sample = (
        embeddings.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(train_sample)
        .collect()
    )
    if not sample:
        raise ValueError(
            "cannot build an IVF index over an empty embeddings DataFrame"
        )
    X = np.array([r["_v"] for r in sample], dtype=np.float64)
    C = _lloyd_kmeans(X, n_cells, seed, max_iter)
    centroids = [list(map(float, c)) for c in C]
    assigned = spread(embeddings).withColumn(
        "_cell", _cell_assign_udf(centroids)(F.col(vec_col))
    )
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vector: list[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank cells by centroid distance to the query, scan the
    ``n_probe`` nearest cells, exact re-rank inside them. Expected scan
    fraction ≈ n_probe / n_cells of the table."""
    probe = rank_cells(centroids, query_vector)[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        assigned.where(F.col("_cell").isin(probe))
        .select(F.col(id_col), l2_distance(F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def _signature_udf(n_planes: int, dim: int, seed: int):
    """Arrow-batched signature kernel: one numpy matmul per batch.

    The column-expression formulation (fold per plane per row) pays
    interpreted higher-order-function overhead per element; the matmul
    computes all plane dots for a whole Arrow batch at once (~10× at
    2k × 64 dims). Bit p set iff v·r_p > 0 — identical semantics."""
    R = np.array(_plane_signs(n_planes, dim, seed), dtype=np.float64).T  # dim×p
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        bits = (M @ R) > 0
        return pd.Series(bits @ weights)

    return sig


def _py_signature(vec: list[float], n_planes: int, dim: int, seed: int) -> int:
    """Driver-side signature of one vector — same math as the kernel."""
    R = np.array(_plane_signs(n_planes, dim, seed), dtype=np.float64).T
    bits = (np.asarray(vec, dtype=np.float64) @ R) > 0
    return int(bits @ (1 << np.arange(n_planes)).astype(np.int64))


def _cosine_pair_udf():
    """Arrow-batched pairwise cosine: rowwise dot / norms in numpy."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            return pd.Series(np.where(den > 0, num / den, 0.0))

    return cos


def cosine_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs: bucket by hyperplane signature with
    hamming-1 multiprobe (one side explodes to its own bucket plus every
    1-bit-flipped bucket, so pairs that straddle a single near-zero
    hyperplane still collide), exact cosine verify on the survivors.
    Returns (id_a, id_b, cosine).

    Candidates stay narrow (id + bucket) through the join; vectors are
    joined back only for the verification — at scale the probe explode
    multiplies an 16-byte row, not the embedding payload."""
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return embeddings.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    dim = int(dim_row["d"])
    # a persisted ann_index table already carries _sig as its partition
    # column — trust it instead of recomputing (n_planes/seed travel
    # with the index build in that case)
    sig_col = (
        F.col("_sig")
        if "_sig" in embeddings.columns
        else _signature_udf(n_planes, dim, seed)(F.col(vec_col))
    )
    # no spread: the Arrow matmul kernel processes ~10k rows/ms per
    # batch; extra partitions only multiply python-worker cold starts
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        sig_col.alias("_sig"),
    ).persist()
    base.count()  # materialize BEFORE the three concurrent consumers
    probes = base.select(
        "_id",
        F.explode(
            F.array(
                F.col("_sig"),
                *[
                    F.col("_sig").bitwiseXOR(F.lit(1 << p).cast("long"))
                    for p in range(n_planes)
                ],
            )
        ).alias("_b"),
    )
    left = probes.select(F.col("_b").alias("_sig"), F.col("_id").alias("id_a"))
    right = base.select("_sig", F.col("_id").alias("id_b"))
    cand = (
        left.join(right, "_sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", _cosine_pair_udf()(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    # checkpoint the pair-sized report, release the signature cache
    # (containment discipline, r12 — no CacheManager pin outlives the
    # call). Executes at call time; filter the RESULT.
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT k-nearest-neighbor graph over the whole table — every
    vector's k closest others by L2, as ``(src, rank, dst, dist)``
    edges (SemDeDup / dataset-cartography style neighborhood input).

    Fully distributed block-pair dataflow — no driver-side query list:

    1. each row gets a block id ``pmod(xxhash64(id), B)``;
    2. the "query" side is replicated B× (explode over target blocks) —
       shuffle carries n·B rows, so B trades replication against task
       granularity (B² cogroups each ≈ (n/B)² distance work, bounded
       executor memory);
    3. one ``applyInPandas`` per (query_block, corpus_block) cogroup
       computes the (n/B)×(n/B) distance matrix with ONE numpy matmul
       and emits only each query's LOCAL (dist, id)-lexsorted top-k;
    4. a window reduce keeps the global top-k per source.

    Exact brute force is O(n²) work by definition — this shape spreads
    it over B² independent tasks; for sublinear scaling, bucket with
    `LshVectorIndex`/`IvfVectorIndex` first and run the same verify
    within buckets. Self-pairs excluded; ties broken by dst id; `dist`
    left unrounded (round at the query surface).
    """
    B = int(n_blocks)
    blk = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(B))
    rep = F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    # every (query-block, corpus-block) pair becomes one cogroup key:
    # queries replicate across corpus blocks, corpus rows across query
    # blocks — n·B rows each side, B² tasks of (n/B)×(n/B) work
    src = emb.select(
        F.col(id_col).alias("src"),
        _as_double(F.col(vec_col)).alias("_qv"),
        blk.alias("_qb"),
        rep.alias("_cb"),
    )
    dst = emb.select(
        F.col(id_col).alias("dst"),
        _as_double(F.col(vec_col)).alias("_cv"),
        blk.alias("_cb"),
        rep.alias("_qb"),
    )
    kk = int(k)

    def block_topk(qs: pd.DataFrame, cs: pd.DataFrame) -> pd.DataFrame:
        if not len(qs) or not len(cs):
            # dtype-neutral empty frame: ids keep whatever type the
            # input column has (declared in the applyInPandas schema)
            return pd.DataFrame(
                {
                    "src": qs["src"][:0],
                    "dst": cs["dst"][:0],
                    "dist": pd.Series([], dtype="float64"),
                }
            )
        Q = np.vstack(qs["_qv"].to_numpy()).astype(np.float64)
        M = np.vstack(cs["_cv"].to_numpy()).astype(np.float64)
        qid = qs["src"].to_numpy()
        cid = cs["dst"].to_numpy()
        D = (Q**2).sum(1)[:, None] - 2.0 * (Q @ M.T) + (M**2).sum(1)[None, :]
        out_s, out_d, out_x = [], [], []
        for i in range(len(qid)):
            row = D[i]
            mask = cid == qid[i]
            row[mask] = np.inf  # exclude self
            top = np.lexsort((cid, row))[: min(kk, len(cid) - int(mask.sum()))]
            out_s.extend([qid[i]] * len(top))
            out_d.extend(cid[top].tolist())
            out_x.extend(np.sqrt(np.maximum(row[top], 0.0)).tolist())
        return pd.DataFrame({"src": out_s, "dst": out_d, "dist": out_x})

    # cogroup, NOT a join: each (block) task receives the replicated
    # query rows and that block's corpus rows as two frames — the n²
    # pair matrix exists only transiently inside numpy, never in a
    # shuffle (a join on _cb would materialize |n|·|n/B| rows per block)
    # emit ids in their INPUT type (string/long/... — the kernel never
    # arithmetics them), so non-integral id columns round-trip intact
    id_type = dict(emb.dtypes)[id_col]
    local = (
        src.groupBy("_qb", "_cb")
        .cogroup(dst.groupBy("_qb", "_cb"))
        .applyInPandas(
            lambda qs, cs: block_topk(qs, cs),
            schema=f"src {id_type}, dst {id_type}, dist double",
        )
    )
    w = Window.partitionBy("src").orderBy("dist", "dst")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select("src", F.col("rank").cast("bigint").alias("rank"), "dst", "dist")
    )


def lsh_knn_graph(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 10,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """APPROXIMATE k-NN graph — the sublinear companion to
    :func:`knn_graph`: instead of all B² block pairs, each vector is
    compared only against vectors sharing a hyperplane-LSH bucket
    within hamming distance ``probe_radius`` of its own signature.

    Dataflow mirrors knn_graph's cogroup shape, keyed by BUCKET:

    - corpus side: one row per vector under its exact signature;
    - query side: each vector replicated to its multiprobe buckets
      (Σ C(n_planes, r ≤ radius) replicas — the recall/cost dial);
    - one numpy matmul per bucket cogroup emits local (dist, id)-
      lexsorted top-k; a window keeps the global top-k per source.

    Work is Σ_buckets |queries_b|·|corpus_b| — for roughly uniform
    buckets that is n²·(probe volume / 2^n_planes), a tunable fraction
    of brute force, and NO pair of vectors in distant buckets is ever
    scored (that is the approximation: recall < 100% by design,
    pytest-pinned against the exact graph). Self-pairs excluded; ties
    by dst id; ``dist`` unrounded.
    """
    if dim is None:
        first = emb.select(vec_col).first()
        if first is None:
            raise ValueError("empty embedding table")
        dim = len(first[0])
    sig_udf = _signature_udf(n_planes, dim, seed)
    from inception_eventstore_spark.functions.spread import spread

    sigged = spread(emb).select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        sig_udf(F.col(vec_col)).alias("_sig"),
    )
    # BOTH cogroup sides read sigged — materialize it once (lazy local
    # checkpoint: computed on first use, reused by the second side), or
    # the Arrow signature kernel runs twice over the corpus. Production
    # persists `_sig` at ingest instead (LshVectorIndex) and skips this.
    sigged = sigged.localCheckpoint(eager=False)
    if probe_radius > 2:
        raise NotImplementedError(
            "multiprobe radius > 2: probe volume grows as "
            "C(n_planes, r) — raise n_planes or drop to brute force "
            "instead (radius 1-2 are the standard recall/cost points)"
        )
    # probe buckets as a literal-XOR array — pure JVM, no per-row UDF:
    # own bucket + every 1-bit flip (radius 1) + every 2-bit flip
    # (radius 2, C(n_planes, 2) more probes)
    flips: list = []
    if probe_radius >= 1:
        flips += [1 << p for p in range(n_planes)]
    if probe_radius >= 2:
        flips += [
            (1 << p) | (1 << q)
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    probe_arr = F.array(
        F.col("_sig"),
        *[
            F.col("_sig").bitwiseXOR(F.lit(m).cast("long"))
            for m in flips
        ],
    )
    qside = sigged.select(
        F.col("_id").alias("src"),
        F.col("_v").alias("_qv"),
        F.explode(probe_arr).alias("_b"),
    )
    cside = sigged.select(
        F.col("_id").alias("dst"),
        F.col("_v").alias("_cv"),
        F.col("_sig").alias("_b"),
    )
    kk = int(k)

    def bucket_topk(qs: pd.DataFrame, cs: pd.DataFrame) -> pd.DataFrame:
        if not len(qs) or not len(cs):
            return pd.DataFrame(
                {
                    "src": qs["src"][:0],
                    "dst": cs["dst"][:0],
                    "dist": pd.Series([], dtype="float64"),
                }
            )
        Q = np.vstack(qs["_qv"].to_numpy()).astype(np.float64)
        M = np.vstack(cs["_cv"].to_numpy()).astype(np.float64)
        qid = qs["src"].to_numpy()
        cid = cs["dst"].to_numpy()
        D = (Q**2).sum(1)[:, None] - 2.0 * (Q @ M.T) + (M**2).sum(1)[None, :]
        out_s, out_d, out_x = [], [], []
        for i in range(len(qid)):
            row = D[i]
            mask = cid == qid[i]
            row[mask] = np.inf
            top = np.lexsort((cid, row))[: min(kk, len(cid) - int(mask.sum()))]
            out_s.extend([qid[i]] * len(top))
            out_d.extend(cid[top].tolist())
            out_x.extend(np.sqrt(np.maximum(row[top], 0.0)).tolist())
        return pd.DataFrame({"src": out_s, "dst": out_d, "dist": out_x})

    id_type = dict(emb.dtypes)[id_col]
    local = (
        qside.groupBy("_b")
        .cogroup(cside.groupBy("_b"))
        .applyInPandas(
            lambda qs, cs: bucket_topk(qs, cs),
            schema=f"src {id_type}, dst {id_type}, dist double",
        )
    )
    w = Window.partitionBy("src").orderBy("dist", "dst")
    return (
        local.dropDuplicates(["src", "dst"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select("src", F.col("rank").cast("bigint").alias("rank"), "dst", "dist")
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    id_col: str = "vec_id",
    query_col: str | None = None,
) -> DataFrame:
    """(query?, n_exact, n_hit, recall) — the standard ANN evaluation
    statistic recall@k = |approx ∩ exact| / |exact| per query, as an
    ENGINE operator so index quality is measured where the data lives
    instead of in a driver script. ``approx`` and ``exact`` are any
    two result tables carrying ``id_col`` (and ``query_col`` for
    batched evaluation; omit it for single-query results). Shape: one
    semi-join on the (query, id) key + two partial-aggregated counts —
    at 100 TB both inputs are k·|queries| rows, trivially small; it is
    the PRODUCTION of them that scales."""
    qcols = [query_col] if query_col else []
    a = approx.select(*qcols, F.col(id_col))
    e = exact.select(*qcols, F.col(id_col))
    hits = a.join(e, [*qcols, id_col], "leftsemi")
    n_hit = (
        hits.groupBy(*qcols).agg(F.count("*").alias("n_hit"))
        if qcols
        else hits.agg(F.count("*").alias("n_hit"))
    )
    n_exact = (
        e.groupBy(*qcols).agg(F.count("*").alias("n_exact"))
        if qcols
        else e.agg(F.count("*").alias("n_exact"))
    )
    joined = (
        n_exact.join(n_hit, qcols, "left")
        if qcols
        else n_exact.crossJoin(n_hit)
    )
    return joined.select(
        *qcols,
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
            / F.col("n_exact"),
            6,
        ).alias("recall"),
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: list[tuple],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(anchor_id, rank, vec_id, cosine): for every anchor, the k most
    COSINE-similar corpus vectors with a DIFFERENT label — hard
    negative mining, the batch-construction step of contrastive
    embedding training (high-similarity wrong-label examples carry the
    gradient signal; random negatives are trivially separable).

    ``anchors`` is [(anchor_id, vector, label)]. Same execution shape
    as `multi_query_topk` (the serving-scan pattern): the anchor
    matrix rides into one Arrow kernel broadcast by value, each batch
    computes a normalized matmul and emits only its LOCAL per-anchor
    top-k among label-mismatched rows (same-label entries masked below
    the cosine floor), so the shuffle carries ≤ batches·|A|·k rows —
    never the |corpus|·|A| score matrix. The final window ranks
    ≤ batches·k rows per anchor. Ties break on (cosine desc, id)."""
    if not anchors:
        raise ValueError("anchors must be non-empty")
    aids = [int(a) for a, _, _ in anchors]
    A = np.asarray([v for _, v, _ in anchors], dtype=np.float64)
    An = A / np.sqrt((A**2).sum(axis=1))[:, None]
    alab = np.asarray([l for _, _, l in anchors])

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            labs = pdf[label_col].to_numpy()
            Mn = M / np.sqrt((M**2).sum(axis=1))[:, None]
            S = Mn @ An.T  # batch × anchors
            S[labs[:, None] == alab[None, :]] = -2.0  # mask same-label
            kk = min(k, len(ids))
            out_a, out_id, out_s = [], [], []
            for j, aid in enumerate(aids):
                top = np.lexsort((ids, -S[:, j]))[:kk]
                keep = top[S[top, j] > -2.0]
                out_a.extend([aid] * len(keep))
                out_id.extend(ids[keep])
                out_s.extend(S[keep, j])
            yield pd.DataFrame(
                {"anchor_id": out_a, id_col: out_id, "_s": out_s}
            )

    reduced = corpus.select(id_col, vec_col, label_col).mapInPandas(
        local_topk, f"anchor_id long, {id_col} long, _s double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.col("_s").desc(), F.col(id_col).asc()
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "anchor_id",
            F.col("rank").cast("long").alias("rank"),
            id_col,
            F.round(F.col("_s"), 6).alias("cosine"),
        )
    )


def sign_bit_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(id, code_w0, code_w1, ...): 1-bit-per-dimension sign
    quantization — bit ``j`` of word ``w`` is 1 iff
    ``vec[32*w + j] > 0`` — the 32x-compression binary-embedding
    format (Jegou-style sign codes / "binary quantization" in vector
    stores). Dimensions pack 32 per BIGINT word (not 64: bit 63 would
    need 1<<63, which overflows signed ranges differently across
    engines; 32-bit words keep every packed value positive and
    portable).

    Entirely JVM whole-stage codegen: each word is a 32-term
    bitwise-OR expression over ``element_at`` probes of the in-memory
    array — no explode, no shuffle, no Python. The comparison
    ``v[j] > 0`` is exact on float inputs (no arithmetic), so codes
    are bit-identical on any engine."""
    if dim % 32 != 0:
        raise ValueError("dim must be a multiple of 32")
    v = F.col(vec_col)
    words = []
    for w in range(dim // 32):
        bits = [
            F.when(
                F.element_at(v, w * 32 + j + 1) > F.lit(0.0),
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(32)
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc.bitwiseOR(b)
        words.append(acc.alias(f"code_w{w}"))
    return df.select(F.col(id_col), *words)


def bq_hamming_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    radius: int = 26,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, rank, vec_id, cosine): binary-quantized retrieval —
    sign-bit codes (`sign_bit_codes`), a hamming-radius candidate scan,
    then an exact cosine re-rank of the survivors. The standard
    two-stage serving shape for compressed vector search: the coarse
    scan touches only 2 BIGINTs per vector (32x less IO than the float
    array), and the expensive float math runs on the few candidates
    inside the radius.

    Scale: the query codes are a |Q|-row broadcast, so the hamming scan
    is map-side over the corpus codes — zero shuffle of the corpus; the
    radius bounds survivors (random sign codes concentrate at hamming
    ~ dim/2 +- sqrt(dim)/2, so radius < dim/2 - 2*sqrt(dim) prunes
    nearly everything), and only survivors carry their float arrays
    into the re-rank window, which partitions by query_id over the
    candidate set — never the corpus. Self-matches are excluded (the
    queries come from the corpus). Recall is radius-bound like IVF's
    probe count; the oracle replays the identical two-stage plan."""
    codes = sign_bit_codes(corpus, id_col, vec_col, dim)
    qcodes = codes.where(F.col(id_col).isin([int(q) for q in query_ids]))
    qc = qcodes.select(
        F.col(id_col).alias("query_id"),
        *[
            F.col(f"code_w{w}").alias(f"q_w{w}")
            for w in range(dim // 32)
        ],
    )
    ham = None
    for w in range(dim // 32):
        t = F.bit_count(
            F.col(f"code_w{w}").bitwiseXOR(F.col(f"q_w{w}"))
        )
        ham = t if ham is None else ham + t
    cand = (
        codes.crossJoin(F.broadcast(qc))
        .withColumn("_ham", ham.cast("int"))
        .where(
            (F.col("_ham") <= F.lit(int(radius)))
            & (F.col(id_col) != F.col("query_id"))
        )
        .select("query_id", id_col, "_ham")
    )
    # exact cosine on survivors only: sequential fold over the array
    # (same element order as the oracle's list_reduce) — interpreted,
    # but it runs on the radius-bounded candidate set, not the corpus
    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    qvecs = vecs.where(
        F.col(id_col).isin([int(q) for q in query_ids])
    ).select(F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"))

    def _fold(expr):
        return F.aggregate(
            expr, F.lit(0.0), lambda acc, x: acc + x
        )

    dot = _fold(F.zip_with("_v", "_qv", lambda a, b: a * b))
    nv = F.sqrt(_fold(F.transform("_v", lambda a: a * a)))
    nq = F.sqrt(_fold(F.transform("_qv", lambda a: a * a)))
    scored = (
        cand.join(vecs, id_col)
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("_cos", F.round(dot / (nv * nq), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            id_col,
            F.col("_cos").alias("cosine"),
        )
    )


def mmr_diverse_topk(
    corpus: DataFrame,
    queries: list[tuple],
    k: int = 5,
    pool: int = 20,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    1998, public literature): per query, greedily select k results
    maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) — the
    redundancy-penalized retrieval every RAG pipeline wants when the
    plain top-k is five near-duplicates of the same document. Returns
    (query_id, sel_rank, vec_id, mmr_score_e7).

    Two stages with very different scales, deliberately split:

    1. POOL (distributed, the 100 TB part): exact top-``pool``
       candidates per query via `multi_query_topk`'s one-scan Arrow
       kernel — the corpus is touched exactly once, shuffling only
       batches·|Q|·pool tiny rows.
    2. GREEDY (dial-bounded): MMR is inherently sequential (each pick
       changes every remaining score), and its working set is
       |Q|·pool vectors + |Q|·pool² pair sims — bounded by DIALS, not
       data. That is centroid-class driver state (cf. k-means,
       codebooks), so the greedy runs driver-side in numpy and
       returns a local DataFrame.

    Determinism: relevance and pair cosines are quantized to integer
    micro-units (floor(cos·10⁶)) BEFORE the greedy, λ is the exact
    rational lam_num/lam_den — so every score is an integer,
    argmax ties break on the smaller id, and a SQL replay of the same
    quantized greedy is bit-identical (the only cross-engine surface
    is the 6-dp cosine agreement every declared cosine query already
    relies on). mmr_score_e7 = lam_num·rel_micro − (lam_den−lam_num)·
    maxsim_micro, i.e. the MMR objective in 10⁻⁷ units scaled by
    lam_den.
    """
    if not 0 <= lam_num <= lam_den:
        raise ValueError("need 0 <= lam_num <= lam_den")
    if not 1 <= k <= pool:
        raise ValueError("need 1 <= k <= pool")
    cands = multi_query_topk(
        corpus, queries, k=pool, id_col=id_col, vec_col=vec_col
    )
    rows = (
        cands.select("query_id", id_col)
        .join(corpus.select(id_col, vec_col), id_col)
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r[id_col]), np.asarray(r[vec_col], dtype=np.float64))
        )
    qmap = {
        int(qid): np.asarray(v, dtype=np.float64) for qid, v in queries
    }
    mu = lam_den - lam_num
    out = []
    for qid in sorted(by_q):
        items = sorted(by_q[qid], key=lambda t: t[0])
        qv = qmap[qid]
        qn = np.sqrt(qv @ qv)
        rel = {
            i: int(np.floor((v @ qv) / (np.sqrt(v @ v) * qn) * 1e6))
            for i, v in items
        }
        sim = {}
        for i, vi in items:
            ni = np.sqrt(vi @ vi)
            for j, vj in items:
                if i != j:
                    sim[(i, j)] = int(
                        np.floor(
                            (vi @ vj) / (ni * np.sqrt(vj @ vj)) * 1e6
                        )
                    )
        selected: list[int] = []
        remaining = [i for i, _ in items]
        for rank in range(1, min(k, len(items)) + 1):
            best = None
            for c in remaining:
                ms = max((sim[(c, s)] for s in selected), default=0)
                score = lam_num * rel[c] - mu * ms
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            _, pick, score = best
            out.append((qid, rank, pick, score))
            selected.append(pick)
            remaining.remove(pick)
    from inception_eventstore_spark.plans.queries import _local_df

    return _local_df(
        corpus.sparkSession,
        out,
        "query_id bigint, sel_rank bigint, "
        f"{id_col} bigint, mmr_score_e7 bigint",
    )


def ann_recall_audit(
    corpus: DataFrame,
    queries: list[tuple],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 7,
    probe_radius: int = 2,
    centroids: list[list[float]] | None = None,
    n_probe: int = 3,
) -> DataFrame:
    """Measured recall@k of each approximate probe strategy against
    the exact brute-force top-k on a deterministic query sample — the
    go/no-go gate before trusting an index at 100 TB: an index whose
    audited recall is below target gets retuned (more planes / probes
    / cells), not shipped. One row per strategy:

        (strategy, n_queries, n_exact, n_hit, recall)

    micro-averaged over the query set (n_hit = |approx ∩ exact| summed
    across queries). Strategies audited: ``lsh`` (hyperplane-signature
    bucket probe, hamming ≤ probe_radius ball), ``ivf`` (n_probe
    nearest cells of the supplied pinned coarse quantizer), ``sq8``
    (asymmetric scan of the dequantized int8 corpus). All ranking is
    by (round(dist, 6), id) — the cross-engine contract every sim_topk
    oracle uses — so the audited sets replay exactly in SQL.

    Scale shape: ``queries`` is a bounded dial (≤ 64, enforced): the
    exact pass and the sq8 scan are |corpus|·|Q| broadcast-join rows
    (brute force is the DEFINITION of the audit baseline), lsh/ivf
    probe only their buckets/cells via equi-joins on a broadcast
    (query, bucket) table, and every per-query top-k is a
    window-partitioned-by-query rank — nothing single-partition. The
    corpus is scanned once per strategy family; centroid assignment
    and signatures are one pass each.
    """
    from inception_eventstore_spark.operators import pq as PQ
    from inception_eventstore_spark.plans.queries import _local_df
    from pyspark.sql import Window

    if not queries:
        raise ValueError("queries must be non-empty")
    if len(queries) > 64:
        raise ValueError(
            f"{len(queries)} queries — the audit is a bounded-dial "
            "sample (<= 64); a bigger evaluation set should sample down"
        )
    if not centroids:
        raise ValueError(
            "ann_recall_audit needs the index's pinned coarse quantizer "
            "(centroids) — audit what you would ship"
        )
    spark = corpus.sparkSession
    dim = len(queries[0][1])
    qdf = F.broadcast(
        _local_df(
            spark,
            [(int(qid), [float(x) for x in v]) for qid, v in queries],
            "qid bigint, q array<double>",
        )
    )
    corp = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("ev")
    ).persist()

    rdist = F.round(l2_distance(F.col("ev"), F.col("q")), 6).alias("dist")
    wq = Window.partitionBy("qid").orderBy("dist", "vec_id")

    def _topk(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("_rn", F.row_number().over(wq))
            .where(F.col("_rn") <= k)
            .select("qid", "vec_id")
        )

    # |Q|·k rows — eagerly pinned: it is referenced once per strategy
    # (semi-join) plus the n_exact aggregate, and each reference would
    # otherwise re-run the whole brute-force scan
    exact = _topk(
        corp.crossJoin(qdf).select("qid", "vec_id", rdist)
    ).localCheckpoint(eager=True)

    # --- lsh: signature scan once, ball-exploded equi-join ---
    sigged = corp.withColumn(
        "_sig", _signature_udf(n_planes, dim, seed)(F.col("ev"))
    )
    ball_rows = []
    for qid, v in queries:
        qsig = _py_signature([float(x) for x in v], n_planes, dim, seed)
        ball_rows.extend(
            (int(qid), int(s))
            for s in hamming_ball(qsig, n_planes, probe_radius)
        )
    ball = F.broadcast(_local_df(spark, ball_rows, "qid bigint, _sig bigint"))
    lsh = _topk(
        sigged.join(ball, "_sig").join(qdf, "qid")
        .select("qid", "vec_id", rdist)
    )

    # --- ivf: one assignment pass, probe = (query, cell) equi-join ---
    cdf = F.broadcast(
        _local_df(
            spark,
            [(c, [float(x) for x in cv]) for c, cv in enumerate(centroids)],
            "cell bigint, cv array<double>",
        )
    )
    wa = Window.partitionBy("vec_id").orderBy("_dc", "cell")
    assigned = (
        corp.crossJoin(cdf)
        .select(
            "vec_id", "cell", l2_distance(F.col("ev"), F.col("cv")).alias("_dc")
        )
        .withColumn("_rn", F.row_number().over(wa))
        .where(F.col("_rn") == 1)
        .select("vec_id", "cell")
    )
    probe_rows = [
        (int(qid), int(c))
        for qid, v in queries
        for c in rank_cells(centroids, [float(x) for x in v])[:n_probe]
    ]
    probes = F.broadcast(_local_df(spark, probe_rows, "qid bigint, cell bigint"))
    ivf = _topk(
        corp.join(assigned, "vec_id").join(probes, "cell").join(qdf, "qid")
        .select("qid", "vec_id", rdist)
    )

    # --- sq8: asymmetric scan of the dequantized corpus ---
    b = {
        int(r["dim"]): (float(r["lo"]), float(r["hi"]))
        for r in PQ.sq8_bounds(corp, vec_col="ev").collect()
    }
    lo = F.array(*[F.lit(b[i][0]) for i in sorted(b)])
    hi = F.array(*[F.lit(b[i][1]) for i in sorted(b)])
    dq = PQ.sq8_encode(corp, id_col="vec_id", vec_col="ev").select(
        "vec_id", PQ.sq8_dequantize(F.col("codes"), lo, hi).alias("ev")
    )
    sq8 = _topk(dq.crossJoin(qdf).select("qid", "vec_id", rdist))

    ne = exact.agg(F.count("*").cast("bigint").alias("n_exact"))
    parts = []
    for name, approx in (("lsh", lsh), ("ivf", ivf), ("sq8", sq8)):
        nh = (
            approx.join(F.broadcast(exact), ["qid", "vec_id"], "leftsemi")
            .agg(F.count("*").cast("bigint").alias("n_hit"))
        )
        parts.append(
            nh.crossJoin(F.broadcast(ne)).select(
                F.lit(name).alias("strategy"),
                F.lit(len(queries)).cast("bigint").alias("n_queries"),
                F.col("n_exact"),
                F.col("n_hit"),
                F.round(
                    F.col("n_hit").cast("double") / F.col("n_exact"), 6
                ).alias("recall"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    res = out.localCheckpoint(eager=True)
    corp.unpersist()
    return res
