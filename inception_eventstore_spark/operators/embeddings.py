"""Text → vector featurization: hashed bag-of-words embeddings.

The similarity/ANN family (`similarity`, `ann_index`, `clustering`)
consumes ``array<float>`` columns; real pipelines produce them with a
model server, but a large family of retrieval/dedup tasks work off
feature-hashed sparse-to-dense vectors (Weinberger et al., 2009 —
the "hashing trick"). This operator builds them with COLUMN EXPRESSIONS
ONLY:

- bucket = portable md5 bucket of the token (``sampling.hash_bucket``
  arithmetic — DuckDB reproduces it digit-for-digit, so the declared
  query has a full value oracle, unlike xxhash-based features);
- v[b] = count of tokens hashing to b, optionally L2-normalized.

Execution shape: explode → (id, bucket) groupBy count → per-doc map →
dense array. The naive "stay within the row" formulation (a filter
lambda per bucket over a staged bucket array) looks shuffle-free but is
a trap: Catalyst's CollapseProject inlines the staged array into every
one of the ``dim`` lambdas — cse stops at lambda scope — so every token
is md5-hashed dim times (measured 64× ≈ 32 s where this shape runs in
~2 s). The explode pays one narrow shuffle of 16-byte (id, bucket)
pairs with map-side combine — the CLAUDE-invariant shape — and each
token is hashed exactly once. Densification is a ≤ dim-entry map
lookup per slot AFTER the aggregation boundary (post-agg columns are
materialized, so nothing re-evaluates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.dedup import tokens
from inception_eventstore_spark.operators.sampling import hash_bucket


def hashed_bow_embedding(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
    normalize: bool = True,
    seed: str = "bow-v1",
) -> DataFrame:
    """docs + ``out_col``: array<double> of length ``dim`` (token-count
    per md5 bucket, L2-normalized unless ``normalize=False``; all-zero
    for empty docs — the zero vector is preserved, not NaN)."""
    buckets = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).select(
        id_col, hash_bucket("_tok", seed=seed, buckets=dim).alias("_b")
    )
    counts = buckets.groupBy(id_col, "_b").agg(F.count("*").alias("_c"))
    maps = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_c")))
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0)
        ).cast("double"),
    )
    out = docs.join(maps, id_col, "left").withColumn("_cnt", dense)
    if normalize:
        # stage the norm as a COLUMN before the division lambda — an
        # outer expression referenced inside a lambda re-evaluates per
        # element ("_cnt" itself is safe: one transform over it)
        out = out.withColumn(
            "_norm",
            F.sqrt(
                F.aggregate(
                    F.col("_cnt"), F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
        )
        vec = F.when(
            F.col("_norm") > 0,
            F.transform(F.col("_cnt"), lambda x: x / F.col("_norm")),
        ).otherwise(F.col("_cnt"))
        return out.withColumn(out_col, vec).drop("_m", "_cnt", "_norm")
    return out.withColumn(out_col, F.col("_cnt")).drop("_m", "_cnt")


def bow_bucket_counts(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "bow-v1",
) -> DataFrame:
    """The sparse form: (id, bucket, cnt) triples, cnt > 0 — the raw
    output of the hashing trick before densification (and the exact
    rows the declared query value-oracles against DuckDB)."""
    buckets = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).select(
        id_col, hash_bucket("_tok", seed=seed, buckets=dim).alias("bucket")
    )
    return buckets.groupBy(id_col, "bucket").agg(
        F.count("*").alias("cnt")
    )


def tfidf_bucket_weights(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "bow-v1",
) -> DataFrame:
    """TF-IDF over the hashed buckets: (id, bucket, w) with
    w = cnt · ln((N + 1) / (df + 1)), df = docs containing the bucket,
    N = corpus size (smoothed so universal buckets get small positive
    weight instead of 0/−∞).

    Shape: the sparse counts (one narrow shuffle) + a per-bucket df
    aggregate (≤ dim rows — broadcast back) + one scalar N. The idf
    table being bucket-indexed (not vocabulary-indexed) keeps it O(dim)
    regardless of corpus size — the hashing trick applied to the
    statistics as well as the features."""
    # counts feeds BOTH the per-bucket df aggregate and the weighted
    # output rows — stage it or the tokenize+hash+aggregate chain
    # executes twice (guide §5). The OUTPUT is corpus-sized, so the
    # persist→checkpoint-result→unpersist discipline can't apply; an
    # eager localCheckpoint stages counts instead: the blocks are
    # RDD-scoped (no CacheManager pin — an identical later plan can
    # never silently read them), and the ContextCleaner reaps them on
    # the next GC once the returned DataFrame is dropped. RETENTION
    # CONTRACT: callers in long-lived sessions should drop the result
    # promptly; bench.py nudges a GC after every query.
    counts = bow_bucket_counts(docs, dim=dim, id_col=id_col,
                               text_col=text_col, seed=seed
                               ).localCheckpoint(eager=True)
    n_docs = docs.select(id_col).distinct().count()
    df_per_bucket = counts.groupBy("bucket").agg(
        F.countDistinct(id_col).alias("_df")
    )
    return (
        counts.join(F.broadcast(df_per_bucket), "bucket")
        .select(
            id_col,
            "bucket",
            (
                F.col("cnt")
                * F.log(F.lit(float(n_docs + 1)) / (F.col("_df") + F.lit(1.0)))
            ).alias("w"),
        )
    )


def embedding_dim_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """(dim, mean, std, lo, hi) per vector dimension — one posexplode +
    one partial-aggregated groupBy (shuffle payload: n_dims rows per
    input partition). std is population std (σ, the standardization
    convention)."""
    ex = embeddings.select(
        F.posexplode(F.col(vec_col)).alias("dim", "_x")
    ).select("dim", F.col("_x").cast("double").alias("_x"))
    return ex.groupBy("dim").agg(
        F.avg("_x").alias("mean"),
        F.stddev_pop("_x").alias("std"),
        F.min("_x").alias("lo"),
        F.max("_x").alias("hi"),
    )


def standardize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_std",
    eps: float = 1e-12,
) -> DataFrame:
    """Per-dimension z-score: (x - μ_d) / max(σ_d, eps) — the
    preprocessing step before k-means / ANN when dimensions carry
    heterogeneous scales. The per-dim stats are a tiny driver-side
    collect (n_dims rows) baked back in as literal arrays, so the
    normalization pass is map-side with zero shuffle; constant
    dimensions map to 0, not NaN."""
    stats = sorted(
        embedding_dim_stats(embeddings, vec_col=vec_col).collect(),
        key=lambda r: r.dim,
    )
    if not stats:
        raise ValueError("cannot standardize an empty embeddings DataFrame")
    means = F.array(*[F.lit(float(r.mean)) for r in stats])
    stds = F.array(
        *[F.lit(max(float(r.std or 0.0), eps)) for r in stats]
    )
    staged = embeddings.withColumn("_mu", means).withColumn("_sd", stds)
    vec = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("_mu"),
        lambda x, m: x - m,
    )
    staged = staged.withColumn("_ctr", vec)
    out = F.zip_with(
        F.col("_ctr"), F.col("_sd"), lambda x, s: x / s
    )
    return staged.withColumn(out_col, out).drop("_mu", "_sd", "_ctr")


def projection_matrix(d: int, out_dim: int, seed: str = "v1"):
    """Deterministic (d, out_dim) Gaussian random-projection matrix,
    scaled 1/√out_dim (Johnson-Lindenstrauss: pairwise distances are
    preserved within 1±ε for out_dim = O(ln n / ε²)). Seeded through
    SeedSequence on the UTF-8 seed string, so the same seed rebuilds
    the identical matrix on any machine — the matrix IS the model, and
    callers persist only the seed."""
    ss = np.random.SeedSequence(
        list(seed.encode("utf-8")) + [d, out_dim]
    )
    rng = np.random.default_rng(ss)
    return rng.standard_normal((d, out_dim)) / np.sqrt(out_dim)


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    seed: str = "v1",
    vec_col: str = "embedding",
    out_col: str = "proj",
    round_dp: int | None = 6,
) -> DataFrame:
    """emb + ``out_col``: array<double> — the JL random projection xᵀR.

    The cheap distance-preserving dimension cut for ANN/clustering
    pre-passes where PCA's data-dependent fit (`pca.pca_components`)
    is overkill: no training pass, no shuffle, reproducible from the
    seed alone. The matrix is built driver-side (d·out_dim floats) and
    broadcast BY VALUE into one Arrow matmul kernel — the projection
    itself is a zero-shuffle map pass, same shape as `pca_project`.
    With ``round_dp`` the coordinates are rounded for cross-engine
    comparison (the declared oracle re-derives every coordinate from
    the SAME matrix embedded as SQL literals)."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding table")
    R = projection_matrix(int(first["d"]), int(out_dim), seed)

    @F.pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        Y = M @ R
        if round_dp is not None:
            Y = np.round(Y, round_dp)
        return pd.Series(list(Y))

    return emb.withColumn(out_col, proj(F.col(vec_col)))


def mahalanobis_outliers(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_n: int = 20,
    eps: float = 1e-12,
) -> DataFrame:
    """Top-``top_n`` embedding outliers by diagonal-covariance
    Mahalanobis distance: score = Σ_d ((x_d − μ_d)/σ_d)² — the standard
    cheap anomaly filter before clustering / dedup (full-covariance
    Mahalanobis needs a d×d inverse; the diagonal form is the
    embedding-pipeline convention and is exactly per-dim z-scores).

    Engine-portable by construction: μ/σ are the 6-dp-rounded dim stats
    (the same cross-engine contract `embedding_dim_stats` certifies),
    baked back as literal arrays so the scoring pass adds NO join; each
    per-dim z² is quantized to integer micro-units (floor(z²·2^20) —
    floor of an identically-computed double, the sq8_encode rule) and
    summed as BIGINT, so the score is associative integer addition:
    partial aggregation order can never move it. Shuffle: one
    partial-aggregated groupBy(id) over the exploded (id, z²_u) pairs;
    top-n via per-partition TakeOrdered."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    stats = sorted(
        embedding_dim_stats(embeddings, vec_col=vec_col)
        .select(
            "dim",
            F.round("mean", 6).alias("mean"),
            F.round("std", 6).alias("std"),
        )
        .collect(),
        key=lambda r: r.dim,
    )
    if not stats:
        raise ValueError("empty embeddings DataFrame")
    mu = F.array(*[F.lit(float(r.mean)) for r in stats])
    sd = F.array(*[F.lit(max(float(r.std or 0.0), eps)) for r in stats])
    staged = (
        embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("_x"))
        .withColumn("_mu", mu)
        .withColumn("_sd", sd)
        # stage z BEFORE the quantizing lambda (single-lambda reference
        # is safe; re-deriving z inside would re-zip per element)
        .withColumn(
            "_z",
            F.zip_with(
                F.zip_with(F.col("_x"), F.col("_mu"), lambda x, m: x - m),
                F.col("_sd"),
                lambda c, s: c / s,
            ),
        )
        .withColumn(
            "_zu",
            F.transform(
                F.col("_z"),
                lambda t: F.floor(t * t * F.lit(float(1 << 20))).cast(
                    "bigint"
                ),
            ),
        )
    )
    scores = (
        staged.select(id_col, F.explode("_zu").alias("_u"))
        .groupBy(id_col)
        .agg(F.sum("_u").cast("bigint").alias("maha2_u"))
    )
    return scores.orderBy(F.desc("maha2_u"), id_col).limit(int(top_n))


def embedding_isotropy(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(n, mean_norm, anisotropy) — the one-row embedding-geometry
    health report: ``anisotropy`` = ‖mean unit vector‖², the expected
    pairwise cosine between random embeddings (Ethayarajh 2019's
    anisotropy measure via the centroid identity: E[cos(x,y)] over
    independent draws = ‖E[x/‖x‖]‖²). ≈ 0 for an isotropic
    (directionally uniform) space; → 1 when all vectors crowd a cone —
    the degeneracy that makes cosine retrieval scores uninformative
    and is the first thing to check before trusting ANN recall.

    One pass: per-row norm (JVM fold), posexplode to (dim, component)
    with the normalized component, one ``dim``-group partial
    aggregate, then a ``dim``-row scalar fold — the corpus never
    shuffles, only dim·partitions partial rows. Cross-engine float
    sums land ~10⁹ below the 6-dp round."""
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    rows = emb.select(
        norm.alias("_nrm"), F.posexplode(v).alias("_d", "_x")
    ).where(F.col("_nrm") > 0)
    per_dim = rows.groupBy("_d").agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum("_nrm").alias("_sn"),
        F.sum(F.col("_x") / F.col("_nrm")).alias("_su"),
    )
    # every dim sees the same N rows (and the same Σ norms — each row
    # contributes its norm once per dim), so N/mean_norm fall out of
    # any one dim; anisotropy needs the per-dim mean SQUARED before
    # the cross-dim sum
    m = per_dim.select(
        "_n",
        "_sn",
        (
            (F.col("_su") / F.col("_n"))
            * (F.col("_su") / F.col("_n"))
        ).alias("_m2"),
    )
    return m.agg(
        F.max("_n").cast("bigint").alias("n"),
        F.round(F.max("_sn") / F.max("_n"), 6).alias("mean_norm"),
        F.round(F.sum("_m2"), 6).alias("anisotropy"),
    )
