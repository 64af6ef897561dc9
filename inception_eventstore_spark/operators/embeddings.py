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

Scale shape: ZERO shuffle — the vector materializes per row from a
staged token-bucket array (O(n_tok · dim) comparisons inside
whole-stage codegen; dim is small by construction for the hashing
trick). An explode→groupBy→pivot formulation would shuffle the whole
corpus twice for the same result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    staged = docs.withColumn(
        "_bkt",
        F.transform(
            tokens(text_col), lambda t: hash_bucket(t, seed=seed,
                                                    buckets=dim)
        ),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(F.col("_bkt"), lambda b: b == i))
        .cast("double"),
    )
    staged = staged.withColumn("_cnt", counts)
    if not normalize:
        return staged.withColumn(out_col, F.col("_cnt")).drop("_bkt", "_cnt")
    # stage the norm as a COLUMN before the division lambda — an outer
    # expression referenced inside a lambda re-evaluates per element
    staged = staged.withColumn(
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
    return staged.withColumn(out_col, vec).drop("_bkt", "_cnt", "_norm")
