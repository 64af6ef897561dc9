"""Matryoshka embedding truncation diagnostics.

Matryoshka representation learning (Kusupati et al. 2022) trains
embeddings whose PREFIX dimensions are themselves usable embeddings —
serving stacks then retrieve with a cheap low-dim prefix scan and
re-rank with the full vector. Before committing a corpus to
prefix-dim retrieval, a pipeline measures how much of the full-dim
top-k survives at each truncation: `prefix_topk_overlap` returns, per
prefix length, the fraction of the full-dimension top-k that the
truncated distance also ranks in its top-k (recall@k of the prefix
scan with the full scan as truth).

Execution: one scan per prefix length (`F.slice` + the same fold
distance `sim_topk_l2` uses, rounded-6 cutoff so ties at the k
boundary are engine-portable), top-k each, then a bounded
k·|dims|-row join against the full-dim top-k — no driver-side set
math, no kernel. The declared oracle replays every truncated scan
relationally with list slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.similarity import l2_distance


def prefix_topk_overlap(
    emb: DataFrame,
    query_vector: list[float],
    dims: tuple = (8, 16, 32),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(dims, n_common, overlap): per prefix length d, how many of the
    full-dimension L2 top-k ids the d-prefix L2 top-k retains, and the
    fraction (recall of the truncated scan vs the full scan). The
    query vector is excluded from candidates if present (distance 0
    row would pin rank 1 at every truncation)."""
    full_d = len(query_vector)
    if any(d > full_d or d < 1 for d in dims):
        raise ValueError(f"dims must be within 1..{full_d}")

    def topk(d: int) -> DataFrame:
        q = F.array(*[F.lit(float(x)) for x in query_vector[:d]])
        return (
            emb.select(
                F.col(id_col),
                F.round(
                    l2_distance(F.slice(F.col(vec_col), 1, d), q), 6
                ).alias("_dist"),
            )
            .orderBy("_dist", id_col)
            .limit(k)
            .select(id_col)
        )

    base = topk(full_d)
    out = None
    for d in dims:
        common = topk(d).join(base, id_col, "inner")
        row = common.agg(
            F.count("*").cast("bigint").alias("n_common")
        ).select(
            F.lit(int(d)).cast("bigint").alias("dims"),
            "n_common",
            F.round(F.col("n_common").cast("double") / k, 6).alias(
                "overlap"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out
