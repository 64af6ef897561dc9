"""Z-order (Morton-curve) file layout for multi-dimension pruning.

Parquet prunes row groups by min/max stats — which only works when the
data is CLUSTERED on the filtered column. Sorting by one column
destroys locality of the others; interleaving the bits of several
columns (the Morton curve) gives every interleaved column partial
locality, so range filters on ANY of them skip most files. This is the
same layout idea as Delta's OPTIMIZE ZORDER BY, built here from plain
DataFrame ops:

1. each dimension is mapped to a ``2^bits``-bucket ordinal (equal-width
   between the observed min/max — two tiny scalar aggregates baked back
   as literals; rank-based bucketing would add a global sort for
   marginal benefit on roughly-uniform keys);
2. bucket bits are interleaved into the z-value with pure integer
   arithmetic (shift/and, ANSI-safe — z < 2^(2·bits));
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` writes files
   whose z ranges are DISJOINT — the property the test asserts, and the
   one that makes min/max skipping effective for both dimensions.

At 100 TB this is the standard maintenance pass after bulk ingest: one
range shuffle over the rewritten partition, no driver state beyond the
per-dimension min/max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "zvalue_by_range", "zorder_write"]


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton z-value of non-negative integer columns already in
    ``[0, 2^bits)``: bit i of column j lands at position i·n_cols + j.

    Pure shift/and/add integer arithmetic — identical algebra is
    emitted by the DuckDB oracle, and nothing can overflow a LONG for
    n_cols·bits ≤ 62.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("interleave at least two columns")
    if n * bits > 62:
        raise ValueError("n_cols * bits must be <= 62 to fit a LONG")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zvalue_by_range(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Adds ``_z``: the Morton value of equal-width bucket ordinals of
    ``cols`` between their observed min/max (computed in ONE scalar
    aggregate pass and baked back as literals — the corpus itself is
    never shuffled by this step)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs).first()
    nb = 1 << bits
    buckets = []
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            buckets.append(F.lit(0))
            continue
        span = (mx - mn) / nb
        b = F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span))
        buckets.append(F.least(F.greatest(b, F.lit(0)), F.lit(nb - 1)))
    return df.withColumn("_z", interleave_bits(buckets, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Rewrite ``df`` at ``path`` z-ordered on ``cols``: disjoint
    per-file ``_z`` ranges (and therefore tight per-file min/max stats
    on every interleaved dimension). ``_z`` is persisted so maintenance
    can verify/re-cluster without recomputing bucket bounds.

    Safe when ``df`` READS from ``path`` (the re-cluster-in-place
    maintenance case): the clustered data is staged to a sibling
    ``<path>._zorder_tmp`` directory first, then atomically swapped in
    via the Hadoop FileSystem rename — a direct ``mode("overwrite")``
    of a path the plan also scans is rejected by Spark, and staging
    additionally survives a mid-write crash (the original directory is
    untouched until the swap)."""
    from inception_eventstore_spark.sources import fsutil

    zdf = zvalue_by_range(df, cols, bits)
    tmp = path.rstrip("/") + "._zorder_tmp"
    (
        zdf.repartitionByRange(int(num_files), F.col("_z"))
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    fsutil.replace_dir(df.sparkSession, tmp, path)
