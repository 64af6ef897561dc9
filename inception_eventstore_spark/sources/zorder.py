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


def with_hilbert_index(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bits: int = 8,
    out: str = "_h",
) -> DataFrame:
    """Adds ``out``: the 2-D HILBERT-curve index of two non-negative
    integer coordinates already in ``[0, 2^bits)`` — the
    better-locality sibling of `interleave_bits`: consecutive Hilbert
    indexes are ALWAYS grid-adjacent (unit Manhattan step, the
    property the tests pin cell-exhaustively), where the Morton curve
    jumps across the grid at power-of-two seams, so range filters on
    either coordinate skip strictly fewer files under a Hilbert
    layout.

    The classic per-bit descent (the xy2d recurrence), restated so
    every intermediate stays NON-NEGATIVE — bitwise-& variants go
    negative inside the flip, where two's-complement & and div/mod
    arithmetic disagree, so the consumed bit is dropped by a mod
    BEFORE the flip instead (verified bijective + unit-step over the
    full grid at several sizes): per level s = 2^(bits−1)..1,

        rx = (x div s) mod 2;  ry = (y div s) mod 2
        d += s²·((3·rx) xor ry)
        x ← x mod s;  y ← y mod s
        if ry = 0: { if rx = 1: x,y ← s−1−x, s−1−y };  swap x, y

    unrolled into ``bits`` staged integer projections — the xor over
    the {0,1} domain is emitted as rx·(3−ry) + (1−rx)·ry so the
    identical pure-arithmetic algebra replays in any SQL engine (no
    bitwise ops). All LONG arithmetic, d < 4^bits ≤ 2^62 for
    bits ≤ 31; ANSI-safe."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    df = df.withColumn("_hx", x_col.cast("long")).withColumn(
        "_hy", y_col.cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = F.expr(f"(_hx div {s}) % 2")
        ry = F.expr(f"(_hy div {s}) % 2")
        df = (
            df.withColumn("_rx", rx)
            .withColumn("_ry", ry)
            .withColumn(
                out,
                F.col(out)
                + F.lit(s * s)
                * (
                    F.col("_rx") * (F.lit(3) - F.col("_ry"))
                    + (F.lit(1) - F.col("_rx")) * F.col("_ry")
                ),
            )
            .withColumn("_hxm", F.expr(f"_hx % {s}"))
            .withColumn("_hym", F.expr(f"_hy % {s}"))
            .withColumn(
                "_hx2",
                F.when(F.col("_ry") == 1, F.col("_hxm")).otherwise(
                    F.when(
                        F.col("_rx") == 1, F.lit(s - 1) - F.col("_hym")
                    ).otherwise(F.col("_hym"))
                ),
            )
            .withColumn(
                "_hy2",
                F.when(F.col("_ry") == 1, F.col("_hym")).otherwise(
                    F.when(
                        F.col("_rx") == 1, F.lit(s - 1) - F.col("_hxm")
                    ).otherwise(F.col("_hxm"))
                ),
            )
            .drop("_hxm", "_hym")
            .drop("_hx", "_hy", "_rx", "_ry")
            .withColumnRenamed("_hx2", "_hx")
            .withColumnRenamed("_hy2", "_hy")
        )
    return df.drop("_hx", "_hy")
