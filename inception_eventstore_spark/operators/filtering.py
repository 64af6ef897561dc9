"""Score-threshold corpus filtering.

Quality-classifier pipelines keep the top-p fraction of documents per
stratum (language, source, domain) rather than using one global cutoff —
a fixed threshold over-prunes low-resource strata. The Spark-first
shape: one exact per-group percentile aggregation (partial-aggregated,
group cardinality is languages/sources — tiny), broadcast the
thresholds back, filter in a map-side pass. The corpus itself is never
shuffled.

``F.percentile`` is Spark's EXACT linear-interpolation percentile (the
same definition as ANSI ``percentile_cont``/DuckDB ``quantile_cont``),
so thresholds are engine-portable, unlike ``approx_percentile`` whose
sketch is implementation-specific. At extreme group cardinality swap in
``approx_percentile`` — the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: float,
) -> DataFrame:
    """(group, threshold): the exact p-quantile of ``value_col`` per
    group (linear interpolation between order statistics)."""
    return df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(p)).alias("threshold")
    )


def quantile_threshold_filter(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: float,
    keep: str = "above",
) -> DataFrame:
    """Keep rows whose ``value_col`` is >= (``keep='above'``) or <=
    (``keep='below'``) their group's p-quantile. The threshold table is
    broadcast; the data pass is map-side only."""
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    thr = group_quantiles(df, value_col, group_col, p)
    joined = df.join(F.broadcast(thr), group_col)
    cond = (
        F.col(value_col) >= F.col("threshold")
        if keep == "above"
        else F.col(value_col) <= F.col("threshold")
    )
    return joined.where(cond).drop("threshold")
