"""Parallelism guard for CPU-heavy per-row operators.

A small parquet table often arrives as ONE input split (files <
``spark.sql.files.maxPartitionBytes``), which serializes expression-heavy
work (shingling, signatures, language scoring) onto a single core. The
fix is a cheap round-robin repartition up to the cluster's default
parallelism — the shuffle moves only the narrow input rows, and every
downstream expression then runs on all cores.

At 100 TB inputs arrive in thousands of splits and this is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to ``min_partitions`` (default: the session's
    default parallelism) iff the current partition count is lower."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
