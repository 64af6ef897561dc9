"""Bucketed tables for shuffle-free co-located joins.

The event table's ``bucket=<n>`` directory layout prunes scans but does
not carry join-distribution metadata. For dimension-fact or log-log
joins repeated across many queries, Spark's native bucketing
(``bucketBy`` + ``saveAsTable``) records the hash distribution in the
catalog so Catalyst plans a SortMergeJoin **without an Exchange on
either side** when both tables are bucketed on the join key with the
same bucket count — the same co-location Cassandra gets from partition
keys, here at file layout level.

At 100 TB this is the difference between shuffling both join sides per
query and shuffling once at write time: the ingest pays one
``repartition(n, key)``, every subsequent join reads co-located
buckets. Verified by ``tests/test_skew_naming.py::TestBucketedJoin``
(no ``Exchange`` in the joined plan) — the plan-level proof the layout
actually reaches the optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) on ``bucket_col`` — parquet files hash-distributed so joins
    and aggregations on the bucket column skip their Exchange."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata travels with the table."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same key and bucket count — planned without a shuffle on either
    side (assert ``Exchange`` absence via ``.explain``)."""
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on, how)
