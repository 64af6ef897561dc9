"""Loaders for the driver-generated synthetic parquet tables.

Timestamp normalization: every generation of the testdata encodes its
timestamps differently, so the loader normalizes by the OBSERVED read
dtype, not by assumption —

- TIMESTAMP(NANOS) (round-1 data): Spark's vectorized reader rejects
  INT64 nanos natively; sessions set
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (see session.py), the
  column arrives as ``bigint`` ticks, and the loader truncates ns → µs
  with integer ``div`` (ns epochs exceed 2^53 — float division rounds).
- TIMESTAMP(µs, isAdjustedToUTC=false) (round-2 data): Spark reads
  ``timestamp_ntz``; under the engine's fixed UTC session timezone a
  cast to TimestampType is wall-clock-exact and keeps every downstream
  operator (``unix_micros``, watermarks, FileTime round-trips) on the
  same TimestampType they always saw.

DuckDB reads both encodings as naive-UTC TIMESTAMP, so oracle
comparisons line up exactly in either generation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns stored as TIMESTAMP(NANOS) in the testdata files, read as
#: LONG under nanosAsLong and converted to TimestampType on load.
TIMESTAMP_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing nanosecond timestamps."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in TIMESTAMP_COLUMNS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # integer `div`, not `/`: ns ticks exceed 2^53, double
            # division would round the low microsecond digit.
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
        elif dtype == "timestamp_ntz":
            # session timezone is pinned to UTC → wall-clock-exact
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every synthetic table as a temp view (SQL entry point)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
