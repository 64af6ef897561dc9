"""Loaders for the driver-generated synthetic parquet tables.

The testdata parquet files encode timestamps as INT64 TIMESTAMP(NANOS),
which Spark's vectorized reader rejects; sessions set
``spark.sql.legacy.parquet.nanosAsLong=true`` (see session.py) and the
loader converts ns → µs TimestampType here so every downstream operator
sees proper timestamps. DuckDB performs the same ns → µs truncation when
reading the files, so oracle comparisons line up exactly.
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
        if dict(df.dtypes).get(col) == "bigint":
            # integer `div`, not `/`: ns ticks exceed 2^53, double
            # division would round the low microsecond digit.
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every synthetic table as a temp view (SQL entry point)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
