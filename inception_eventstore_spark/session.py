"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same configs apply
(AQE, adaptive coalesce/skew-join) and the partition counts scale with
``spark.sql.shuffle.partitions``. The testdata parquet files carry
TIMESTAMP(NANOS) columns which Spark cannot read natively, hence
``spark.sql.legacy.parquet.nanosAsLong`` — the table loaders in
:mod:`inception_eventstore_spark.sources.tables` convert ns → µs
timestamps explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "inception-eventstore-spark",
    master: str | None = None,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 if unset) so
    the same entry point serves the driver's bench harness and local
    tests; on a real cluster callers pass ``master=None`` with an
    externally-configured session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    for key, value in {**DEFAULT_CONFIGS, **(extra_configs or {})}.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
