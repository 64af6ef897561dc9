"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 for
the driver's DuckDB-oracle correctness gate. All implementations live in
``inception_eventstore_spark`` (see plans/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inception_eventstore_spark.plans.queries import (  # noqa: E402
    oracle_queries,
    spark_queries,
)


def _ensure_nanos_config(spark: SparkSession) -> None:
    """Sessions built outside our factory need the UTC timezone pinned
    (timestamp-ntz normalization depends on it) and, for the legacy
    TIMESTAMP(NANOS) testdata generation, the nanos-as-long read config
    — harmless no-op on µs-encoded data (loaders normalize by observed
    dtype, sources/tables.py)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the R10 replay-grouped
    aggregate over the event log analog (driver checks rows > 0)."""
    _ensure_nanos_config(spark)
    return spark_queries()["r10_replay_grouped"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    wrapped: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in spark_queries().items():
        def _runner(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _ensure_nanos_config(spark)
            return _fn(spark, sf_dir)

        wrapped[name] = _runner
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    probabilistic / hash-family-specific ops → rows-only check)."""
    return oracle_queries()
