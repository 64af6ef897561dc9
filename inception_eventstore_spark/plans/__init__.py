"""Declared query plans (the driver's correctness surface)."""

from inception_eventstore_spark.plans.queries import (  # noqa: F401
    QUERIES,
    spark_queries,
    oracle_queries,
)
