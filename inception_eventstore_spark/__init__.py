"""PySpark-native analytics engine with the capabilities of
1SoftwareCompany/1nception.EventStore.Cassandra.

A brand-new, Spark-first re-expression of the reference event store
(append-only multi-tenant event log + event-type index + counters +
message store + replay/migration pipelines), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis). See SURVEY.md for the full blueprint.

The package name is ``inception_eventstore_spark`` because Python
identifiers cannot start with a digit ("1nception").
"""

__version__ = "0.1.0"

from inception_eventstore_spark.session import get_spark  # noqa: F401
