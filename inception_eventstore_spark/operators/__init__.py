"""Operators: event-store core (R/X/C/M/S) + LLM-pipeline extensions."""

from inception_eventstore_spark.operators.eventstore import (  # noqa: F401
    AggregateCommit,
    EventStore,
    PlayerOptions,
)
from inception_eventstore_spark.operators.counters import MessageCounter  # noqa: F401
from inception_eventstore_spark.operators.message_store import MessageStore  # noqa: F401
