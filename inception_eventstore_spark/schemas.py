"""Fixed envelope schemas of the event store.

The reference hard-codes a five-column envelope in its DDL templates
(reference: src/One.Inception.EventStore.Cassandra/CassandraEventStoreSchema.cs:15-17,
Counters/MessageCounter.cs:42, MessageStore/CassandraMessageStore.cs:19-21).
Canonical column names id/rev/pos/data/ts mirror CassandraColumn.cs:5-9.

Spark mapping (SURVEY §1.4): blob → BinaryType, bigint ts (FileTime
100 ns ticks) → LongType kept as-is, int → IntegerType.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Event log: one row per event, one logical partition per aggregate id.
#: Uniqueness contract: (id, rev, pos). Read-order contract per aggregate:
#: (rev ASC, pos ASC) — made explicit with orderBy since Parquet does not
#: guarantee it (reference: CassandraEventStoreSchema.cs:15).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.BinaryType(), nullable=False),
        T.StructField("rev", T.IntegerType(), nullable=False),
        T.StructField("pos", T.IntegerType(), nullable=False),
        T.StructField("ts", T.LongType(), nullable=False),
        T.StructField("data", T.BinaryType(), nullable=True),
    ]
)

#: Global secondary index by event type, day-partitioned via
#: pid = year*1000 + dayofyear (reference: CassandraEventStoreSchema.cs:16,
#: IndexByEventTypeStore.cs:92-98). Partition columns (et, pid) become
#: directory partitions → Catalyst prunes day ranges statically.
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("et", T.StringType(), nullable=False),
        T.StructField("pid", T.IntegerType(), nullable=False),
        T.StructField("aid", T.BinaryType(), nullable=False),
        T.StructField("rev", T.IntegerType(), nullable=False),
        T.StructField("pos", T.IntegerType(), nullable=False),
        T.StructField("ts", T.LongType(), nullable=False),
    ]
)

#: Message counter (reference: Counters/MessageCounter.cs:42). The
#: Cassandra CRDT counter becomes an associative sum over append deltas —
#: Catalyst's partial+final aggregation is the same commutative trick.
COUNTER_SCHEMA = T.StructType(
    [
        T.StructField("msgid", T.StringType(), nullable=False),
        T.StructField("cv", T.LongType(), nullable=False),
    ]
)

#: Raw message archive, date-bucketed (reference:
#: MessageStore/CassandraMessageStore.cs:19-21). date = FileTime of
#: midnight UTC of the append day.
MESSAGE_STORE_SCHEMA = T.StructType(
    [
        T.StructField("date", T.LongType(), nullable=False),
        T.StructField("ts", T.LongType(), nullable=False),
        T.StructField("data", T.BinaryType(), nullable=True),
    ]
)

#: Public events inside a commit start at pos = (n_private - 1) + 5
#: (reference: AggregateCommitBlock.cs:12; asserted by integration test
#: CassandraEventStoreTests.cs:120-134 — private at pos 0, public at 5).
PUBLIC_EVENTS_OFFSET = 5

#: Commit revisions start at 1 (reference: AggregateCommitBlock.cs:17).
FIRST_REVISION = 1
