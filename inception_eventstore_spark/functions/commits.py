"""Commit grouping: envelope rows ↔ AggregateCommit arrays.

The reference's write path expands an AggregateCommit into envelope rows
— private events at pos 0..N-1, public events from pos N-1+5 onward
(reference: CassandraEventStore.cs:72-86; offset constant
AggregateCommitBlock.cs:12). Its read path re-groups rows into commits
by rev, splitting private/public by *expected* position: a row is
private iff its pos equals the number of private events attached so far
(reference: AggregateCommitBlock.cs:33-64, with ``>=`` tolerance at :60).

Because pos is strictly increasing within a (id, rev) group, "pos equals
the count of privates so far" is exactly "pos == row_number-1 ordered by
pos" — a contiguous-from-zero prefix. That makes the split a pure window
expression, fully JVM-side, no UDF:

    private  ⟺  pos == row_number() over (partition by id, rev order by pos) - 1

At 100 TB both directions stay shuffle-minimal: explode is narrow
(posexplode), grouping shuffles once on (id, rev) — the same shuffle the
aggregation itself needs, reused by Catalyst for the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inception_eventstore_spark.schemas import PUBLIC_EVENTS_OFFSET

#: Commit DataFrame schema: id BINARY, rev INT, ts LONG,
#: events ARRAY<BINARY>, public_events ARRAY<BINARY>.


def explode_commits(commits: DataFrame) -> DataFrame:
    """Commits (arrays) → envelope rows; the R1 row-expansion.

    Private event i → pos i; public event i → pos (N-1) + 5 + i where N
    = number of private events (N≥1 in practice; the reference writes
    pos 4+i for an empty private list, reproduced by greatest(N-1, 0)+5
    ... exactly (N-1)+5 evaluated with N=0 → pos 4, matching the
    C# ``pos = -1; pos += 5`` path).
    """
    n_priv = F.greatest(F.size("events"), F.lit(0))  # size(NULL) = -1 → 0
    private_rows = commits.select(
        "id",
        "rev",
        "ts",
        F.posexplode_outer("events").alias("pos", "data"),
    ).where(F.col("pos").isNotNull())
    public_rows = (
        commits.withColumn("n_priv", n_priv)
        .select(
            "id",
            "rev",
            "ts",
            "n_priv",
            F.posexplode_outer("public_events").alias("ppos", "data"),
        )
        .where(F.col("ppos").isNotNull())
        .select(
            "id",
            "rev",
            "ts",
            (
                F.col("n_priv") - F.lit(1) + F.lit(PUBLIC_EVENTS_OFFSET) + F.col("ppos")
            ).cast("int").alias("pos"),
            "data",
        )
    )
    cols = ["id", "rev", "pos", "ts", "data"]
    return private_rows.select(*cols).unionByName(public_rows.select(*cols))


def group_commits(rows: DataFrame) -> DataFrame:
    """Envelope rows → commits; the R3/R10 grouping transform.

    Returns (id, rev, ts, events ARRAY<BINARY>, public_events
    ARRAY<BINARY>) with ts = the commit's first-row timestamp (the
    reference takes the first block row's timestamp,
    AggregateCommitBlock.cs:35-36).
    """
    w = Window.partitionBy("id", "rev").orderBy("pos")
    flagged = rows.withColumn(
        "is_public", F.col("pos") != F.row_number().over(w) - F.lit(1)
    )
    return (
        flagged.groupBy("id", "rev")
        .agg(
            F.min_by("ts", "pos").alias("ts"),
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("is_public"), F.struct("pos", "data"))
                )
            ).alias("_priv"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("is_public"), F.struct("pos", "data"))
                )
            ).alias("_pub"),
        )
        .select(
            "id",
            "rev",
            "ts",
            F.transform("_priv", lambda s: s["data"]).alias("events"),
            F.transform("_pub", lambda s: s["data"]).alias("public_events"),
        )
    )
