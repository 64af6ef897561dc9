"""S5: event-store migration pipeline.

Reference: Migrations/MigrateEventStore.cs:30-94 — replay the source
store grouped by aggregate, rebuild each AggregateCommit, feed it to the
target migrator (optionally transforming). In Spark this is one batch
job: read → group to commits → transform → explode → append; trivially
parallel (SURVEY §2 S5).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from inception_eventstore_spark.functions.commits import group_commits
from inception_eventstore_spark.operators.eventstore import EventStore, PlayerOptions


def migrate_event_store(
    source: EventStore,
    target: EventStore,
    options: PlayerOptions | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    maintain_index: bool = True,
) -> int:
    """Copy (and optionally transform) every commit from ``source`` to
    ``target``. ``transform`` receives the commit DataFrame
    (id, rev, ts, events[], public_events[]) and must return the same
    shape — the CassandraMigratorEventStorePlayer seam (reference:
    Migrations/CassandraMigratorEventStorePlayer.cs:7-13).

    Returns the number of commits migrated. The job is a single Spark
    pipeline: scan → (optional time filter) → group on (id, rev) →
    transform → posexplode → bucketed append; no driver-side loop.
    """
    rows = source.replay(options)
    commits = group_commits(rows)
    if transform is not None:
        commits = transform(commits)
    commits = commits.persist()
    try:
        n = commits.count()
        target.append_commits_df(commits, maintain_index=maintain_index)
    finally:
        commits.unpersist()
    return n


def copy_raw(source: EventStore, target: EventStore,
             options: PlayerOptions | None = None) -> None:
    """Byte-faithful migration (no commit rebuild): raw envelope rows
    streamed source → target in one job. Used when no transform is
    needed — skips the (id, rev) grouping shuffle entirely."""
    rows = source.replay(options)
    target._append_rows(rows, maintain_index=True)
