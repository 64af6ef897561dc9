"""Day-partition id (pid) calculation and calendar-aware iteration.

``pid = year*1000 + dayOfYear`` (reference: IndexByEventTypeStore.cs:92-98);
successor is calendar-aware across year ends and leap years (reference:
PartitionCalculator ``GetNext``, IndexByEventTypeStore.cs:306-337, with
unit vectors in One.Inception.EventStore.Cassandra.Tests/
CassandraEventStoreSchemaTests.cs:3-19: 2024074→2024075, 2023365→2024001,
2024366→2025001).

On the Spark side pid is a plain column expression so it can be a
directory partition column — Catalyst statically prunes the day range of
an index scan (X3) instead of the reference's client-side partition loop.
"""

from __future__ import annotations

import calendar
import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.filetime import (
    filetime_to_datetime,
    filetime_to_timestamp_col,
)


def pid_from_datetime(dt: _dt.datetime) -> int:
    """UTC datetime → day partition id ``year*1000 + dayofyear``."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc)
    return dt.year * 1000 + dt.timetuple().tm_yday


def pid_from_filetime(ticks: int) -> int:
    """FileTime ticks → day partition id."""
    return pid_from_datetime(filetime_to_datetime(ticks))


def pid_col_from_timestamp(col: Column | str) -> Column:
    """Column expr: TimestampType → pid INT (UTC session timezone)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * F.lit(1000) + F.dayofyear(c)).cast("int")


def pid_col_from_filetime(col: Column | str) -> Column:
    """Column expr: FileTime LONG → pid INT."""
    return pid_col_from_timestamp(filetime_to_timestamp_col(col))


def next_pid(pid: int) -> int:
    """Calendar-aware successor of a day partition id."""
    year, day = divmod(pid, 1000)
    days_in_year = 366 if calendar.isleap(year) else 365
    if day >= days_in_year:
        return (year + 1) * 1000 + 1
    return pid + 1


def pid_range(after_pid: int, before_pid: int) -> list[int]:
    """All day partitions from ``after_pid`` to ``before_pid`` inclusive.

    Mirrors the reference's partition loop (IndexByEventTypeStore.cs:190-193)
    but is only used for bookkeeping/progress — the Spark scan itself uses
    ``pid BETWEEN`` and lets Catalyst prune directories.
    """
    if before_pid < after_pid:
        return []
    pids = [after_pid]
    while pids[-1] < before_pid:
        pids.append(next_pid(pids[-1]))
    return pids
