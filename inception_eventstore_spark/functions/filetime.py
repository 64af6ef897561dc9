""".NET FileTime UTC ↔ timestamp conversion.

The reference stores ``ts`` as a .NET FileTime: 100 ns ticks since
1601-01-01 UTC (reference: CassandraEventStore.cs:419-420,
IndexByEventTypeStore.cs:242,256). FileTime precision (100 ns) exceeds
Spark timestamp precision (µs), so the engine keeps ``ts`` as LONG in
storage and converts only for partitioning/display (SURVEY §7 risk e).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: FileTime ticks (100 ns) between 1601-01-01 and 1970-01-01 UTC.
FILETIME_EPOCH_TICKS = 116_444_736_000_000_000

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def filetime_to_datetime(ticks: int) -> _dt.datetime:
    """FileTime ticks → aware UTC datetime (µs precision, truncating)."""
    micros = (ticks - FILETIME_EPOCH_TICKS) // 10
    return _EPOCH + _dt.timedelta(microseconds=micros)


def datetime_to_filetime(dt: _dt.datetime) -> int:
    """Aware (or naive-UTC) datetime → FileTime ticks."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    delta = dt - _EPOCH
    # integer math — total_seconds() is a float and loses µs precision
    # for dates a few centuries from the epoch
    micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    return micros * 10 + FILETIME_EPOCH_TICKS


def filetime_to_timestamp_col(col: Column | str) -> Column:
    """Column expr: FileTime LONG → TimestampType (µs, truncating).

    The tick delta (~1.8e16 for current dates) exceeds 2^53, so float
    division ``/10`` rounds ~half the tick values ending in 9 one µs
    up — which can push an event stamped in the last 100 ns of a day
    into the next day's pid partition. Decimal division is exact; the
    cast to long truncates toward zero exactly like python ``// 10``
    for the non-negative deltas FileTime produces.
    """
    c = F.col(col) if isinstance(col, str) else col
    delta = (c - F.lit(FILETIME_EPOCH_TICKS)).cast("decimal(20,0)")
    return F.timestamp_micros((delta / F.lit(10)).cast("long"))


def timestamp_to_filetime_col(col: Column | str) -> Column:
    """Column expr: TimestampType → FileTime LONG (µs resolution)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c) * F.lit(10) + F.lit(FILETIME_EPOCH_TICKS)
