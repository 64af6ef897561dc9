"""Arbitrary-interval time bucketing (hypertable-rollup style).

``date_trunc`` only snaps to calendar units; continuous-aggregate
rollups need arbitrary intervals (45 min, 6 h, 10 days). The bucket is
pure integer math on epoch microseconds — ``div`` (never float: ns/µs
epochs exceed 2^53) — so it stays in whole-stage codegen, pushes
through partial aggregation, and two engines computing it agree
bit-for-bit (the DuckDB oracle twin is ``epoch_us(ts) // width``).

Origin is the Unix epoch (1970-01-01 UTC): bucket k covers
``[k*width, (k+1)*width)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Microseconds per supported unit.
_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def interval_to_micros(interval: str) -> int:
    """'45 minutes' / '6 hours' / '1 day' → microseconds (plural or
    singular unit names)."""
    parts = interval.strip().split()
    if len(parts) != 2:
        raise ValueError(f"interval must be '<n> <unit>', got {interval!r}")
    n, unit = parts
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_US:
        raise ValueError(
            f"unsupported unit {unit!r} (use second/minute/hour/day)"
        )
    count = int(n)
    if count < 1:
        raise ValueError(
            f"interval count must be positive, got {count} "
            "(0 would divide by zero at runtime, negative widths are "
            "meaningless)"
        )
    return count * _UNIT_US[unit]


def time_bucket(col: Column | str, interval: str) -> Column:
    """Timestamp column → bucket-start timestamp for ``interval``-wide
    buckets anchored at the Unix epoch."""
    c = F.col(col) if isinstance(col, str) else col
    width = interval_to_micros(interval)
    us = F.unix_micros(c)
    # pmod keeps floor semantics for pre-epoch timestamps too
    return F.timestamp_micros((us - F.pmod(us, F.lit(width))).cast("long"))
