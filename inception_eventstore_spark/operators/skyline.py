"""2-D Pareto frontier (skyline) — the classic "best trade-offs"
analytics operator: keep every point not dominated by another
(dominated = some point is ≥ on both axes and > on at least one).
The reference engine answers this shape with client-side post-filters
over loaded aggregates; here it is a first-class distributed operator.

Scale story — NO O(n²) dominance join and NO single-task window:

1. collapse to the per-distinct-x max table ``A(x) = max y at x``
   (one partial-aggregated groupBy — frontier membership only ever
   depends on this table);
2. strict-prefix running max over x DESC — ``M(x) = max{A(x') :
   x' > x}`` — via functions.ranking.sharded_running_max (range
   shuffle + #shards-row driver prefix), never a
   ``partitionBy(lit(1))`` window;
3. a point survives iff ``y == A(x)`` (it is the best at its x) AND
   ``A(x) > M(x)`` (its column beats everything strictly to the
   right). The survivor-x table is exactly the frontier's x set —
   monotone-chain small in real data — so the join back to the
   points is a broadcast by default (``broadcast_frontier=False``
   falls back to a shuffle equi-join for adversarial anti-correlated
   inputs where the frontier is O(n)).

Equal points both survive (neither dominates the other), matching the
standard skyline definition. Axes must be INTEGER columns so the
dominance comparisons — and therefore the DuckDB NOT-EXISTS oracle —
are exact cross-engine; quantize doubles first (floor(x·2^20), the
repo-wide micro-unit convention).

Reference parity: SURVEY §2 G (analytics over loaded projections);
cf. Börzsönyi et al., "The Skyline Operator" (ICDE 2001) — public
literature; the sort-filter-skyline family this implements is the
2-D special case where one sorted pass is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_eventstore_spark.functions.ranking import (
    sharded_running_max,
)

_NEG_INF = -(1 << 62)


def pareto_frontier(
    df: DataFrame,
    x: str,
    y: str,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Rows of ``df`` on the maximize-(x, y) Pareto frontier, original
    columns preserved. NULLs in either axis are excluded (a NULL
    coordinate has no dominance order). See module docstring for the
    algorithm and the integer-axis requirement."""
    for c in (x, y):
        if not isinstance(df.schema[c].dataType, T.IntegralType):
            raise TypeError(
                f"pareto_frontier needs integer axes; {c} is "
                f"{df.schema[c].dataType.simpleString()} — quantize first"
            )
    pts = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    per_x = pts.groupBy(x).agg(F.max(y).alias("_sky_a"))
    ranked = sharded_running_max(
        per_x, [F.col(x).desc()], "_sky_a", "_sky_m"
    )
    frontier_x = ranked.where(
        F.col("_sky_a")
        > F.coalesce(F.col("_sky_m"), F.lit(_NEG_INF))
    ).select(x, "_sky_a")
    if broadcast_frontier:
        frontier_x = F.broadcast(frontier_x)
    return (
        pts.join(frontier_x, x)
        .where(F.col(y) == F.col("_sky_a"))
        .drop("_sky_a")
    )
