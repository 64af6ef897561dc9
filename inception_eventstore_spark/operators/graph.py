"""Graph analytics over relation-shaped edge tables.

PageRank gives pipelines a principled document/source importance score
(e.g. rank crawl domains by link authority before sampling — the
Common-Crawl-curation use). Implemented as the standard synchronous
power iteration in pure DataFrame algebra, GraphFrames-style
aggregate-messages without the dependency:

    r'(v) = (1 − d)/N + d · Σ_{u→v} r(u)/outdeg(u)

Each iteration is two shuffles (rank⋈edges on src, then groupBy dst) —
the minimal message-passing shape; edges are cached and re-partitioned
by src ONCE so every iteration reuses the same partitioning. Ranks are
one row per node (orders of magnitude smaller than edges). A fixed
iteration count keeps the whole computation a deterministic DAG — at
100 TB you bound iterations anyway (10-20) rather than testing
convergence per step.

Dangling nodes (no out-edges) keep receiving rank but emit none — their
mass leaks rather than being redistributed; the declared oracle unrolls
the SAME recurrence, so both engines agree exactly. (Full dangling-mass
redistribution adds one scalar aggregate per iteration — trivially
bolted on when semantics require it.)

Related in-repo: `components.connected_components` (alternating-star),
`components.dedup_survivors` — this module completes the graph family
with a value-propagating iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps.

    ``edges`` is a directed edge list; duplicate (src, dst) rows count
    as parallel edges (weight = multiplicity), matching the SQL oracle.
    Ranks start uniform at 1/N over the distinct node set (sources ∪
    destinations).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    d = float(damping)
    E = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).repartition("src")
    # one scan, not a union of two: explode each edge into its endpoints
    nodes = (
        E.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge list")
    # out-degree is joined onto the edge list ONCE — every iteration is
    # then a single rank⋈edges equi-join on the cached src partitioning
    # plus one partial-aggregated groupBy(dst)
    outdeg = E.groupBy("src").agg(F.count("*").alias("outdeg"))
    E2 = E.join(outdeg, "src").cache()
    base = (1.0 - d) / n

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(int(iterations)):
        contribs = (
            ranks.join(E2, ranks["node"] == E2["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("_in"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(d) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
    # materialize the small rank table, then drop the iteration caches —
    # no persisted state outlives the call (checkpoint=False keeps the
    # full lazy DAG for plan inspection; caches then outlive the call)
    if not checkpoint:
        return ranks
    out = ranks.localCheckpoint(eager=True)
    E2.unpersist()
    nodes.unpersist()
    return out
