"""CDC merge / upsert: apply a changelog to a keyed snapshot.

The reference's write path is an idempotent primary-key upsert
(Cassandra INSERT == upsert, CassandraEventStore.cs:118-125); this
module is the batch/analytics generalization: given a base snapshot and
a stream of keyed change rows (upserts and deletes with a monotonically
increasing sequence), produce the next snapshot — the MERGE INTO shape
every lakehouse needs.

Spark-first formulation: one ``unionByName`` + one window over the key
(latest-wins by (seq, source-priority)) — a SINGLE shuffle on the key,
no join at all. A join-based MERGE shuffles both sides AND re-shuffles
for the output; the union-window form moves each row exactly once and
AQE handles skewed keys.

At 100 TB the base snapshot is the big side: if it is stored bucketed
by the key (``sources/bucketed.py``) the window reuses the bucket
partitioning and only the (small) changelog shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Changelog operation markers.
OP_UPSERT = "U"
OP_DELETE = "D"


def merge_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """Next snapshot = base ⊕ changes (latest change per key wins;
    a trailing delete drops the key; keys never seen pass through).

    ``changes`` carries ``keys``, every base column, ``seq_col``
    (monotone version — ties broken in favor of the changelog) and
    ``op_col`` ('U' upsert / 'D' delete). The base rows enter the
    window at seq = -∞ so any change beats them.

    Determinism contract: ``(keys, seq)`` must be UNIQUE within
    ``changes`` — two changelog rows tying on the same key and seq have
    no defined winner. If the source can emit such ties (e.g. multiple
    producers sharing a coarse sequence), pass ``tie_break``: extra
    changelog column names (a source ordinal, an offset) appended
    descending to the window order so the winner is total-ordered."""
    tie_break = list(tie_break or [])
    value_cols = [c for c in base.columns if c not in keys]
    base_tagged = base.select(
        *keys,
        *value_cols,
        F.lit(None).cast("long").alias("_seq"),
        F.lit(OP_UPSERT).alias("_op"),
        F.lit(0).alias("_pri"),
        *[F.lit(None).cast("long").alias(f"_tb_{c}") for c in tie_break],
    )
    changes_tagged = changes.select(
        *keys,
        *value_cols,
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(op_col).alias("_op"),
        F.lit(1).alias("_pri"),
        *[F.col(c).cast("long").alias(f"_tb_{c}") for c in tie_break],
    )
    merged = base_tagged.unionByName(changes_tagged)
    w = Window.partitionBy(*keys).orderBy(
        F.col("_seq").desc_nulls_last(),
        F.col("_pri").desc(),
        *[F.col(f"_tb_{c}").desc_nulls_last() for c in tie_break],
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_op") != OP_DELETE))
        .drop("_seq", "_op", "_pri", "_rn",
              *[f"_tb_{c}" for c in tie_break])
    )


def latest_by_key(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """Compact a changelog to its latest row per key (tombstones kept —
    feed the result to ``merge_changelog`` or filter ``op`` yourself).

    This is the map-side-combinable 'compact before merge' step: run it
    per micro-batch/partition to shrink a hot changelog before the
    full-snapshot merge. Same determinism contract as
    ``merge_changelog``: (keys, seq) unique, or pass ``tie_break``."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        *[F.col(c).desc_nulls_last() for c in (tie_break or [])],
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed snapshot reconciliation — the data-diff every migration,
    backfill and CDC pipeline runs before switching reads: one summary
    row per metric, ``(metric, n)``, with metrics ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` plus a
    ``col_changed:<name>`` row per compared column (how many common
    keys differ in THAT column — the drill-down that tells you a diff
    is one bad column, not a corrupted table).

    Comparison is null-safe (NULL == NULL is unchanged, NULL vs value
    is a change); ``compare_cols`` defaults to every shared non-key
    column. Keys present on both sides with every compared column
    null-safe-equal count as ``unchanged``.

    Scale: ONE full outer join on the key (the unavoidable shuffle —
    co-located for free when both snapshots are bucketed on the key,
    `sources/bucketed.py`), then a single partial-aggregated pass
    computes every metric; the unpivot to rows is over the tiny
    aggregate. No per-column passes, no collect.

    Reference analog: the dual-table consistency checks around
    migration (S5, `operators/migration.py`; reference
    CassandraMigrator dataflow) promoted to a first-class operator."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *[F.col(c).alias(f"_ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
        F.lit(1).alias("_op"),
    )
    n = new.select(
        *[F.col(c).alias(f"_nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
        F.lit(1).alias("_np"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_ok_{c}") == F.col(f"_nk_{c}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    col_diff = {
        c: (
            F.col("_op").isNotNull()
            & F.col("_np").isNotNull()
            & ~F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
        ).cast("bigint")
        for c in compare_cols
    }
    any_diff = (
        F.greatest(*col_diff.values(), F.lit(0), F.lit(0))
        if col_diff
        else F.lit(0)
    )
    aggs = [
        F.sum(F.col("_op").isNull().cast("bigint")).alias("added"),
        F.sum(F.col("_np").isNull().cast("bigint")).alias("removed"),
        F.sum(
            (
                F.col("_op").isNotNull()
                & F.col("_np").isNotNull()
                & (any_diff == 1)
            ).cast("bigint")
        ).alias("changed"),
        F.sum(
            (
                F.col("_op").isNotNull()
                & F.col("_np").isNotNull()
                & (any_diff == 0)
            ).cast("bigint")
        ).alias("unchanged"),
        *[
            F.sum(col_diff[c]).alias(f"col_changed:{c}")
            for c in compare_cols
        ],
    ]
    wide = j.agg(*aggs)
    metrics = ["added", "removed", "changed", "unchanged"] + [
        f"col_changed:{c}" for c in compare_cols
    ]
    stack = ", ".join(f"'{m}', coalesce(`{m}`, 0)" for m in metrics)
    return wide.select(
        F.expr(
            f"stack({len(metrics)}, {stack}) AS (metric, n)"
        )
    ).select("metric", F.col("n").cast("bigint").alias("n"))
