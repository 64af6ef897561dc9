"""Temporal join operators Spark lacks natively (SURVEY §2 F: the
reference has only the R11 index-nested-loop equi-join; these are
additive, built as compositions of built-in DataFrame ops).

as-of join — the union+window formulation:
  tag left/right rows, union them on (key, time), sort within key, and
  carry the last-seen right payload forward with a running last_value
  (ignorenulls) window; left rows then read their as-of match directly.
  One shuffle on the key — the same shuffle any per-key window needs —
  versus the naive range-join's quadratic bucket explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the newest right row of the same ``on``
    key with ``right_time <= left_time`` (``<`` when ``strict``).

    Returns all left columns plus each requested right ``value_cols``
    (null when no prior right row exists) and ``asof_ts`` (the matched
    right timestamp). The right side should be unique per (key, time) —
    with duplicates, which of the equal-time rows wins is
    plan-order-dependent (dedupe upstream if that matters).
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_time)
        ]
    lcols = left.columns

    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right on equal ts
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_time).alias("_rt"), *value_cols
                ).alias("s")
            ).schema["s"].dataType
        ).alias("_r"),
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(F.col(right_time).alias("_rt"), *value_cols).alias("_r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # strict (<): left rows sort BEFORE right rows at equal time so the
    # carried value excludes same-timestamp rights.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        F.col("_match")["_rt"].alias("asof_ts"),
        *[F.col("_match")[c].alias(c) for c in value_cols],
    )
    return out
