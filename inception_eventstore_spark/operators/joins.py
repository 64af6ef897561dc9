"""Temporal join operators Spark lacks natively (SURVEY §2 F: the
reference has only the R11 index-nested-loop equi-join; these are
additive, built as compositions of built-in DataFrame ops).

as-of join — the union+window formulation:
  tag left/right rows, union them on (key, time), sort within key, and
  carry the last-seen right payload forward with a running last_value
  (ignorenulls) window; left rows then read their as-of match directly.
  One shuffle on the key — the same shuffle any per-key window needs —
  versus the naive range-join's quadratic bucket explosion.

range join — the bucketized formulation:
  a plain ``points JOIN intervals ON p BETWEEN lo AND hi`` has no equi
  key, so Catalyst falls back to BroadcastNestedLoopJoin (O(n·m)).
  Bucketizing restores an equi key: intervals explode to every bucket
  of width ``bucket_width`` they overlap, points map to exactly one
  bucket, and the hash join on the bucket id is followed by the exact
  bound filter. Each (point, interval) pair meets in at most one bucket
  (the point's), so no dedup pass is needed. Cost: |intervals| ×
  avg(span/bucket_width) exploded rows — pick ``bucket_width`` near the
  typical interval span to keep the blowup ~2× while each point joins
  only interval fragments it could actually match.
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


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    max_distance: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row of the same key whose
    time is CLOSEST in either direction (the bidirectional sibling of
    ``asof_join``; ties prefer the earlier right row). Time columns
    must be numeric (e.g. epoch micros / FileTime longs) so distance
    is well-defined; ``max_distance`` nulls out matches farther than
    the bound. Same uniqueness contract as asof_join: the right side
    should be unique per (key, time).

    Shape: the same union as asof_join with TWO carry windows —
    backward (last right at-or-before) and forward (first right
    at-or-after). Both windows share the one hash partitioning on the
    key, so the whole join still costs a single shuffle (plus the two
    within-partition sorts), never a per-row range probe."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_time)]
    lcols = left.columns

    r_struct_t = right.select(
        F.struct(F.col(right_time).alias("_rt"), *value_cols).alias("s")
    ).schema["s"].dataType
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("long").alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(F.col(right_time).alias("_rt"), *value_cols).alias("_r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # rights sort before lefts at equal time in BOTH directions, so a
    # same-timestamp right is visible to each carry (distance 0)
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_back", F.last("_r", ignorenulls=True).over(w_back)
    ).withColumn("_fwd", F.last("_r", ignorenulls=True).over(w_fwd))

    d_back = F.col("_t") - F.col("_back")["_rt"].cast("long")
    d_fwd = F.col("_fwd")["_rt"].cast("long") - F.col("_t")
    pick_back = F.when(
        F.col("_back").isNull(), F.lit(False)
    ).when(F.col("_fwd").isNull(), F.lit(True)).otherwise(d_back <= d_fwd)
    match = F.when(pick_back, F.col("_back")).otherwise(F.col("_fwd"))
    if max_distance is not None:
        dist = F.when(pick_back, d_back).otherwise(d_fwd)
        match = F.when(dist <= F.lit(max_distance), match)
    return carried.where(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        match["_rt"].alias("nearest_ts"),
        *[match[c].alias(c) for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    bounds: str = "[]",
) -> DataFrame:
    """Inner join of ``points`` to every interval containing its
    ``point_col`` value (numeric/long columns; see module docstring for
    the bucketization strategy).

    ``bounds``: "[]" (lo ≤ p ≤ hi, default) or "[)" (lo ≤ p < hi).
    Output columns = points' ∪ intervals'. Integer ``div`` bucketing is
    exact for the full int64 range (no float rounding — ns-scale
    timestamps exceed 2^53).
    """
    if bounds not in ("[]", "[)"):
        raise ValueError(f"bounds must be '[]' or '[)', got {bounds!r}")
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    left = points.withColumn(
        "_rb", F.expr(f"`{point_col}` div {bucket_width}")
    )
    right = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.expr(f"`{lo_col}` div {bucket_width}"),
                F.expr(f"`{hi_col}` div {bucket_width}"),
            )
        ),
    )
    upper = (
        F.col(point_col) <= F.col(hi_col)
        if bounds == "[]"
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        left.join(right, "_rb", "inner")
        .where((F.col(point_col) >= F.col(lo_col)) & upper)
        .drop("_rb")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Interval OVERLAP join: every (left, right) pair whose closed
    intervals [l_lo, l_hi] × [r_lo, r_hi] intersect
    (l_lo ≤ r_hi AND r_lo ≤ l_hi) — the general two-sided sibling of
    `range_join` (point-in-interval): campaign windows × user activity
    spans, maintenance windows × sessions, any time-overlap pairing.

    Never a cross join: both sides explode into the ``bucket_width``-
    wide buckets their interval covers, pairs meet on the bucket
    equi-key, the exact overlap predicate filters, and a distinct on
    (left_id, right_id) removes multi-bucket repeats — the same
    bucketization the attribution lookback join uses (CLAUDE.md:
    interval pairs must key on a window-sized bucket, or the join
    materializes quadratic history). Fan-out per row is
    len/bucket_width, guarded by ``max_buckets`` (an interval covering
    more than that many buckets means bucket_width is mis-sized for
    the data — raise it).

    Output: (left_id, l_lo, l_hi, right_id, r_lo, r_hi), distinct.
    Integer div bucketing — exact over the full int64 range."""
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")

    def _explode(df, lo, hi, ncheck):
        # lo > hi is rejected before anything else (ADVICE r10): an
        # inverted interval would make F.sequence step DOWNWARD
        # through the reversed bucket range and the closed-overlap
        # predicate can still emit pairs for a logically empty
        # interval — silent garbage, so it raises like the fan-out
        # guard below instead.
        guarded = F.expr(
            f"if(`{lo}` > `{hi}`, "
            f"raise_error(concat('interval_join: inverted interval "
            f"(lo > hi) on the {ncheck}: ', cast(`{lo}` as string), "
            f"' > ', cast(`{hi}` as string))), "
            f"if(`{hi}` div {bucket_width} - `{lo}` div {bucket_width}"
            f" < {int(max_buckets)}, `{lo}` div {bucket_width}, "
            f"raise_error('interval_join: an interval covers more than "
            f"{int(max_buckets)} buckets ({ncheck}) — raise "
            f"bucket_width')))"
        )
        return df.withColumn(
            "_ib",
            F.explode(
                F.sequence(
                    guarded, F.expr(f"`{hi}` div {bucket_width}")
                )
            ),
        )

    lx = _explode(
        left.select(left_id, l_lo, l_hi), l_lo, l_hi, "left side"
    )
    rx = _explode(
        right.select(right_id, r_lo, r_hi), r_lo, r_hi, "right side"
    )
    return (
        lx.join(rx, "_ib")
        .where(
            (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
        )
        .drop("_ib")
        .distinct()
    )
