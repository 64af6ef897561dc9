"""Sessionization: gap-based session assignment over an event stream
(SURVEY §2 F additive operator; streaming analog = session_window).

Pure window composition — lag to detect gaps, running sum of gap flags
to number sessions — one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap: str | Column = "1 hour",
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign ``session_id`` (1-based per key): a new session starts when
    the time since the previous event of the same key exceeds ``gap``
    (an INTERVAL string or literal Column)."""
    gap_expr = F.expr(f"INTERVAL {gap}") if isinstance(gap, str) else gap
    order = [F.col(time_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(time_col).over(w)
    new_session = (
        prev.isNull() | (F.col(time_col) > prev + gap_expr)
    ).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap: str = "1 hour",
) -> DataFrame:
    """Per-key session rollup: session count, events per session stats."""
    s = sessionize(events, key_col, time_col, gap)
    per_session = s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
    )
    return per_session.groupBy(key_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


def state_runs(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    state_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(key, state, run_id, n_events, run_start, run_end) — consecutive
    identical states per key collapsed to runs (gaps-and-islands):
    the state-change compression that turns an event log into a
    status-interval table (uptime/downtime spans, mode timelines).
    One window shuffle: lag marks change points, a running sum numbers
    the islands, one groupBy collapses them — the same
    change-point + cumsum shape `sessionize` uses for time gaps,
    applied to VALUE changes."""
    w = Window.partitionBy(key_col).orderBy(time_col, order_tiebreak)
    chg = (
        F.lag(state_col).over(w).isNull()
        | (F.col(state_col) != F.lag(state_col).over(w))
    ).cast("long")
    runs = events.withColumn(
        "run_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy(key_col, "run_id").agg(
        F.first(state_col).alias("state"),
        F.count("*").alias("n_events"),
        F.min(time_col).alias("run_start"),
        F.max(time_col).alias("run_end"),
    )


def session_flow(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    gap: str = "1 hour",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Entry→exit session flow matrix — the landing/exit report: per
    (entry_type, exit_type), how many sessions started with one and
    ended with the other, plus how many of those were single-event
    bounces. Returns (entry_type, exit_type, n_sessions, bounces,
    bounce_ppm) — a bounce necessarily has entry == exit, so bounce
    rows off the diagonal are zero by construction.

    Built on `sessionize` (gap-based session ids): one user-keyed
    window pass assigns sessions, one partial-aggregated groupBy per
    (user, session) picks the first/last event via struct min/max on
    the total (ts, tiebreak) order, one |types|²-row rollup finishes.
    All integers; bounce_ppm = bounces·10⁶ div n_sessions."""
    s = sessionize(
        events,
        key_col=key_col,
        time_col=time_col,
        gap=gap,
        order_tiebreak=order_tiebreak,
    )
    per_session = s.groupBy(key_col, "session_id").agg(
        F.min(
            F.struct(time_col, order_tiebreak, type_col)
        ).alias("_first"),
        F.max(
            F.struct(time_col, order_tiebreak, type_col)
        ).alias("_last"),
        F.count("*").cast("bigint").alias("_n"),
    )
    return (
        per_session.groupBy(
            F.col(f"_first.{type_col}").alias("entry_type"),
            F.col(f"_last.{type_col}").alias("exit_type"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum((F.col("_n") == 1).cast("bigint"))
            .cast("bigint")
            .alias("bounces"),
        )
        .select(
            "entry_type",
            "exit_type",
            "n_sessions",
            "bounces",
            F.expr(
                "CAST(bounces * 1000000 div n_sessions AS BIGINT)"
            ).alias("bounce_ppm"),
        )
    )
