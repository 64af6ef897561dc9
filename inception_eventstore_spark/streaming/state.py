"""Custom stateful streaming operators (SURVEY §2 F: Structured
Streaming with ``applyInPandasWithState`` for semantics the built-in
windowed aggregations cannot express).

Two operators:

- ``commit_watermarks``: per-aggregate commit-stream integrity monitor.
  The reference guarantees revision contiguity through its PK-upsert +
  optimistic concurrency (AggregateCommit revisions are dense); on an
  at-least-once streaming log the same invariant becomes an *assertion
  to monitor*. State per aggregate = (contiguous high-water revision,
  max seen, event count, bounded pending set); each micro-batch emits
  the updated watermark row and whether a revision gap is currently
  open. This is genuinely stateful-custom: a session/tumbling window
  cannot express "dense-prefix high-water mark across batches".
- ``streaming_sessionize``: the Spark-first gap sessionization —
  built-in ``session_window`` + watermark (no custom state needed; kept
  here as the streaming twin of operators/sessions.py).

Scale: state is per-aggregate-id and O(1) outside pathological gap
windows (the pending set is capped at ``_PENDING_CAP``); Spark shards
state by the group key across executors, checkpointed with the query.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Bound on tracked out-of-order revisions per aggregate — beyond this
#: the furthest-ahead revisions are dropped (the gap flag stays true).
_PENDING_CAP = 1024

_STATE_SCHEMA = "high_water int, max_seen int, n bigint, pending array<int>"


def _advance(hw: int, pending: set[int]) -> int:
    while hw + 1 in pending:
        pending.discard(hw + 1)
        hw += 1
    return hw


def commit_watermarks(
    events: DataFrame,
    id_col: str = "id",
    rev_col: str = "rev",
) -> DataFrame:
    """Streaming per-aggregate revision watermark with gap detection.

    Emits one row per aggregate per micro-batch it appears in:
    (<id_col>, high_water_rev, max_seen_rev, n_events, has_gap) where
    ``high_water_rev`` is the densest contiguous revision prefix seen so
    far (1..hw all present) and ``has_gap`` flags max_seen > high_water.
    The id column keeps its name and input type (binary aggregate ids,
    string/long analytics keys all work).
    """
    from pyspark.sql import types as T

    id_type = events.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("high_water_rev", T.IntegerType(), False),
            T.StructField("max_seen_rev", T.IntegerType(), False),
            T.StructField("n_events", T.LongType(), False),
            T.StructField("has_gap", T.BooleanType(), False),
        ]
    )
    is_binary = isinstance(id_type, T.BinaryType)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hw, mx, n, pending_list = state.get
            pending = set(int(p) for p in pending_list)
        else:
            hw, mx, n, pending = 0, 0, 0, set()
        for pdf in pdfs:
            for r in pdf[rev_col]:
                r = int(r)
                n += 1
                if r > mx:
                    mx = r
                if r == hw + 1:
                    hw = _advance(r, pending)
                elif r > hw:
                    pending.add(r)
        if len(pending) > _PENDING_CAP:
            pending = set(sorted(pending)[:_PENDING_CAP])
        state.update((hw, mx, n, sorted(pending)))
        key_val = bytes(key[0]) if is_binary else key[0]
        yield pd.DataFrame(
            {
                id_col: [key_val],
                "high_water_rev": [hw],
                "max_seen_rev": [mx],
                "n_events": [n],
                "has_gap": [mx > hw],
            }
        )

    return events.groupBy(F.col(id_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts_dt",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked gap-session aggregation over a streaming DataFrame —
    the built-in ``session_window`` merges overlapping per-event windows
    into variable-length sessions; state eviction is driven by the
    watermark (late events beyond it are dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col(user_col),
            F.col("n_events"),
        )
    )


def streaming_zscore_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 20,
    min_history: int = 5,
    threshold: float = 2.0,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.zscore_anomalies``: a
    per-key trailing window of the last ``window`` values carried
    ACROSS micro-batches in group state, each arriving event scored
    against the history that preceded it.

    Semantics match the batch operator given in-order delivery per key
    (a monitor's normal case): ≥ ``min_history`` prior values, positive
    trailing std (ddof=1), |z| ≥ threshold; cold keys never alarm.
    Events inside one micro-batch are processed in (ts, tiebreak_col)
    order — pass the SAME tie-break column the batch operator orders by
    (default ``event_id``; ``None`` falls back to ts-only, leaving
    equal-ts ordering to the delivery order). Cross-batch reordering
    scores against the state as-delivered (the at-least-once monitoring
    contract — the batch operator is the exact-replay auditor). Null
    values never score, but they DO occupy a trailing-window slot
    (stored as a NaN placeholder; the non-null count is tracked
    separately) — mirroring the batch twin's ROWS-based frame, where a
    null row shrinks roll_n rather than letting the window reach
    further back. NaN input values are treated as null (pandas cannot
    distinguish them after the Arrow transfer).

    Scale: state per key is a float array capped at ``window`` values —
    sharded by key across executors and checkpointed; no global state,
    no rescan of history.
    """
    from pyspark.sql import types as T

    key_type = events.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_type, True),
            T.StructField(ts_col, events.schema[ts_col].dataType, True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("zscore", T.DoubleType(), True),
        ]
    )
    state_schema = "hist array<double>"
    w = int(window)

    if tiebreak_col and tiebreak_col not in events.columns:
        if tiebreak_col == "event_id":  # schema without the default
            tiebreak_col = None
        else:
            raise ValueError(
                f"tiebreak_col {tiebreak_col!r} not in input columns"
            )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        hist: list[float] = (
            [float(x) for x in state.get[0]] if state.exists else []
        )
        out_ts, out_v, out_z = [], [], []
        # ONE concat+sort of the whole micro-batch group: the runtime
        # delivers a key's rows as multiple arbitrary-order Arrow
        # chunks, and sorting each chunk separately would interleave
        # later-ts rows into the history before earlier ones
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            ).sort_values(sort_cols, kind="stable")
            for ts, v in zip(whole[ts_col], whole[value_col]):
                v = float(v)
                if v != v:  # NaN/null: not scoreable, but it OCCUPIES
                    # a frame slot like the batch twin's ROWS window
                    # (count/avg/stddev skip it via the placeholder)
                    hist.append(float("nan"))
                    continue
                tail = [x for x in hist[-w:] if x == x]
                n = len(tail)
                if n >= min_history and n >= 2:
                    mean = sum(tail) / n
                    var = sum((x - mean) ** 2 for x in tail) / (n - 1)
                    std = math.sqrt(var)
                    if std > 0:
                        z = (v - mean) / std
                        if abs(z) >= threshold:
                            out_ts.append(ts)
                            out_v.append(v)
                            out_z.append(z)
                hist.append(v)
        state.update(([float(x) for x in hist[-w:]],))
        if out_ts:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_ts),
                    ts_col: out_ts,
                    "value": out_v,
                    "zscore": out_z,
                }
            )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
