"""Streaming / incrementally-maintained portable-HLL register views.

`operators/sketches.py` proved the register state is pure max-partial
algebra; this module plugs it into the repo's existing materialized-view
machinery so distinct-count sketches become INGEST-MAINTAINED state:

- `HllRegisterView` wraps an `IncrementalAggView` keyed by (group...,
  reg_idx) with one ``max(rho)`` measure — delta batches project each
  row to its register hit and the view's partial/merge algebra does the
  rest (append partials, merge-on-read, auto-compact, exactly-once
  tokens, ledgered redelivery).
- `stream_hll_into_view` feeds a Structured Streaming source through
  the projection into the view via the existing `stream_into_view`
  exactly-once folder.

Two layers of replay safety stack here: `apply_committed` tokens give
exactly-once per batch, and even WITHOUT them the register max-merge is
idempotent — re-folding a batch cannot move any register. At 100 TB the
view is at most ``groups·2^p`` rows per appended partial regardless of
stream volume, and reads never touch raw history.

Reference parity: the ingest-maintained `MessageCounter.cs` view
generalized from exact counts to mergeable cardinality sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.sketches import (
    _hll_rho,
    hll_estimate_from_registers,
)
from inception_eventstore_spark.sources.matview import (
    IncrementalAggView,
    Measure,
)

__all__ = [
    "HllRegisterView",
    "hll_project",
    "stream_hll_into_view",
    "CmsCounterView",
    "cms_project",
    "stream_cms_into_view",
]


def hll_project(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 9,
) -> DataFrame:
    """Per-ROW register projection: (group..., reg_idx, rho). The
    pre-aggregation half of ``hll_registers`` — streaming-safe (a pure
    column projection), so it composes with readStream sources."""
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    groups = group_cols or []
    idx, rho = _hll_rho(F.col(value_col), p)
    return df.select(*groups, idx.alias("reg_idx"), rho.alias("rho"))


class HllRegisterView:
    """Portable-HLL register state as an incrementally-maintained
    materialized view at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        value_col: str,
        group_cols: list[str] | None = None,
        p: int = 9,
        auto_compact_threshold: int = 64,
    ):
        if not 4 <= p <= 12:
            raise ValueError(f"p must be in [4, 12], got {p}")
        self.value_col = value_col
        self.group_cols = list(group_cols or [])
        self.p = p
        self.view = IncrementalAggView(
            spark,
            path,
            keys=[*self.group_cols, "reg_idx"],
            measures=[Measure("m_j", "max", "rho")],
            auto_compact_threshold=auto_compact_threshold,
        )

    def project(self, delta: DataFrame) -> DataFrame:
        return hll_project(delta, self.value_col, self.group_cols, self.p)

    def fold(self, delta: DataFrame) -> None:
        """Fold raw rows in (append one per-key max partial)."""
        self.view.apply(self.project(delta))

    def fold_committed(self, delta: DataFrame, token: str) -> bool:
        """Exactly-once fold under redelivery of the same token."""
        return self.view.apply_committed(self.project(delta), str(token))

    def registers(self) -> DataFrame:
        """Merged (group..., reg_idx, m_j) — the sketch state."""
        return self.view.read()

    def estimate(self) -> DataFrame:
        """Per-group (hll_denom, hll_zeros, hll_est) from the merged
        state — identical arithmetic to ``hll_distinct`` over the full
        history, without re-reading it."""
        return hll_estimate_from_registers(
            self.registers(), p=self.p, group_cols=self.group_cols
        )


def stream_hll_into_view(
    stream: DataFrame,
    hview: HllRegisterView,
    checkpoint_dir: str,
    trigger_once: bool = False,
    token_prefix: str = "hll-",
):
    """Maintain an ``HllRegisterView`` from a Structured Streaming
    source: the register projection runs inside the micro-batch plan
    and each batch folds exactly-once through the view's token ledger
    (and is idempotent by max-merge even without it). Returns the
    started StreamingQuery."""
    from inception_eventstore_spark.streaming.ingest import stream_into_view

    return stream_into_view(
        hview.project(stream),
        hview.view,
        checkpoint_dir,
        trigger_once=trigger_once,
        token_prefix=token_prefix,
    )


def cms_project(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Per-ROW Count-Min projection: each input row becomes ``depth``
    (row_id, bucket) rows under the SAME ``cms{r}:`` md5 salts as
    `operators.sketches.cms_sketch` (drift is pinned by
    test_sketch_view's project-vs-sketch equality test). The
    pre-aggregation half, streaming-safe."""
    from inception_eventstore_spark.operators.sampling import md5_prefix60

    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    value = F.col(value_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row_id"),
                F.pmod(
                    md5_prefix60(
                        F.concat(F.lit(f"cms{r}:"), value.cast("string"))
                    ),
                    F.lit(width),
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return df.select(F.explode(rows).alias("rb")).select(
        "rb.row_id", "rb.bucket"
    )


class CmsCounterView:
    """Count-Min sketch state as an incrementally-maintained
    materialized view: counters are SUM partials keyed by (row_id,
    bucket), so the linear merge is exactly the view's fold algebra.
    Unlike the HLL view, replay here is NOT idempotent (sums double-
    count) — exactly-once comes from the token ledger alone; use
    ``fold_committed`` / `stream_cms_into_view` for redelivery-prone
    sources."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        value_col: str,
        depth: int = 4,
        width: int = 512,
        auto_compact_threshold: int = 64,
    ):
        self.value_col = value_col
        self.depth = int(depth)
        self.width = int(width)
        self.view = IncrementalAggView(
            spark,
            path,
            keys=["row_id", "bucket"],
            measures=[Measure("n", "count")],
            auto_compact_threshold=auto_compact_threshold,
        )

    def project(self, delta: DataFrame) -> DataFrame:
        return cms_project(delta, self.value_col, self.depth, self.width)

    def fold(self, delta: DataFrame) -> None:
        self.view.apply(self.project(delta))

    def fold_committed(self, delta: DataFrame, token: str) -> bool:
        return self.view.apply_committed(self.project(delta), str(token))

    def sketch(self) -> DataFrame:
        """Merged (row_id, bucket, n) — feed to
        `operators.sketches.cms_estimate`."""
        return self.view.read()


def stream_cms_into_view(
    stream: DataFrame,
    cview: CmsCounterView,
    checkpoint_dir: str,
    trigger_once: bool = False,
    token_prefix: str = "cms-",
):
    """Maintain a ``CmsCounterView`` from a Structured Streaming
    source; exactly-once per micro-batch via the view's token ledger
    (required here — counter sums are not replay-idempotent)."""
    from inception_eventstore_spark.streaming.ingest import stream_into_view

    return stream_into_view(
        cview.project(stream),
        cview.view,
        checkpoint_dir,
        trigger_once=trigger_once,
        token_prefix=token_prefix,
    )
