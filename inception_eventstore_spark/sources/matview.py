"""Incremental materialized aggregate views (generalizing the counter).

The reference maintains exactly one derived aggregate — the message
counter CRDT (`Counters/MessageCounter.cs`). This module generalizes
that pattern to ANY groupBy view over self-decomposable measures
(sum / count / min / max, avg as a derived sum÷count, and
approx_distinct as a mergeable Datasketches HLL sketch — ~1 KB of
state per key no matter the cardinality), maintained the same way
Catalyst distributes partial aggregation:

- ``apply(delta)`` pre-aggregates the delta batch map-side down to one
  PARTIAL row per touched key and appends it — cost is O(|delta keys|),
  the corpus is never re-read;
- ``read()`` folds all partial files with one groupBy — associative
  merges, so partials from any number of batches combine exactly;
- past ``auto_compact_threshold`` partial files the log self-folds to
  one row per key (the counter's bounded-file-count trick), so a hot
  view stays O(#keys) on disk regardless of refresh count.

Retractions: ``apply(batch, retract=True)`` negates the batch's sum,
count and avg partials before appending, removing those rows' effect
exactly. min/max (and HLL sketches) are NOT invertible — a retracting
apply raises if the view carries one; callers that delete source rows
from such views ``rebuild()``. This mirrors every production
incremental-MV engine's contract for non-invertible aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inception_eventstore_spark.sources import fsutil

__all__ = ["Measure", "IncrementalAggView"]

_KINDS = ("sum", "count", "min", "max", "avg", "approx_distinct")


@dataclass(frozen=True)
class Measure:
    """One output column: ``kind`` over ``src_col`` (src ignored for
    count)."""

    name: str
    kind: str
    src_col: str | None = None

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown measure kind {self.kind!r}")
        if self.kind != "count" and not self.src_col:
            raise ValueError(f"measure {self.name!r} needs src_col")


class IncrementalAggView:
    """A groupBy materialized view at ``path`` refreshed by delta
    batches."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        measures: list[Measure],
        auto_compact_threshold: int = 64,
    ):
        if not keys or not measures:
            raise ValueError("keys and measures must be non-empty")
        names = [m.name for m in measures]
        if len(set(names)) != len(names):
            raise ValueError("duplicate measure names")
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.measures = list(measures)
        self.auto_compact_threshold = auto_compact_threshold

    # -- partial-state algebra -------------------------------------
    def _partial_cols(self) -> list:
        cols = []
        for m in self.measures:
            if m.kind == "sum":
                cols.append(F.sum(m.src_col).alias(f"_s_{m.name}"))
            elif m.kind == "count":
                cols.append(F.count("*").alias(f"_c_{m.name}"))
            elif m.kind == "min":
                cols.append(F.min(m.src_col).alias(f"_mn_{m.name}"))
            elif m.kind == "max":
                cols.append(F.max(m.src_col).alias(f"_mx_{m.name}"))
            elif m.kind == "approx_distinct":
                # Datasketches HLL state IS the partial — binary,
                # mergeable, ~1 KB per key regardless of cardinality
                cols.append(
                    F.hll_sketch_agg(m.src_col).alias(f"_h_{m.name}")
                )
            else:  # avg → (sum, count) pair
                cols.append(F.sum(m.src_col).alias(f"_s_{m.name}"))
                cols.append(F.count(m.src_col).alias(f"_c_{m.name}"))
        return cols

    def _merge_cols(self) -> list:
        cols = []
        for m in self.measures:
            if m.kind == "sum":
                cols.append(F.sum(f"_s_{m.name}").alias(f"_s_{m.name}"))
            elif m.kind == "count":
                cols.append(F.sum(f"_c_{m.name}").alias(f"_c_{m.name}"))
            elif m.kind == "min":
                cols.append(F.min(f"_mn_{m.name}").alias(f"_mn_{m.name}"))
            elif m.kind == "max":
                cols.append(F.max(f"_mx_{m.name}").alias(f"_mx_{m.name}"))
            elif m.kind == "approx_distinct":
                cols.append(
                    F.hll_union_agg(f"_h_{m.name}").alias(f"_h_{m.name}")
                )
            else:
                cols.append(F.sum(f"_s_{m.name}").alias(f"_s_{m.name}"))
                cols.append(F.sum(f"_c_{m.name}").alias(f"_c_{m.name}"))
        return cols

    def _final_cols(self) -> list:
        cols = []
        for m in self.measures:
            if m.kind == "sum":
                cols.append(F.col(f"_s_{m.name}").alias(m.name))
            elif m.kind == "count":
                cols.append(F.col(f"_c_{m.name}").alias(m.name))
            elif m.kind == "min":
                cols.append(F.col(f"_mn_{m.name}").alias(m.name))
            elif m.kind == "max":
                cols.append(F.col(f"_mx_{m.name}").alias(m.name))
            elif m.kind == "approx_distinct":
                cols.append(
                    F.hll_sketch_estimate(f"_h_{m.name}").alias(m.name)
                )
            else:
                cols.append(
                    (
                        F.col(f"_s_{m.name}")
                        / F.nullif(F.col(f"_c_{m.name}"), F.lit(0))
                    ).alias(m.name)
                )
        return cols

    # -- lifecycle -------------------------------------------------
    def _exists(self) -> bool:
        return bool(fsutil.list_data_files(self.spark, self.path))

    @property
    def _ledger_path(self) -> str:
        # '.'-prefixed → hidden to both Spark's parquet discovery and
        # fsutil listings (CLAUDE.md hidden-path rule)
        return self.path.rstrip("/") + "/.applied_batches"

    def applied_tokens(self) -> set[str]:
        """Batch tokens already folded in via ``apply_committed``."""
        txt = fsutil.read_text(self.spark, self._ledger_path)
        return set(txt.split()) if txt else set()

    def _partial_frame(
        self, delta: DataFrame, retract: bool
    ) -> DataFrame:
        if retract:
            bad = [
                m.name
                for m in self.measures
                if m.kind in ("min", "max", "approx_distinct")
            ]
            if bad:
                raise ValueError(
                    f"measures {bad} are not invertible — rebuild() "
                    "after deleting source rows"
                )
        partial = delta.groupBy(*self.keys).agg(*self._partial_cols())
        if retract:
            partial = partial.select(
                *self.keys,
                *[
                    (-F.col(c)).alias(c)
                    for c in partial.columns
                    if c not in self.keys
                ],
            )
        return partial

    def apply(self, delta: DataFrame, retract: bool = False) -> None:
        """Fold one delta batch in: append its per-key partials.

        ``retract=True`` appends NEGATED sum/count/avg partials —
        applying the same batch once forward and once retracting is a
        no-op. Raises for non-invertible measures (min/max/
        approx_distinct): use ``rebuild()`` after deletes there.

        NOT idempotent: applying the same delta twice double-counts.
        Redelivery-prone callers (streaming foreachBatch) use
        ``apply_committed`` with a stable batch token instead.
        """
        self._partial_frame(delta, retract).write.mode("append").parquet(
            self.path
        )
        if (
            fsutil.data_file_count(self.spark, self.path)
            >= self.auto_compact_threshold
        ):
            self.compact()

    def apply_committed(
        self, delta: DataFrame, token: str, retract: bool = False
    ) -> bool:
        """Idempotent ``apply``: exactly-once under redelivery of the
        same ``token`` (Structured Streaming re-runs the last
        uncommitted batch_id on restart — this is the sink-side dedup
        that turns foreachBatch's at-least-once into exactly-once).

        Protocol: skip if the token is in the ledger; otherwise delete
        any half-committed files from a crashed prior attempt (their
        names carry the token), stage the batch's partials under a
        hidden dir, rename them into the view with token-prefixed
        names, and ledger the token last. Every crash window replays
        to the same final state:

        - before any rename: staged files are hidden → invisible;
        - mid-rename / pre-ledger: redelivery deletes the token's
          files and redoes the commit (no double count);
        - post-ledger: redelivery is a no-op.

        Returns True if the batch was applied, False if skipped.
        """
        token = str(token)
        if any(ch.isspace() or ch == "/" for ch in token):
            raise ValueError(f"batch token must be path-safe: {token!r}")
        ledger = fsutil.read_text(self.spark, self._ledger_path) or ""
        if token in set(ledger.split()):
            return False
        prefix = f"b{token}-"
        for f in fsutil.list_data_files(self.spark, self.path):
            if f.rsplit("/", 1)[-1].startswith(prefix):
                fsutil.delete_path(self.spark, f)
        staged = self.path.rstrip("/") + f"/_staged/{token}"
        self._partial_frame(delta, retract).write.mode(
            "overwrite"
        ).parquet(staged)
        for i, f in enumerate(
            sorted(fsutil.list_data_files(self.spark, staged))
        ):
            fsutil.rename_path(
                self.spark,
                f,
                self.path.rstrip("/") + f"/{prefix}{i}.parquet",
            )
        fsutil.delete_path(self.spark, staged)
        fsutil.write_text(
            self.spark, self._ledger_path, ledger + token + "\n"
        )
        if (
            fsutil.data_file_count(self.spark, self.path)
            >= self.auto_compact_threshold
        ):
            self.compact()
        return True

    def _state(self) -> DataFrame:
        return (
            self.spark.read.parquet(self.path)
            .groupBy(*self.keys)
            .agg(*self._merge_cols())
        )

    def read(self) -> DataFrame:
        """The current view: (keys..., measure columns...)."""
        if not self._exists():
            raise FileNotFoundError(
                f"materialized view has no state yet: {self.path}"
            )
        return self._state().select(*self.keys, *self._final_cols())

    def compact(self) -> None:
        """Fold the partial log into one row per key. The applied-token
        ledger survives the rewrite (mode-overwrite deletes the whole
        dir) so late redeliveries of compacted batches stay no-ops."""
        if not self._exists():
            return
        ledger = fsutil.read_text(self.spark, self._ledger_path)
        snap = self._state().localCheckpoint(eager=True)
        snap.write.mode("overwrite").parquet(self.path)
        if ledger:
            fsutil.write_text(self.spark, self._ledger_path, ledger)

    def rebuild(self, source: DataFrame) -> None:
        """Full recompute (required after min/max retractions). Keeps
        the ledger: already-applied batches live in ``source``'s rows,
        so their redelivery must remain a no-op."""
        ledger = fsutil.read_text(self.spark, self._ledger_path)
        partial = source.groupBy(*self.keys).agg(*self._partial_cols())
        partial.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            self.path
        )
        if ledger:
            fsutil.write_text(self.spark, self._ledger_path, ledger)
