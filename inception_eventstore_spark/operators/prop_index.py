"""Secondary index on payload properties — the generalized
index_by_eventtype.

The reference maintains exactly one secondary index: event-type →
(aid, rev, pos), day-partitioned (`IndexByEventTypeStore.cs:44-61`,
pid math `:85-98`). This module generalizes that ingest-maintained
pattern to ANY extractable property of the envelope/payload (a JSON
field of ``props``, a derived column...): the index stores one row per
(value, event key) under a hash-bucketed directory layout, so an
equality probe is a partition-pruned scan of ONE bucket directory —
never a corpus scan — exactly how `_sig`/`_cell` prune the ANN indexes.

Layout: parquet partitioned by ``_vb = pmod(xxhash64(utf8(value)),
n_buckets)``. The bucket of a lookup value is computed DRIVER-SIDE with
the pure-python XXH64 twin (`functions/hashing.py`, equality with the
JVM expression pinned by tests), so a point lookup plans its partition
filter without running a Spark job first.

At 100 TB: the index is O(#events) tiny rows maintained by the same
ingest job that writes the log (the reference's dual-write, done as one
Spark write); probes touch 1/n_buckets of it, then semi-join the log on
its clustered keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.hashing import xxhash64

__all__ = ["PropertyIndex"]


class PropertyIndex:
    """Equality index ``value → key columns`` at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        n_buckets: int = 256,
    ):
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = int(n_buckets)

    # -- write side ------------------------------------------------
    def _rows(self, events: DataFrame, value: Column) -> DataFrame:
        v = value.alias("_val")
        return events.select(v, *self.key_cols).where(
            F.col("_val").isNotNull()
        ).withColumn(
            "_vb",
            F.pmod(
                F.xxhash64(F.encode(F.col("_val").cast("string"), "UTF-8")),
                F.lit(self.n_buckets),
            ),
        )

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        events: DataFrame,
        value: Column,
        key_cols: list[str],
        path: str,
        n_buckets: int = 256,
    ) -> "PropertyIndex":
        """Create the index from a full scan (one-time backfill)."""
        idx = cls(spark, path, key_cols, n_buckets)
        idx._rows(events, value).write.partitionBy("_vb").mode(
            "overwrite"
        ).parquet(path)
        return idx

    def append(self, events_delta: DataFrame, value: Column) -> None:
        """Ingest-time maintenance: index the new batch's rows only."""
        self._rows(events_delta, value).write.partitionBy("_vb").mode(
            "append"
        ).parquet(self.path)

    # -- read side -------------------------------------------------
    @staticmethod
    def _render(value) -> str:
        """The lookup value as the string Spark's CAST-to-string wrote
        it with. Only str and int are accepted: their python rendering
        is guaranteed identical to Spark's (utf-8 text / decimal
        digits). bool/float/timestamp values render DIFFERENTLY
        ('True' vs 'true', '1e+20' vs '1.0E20', …) — a driver-side
        guess would hash to the wrong bucket and silently miss, so
        callers must pass the Spark-rendered string themselves (or
        index a canonically-typed column in the first place)."""
        if isinstance(value, bool) or not isinstance(value, (str, int)):
            raise TypeError(
                f"lookup values must be str or int, got {type(value).__name__}"
                " — pass the Spark CAST-to-string rendering explicitly for"
                " other types"
            )
        return str(value)

    def _bucket_of(self, value) -> int:
        return xxhash64(self._render(value).encode("utf-8")) % self.n_buckets

    def lookup(self, value) -> DataFrame:
        """Key rows whose indexed property equals ``value`` — a scan of
        ONE bucket directory (partition filter planned driver-side),
        then the exact value equality inside it. Raises
        FileNotFoundError for an index with no data at all (never
        built, or built from rows whose property was always null);
        a merely-missing bucket returns an empty keyed result."""
        from inception_eventstore_spark.sources import fsutil

        rendered = self._render(value)
        b = self._bucket_of(value)
        bucket_dir = f"{self.path}/_vb={b}"
        if not fsutil.path_exists(self.spark, bucket_dir):
            if not fsutil.list_data_files(
                self.spark, self.path, recursive=True
            ):
                raise FileNotFoundError(
                    f"property index has no data: {self.path}"
                )
            # no event ever carried a value hashing to this bucket —
            # an empty result with the key schema, no Spark job
            first = self.spark.read.parquet(self.path).select(
                *self.key_cols
            )
            return first.limit(0)
        return (
            self.spark.read.option("basePath", self.path)
            .parquet(bucket_dir)
            .where(F.col("_val").cast("string") == rendered)
            .select(*self.key_cols)
        )

    def probe(self, events: DataFrame, value) -> DataFrame:
        """Events whose indexed property equals ``value``: index lookup
        → semi-join the log on its key columns (the reference's
        index-record → point-lookup loop, as ONE join)."""
        return events.join(
            self.lookup(value).dropDuplicates(self.key_cols),
            self.key_cols,
            "left_semi",
        )
