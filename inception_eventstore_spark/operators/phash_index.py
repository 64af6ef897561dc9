"""Persisted pHash image index: visual near-dup lookup at ingest time.

`phash_near_duplicates` mines pairs WITHIN one corpus; the ingest-time
question is "is this NEW batch of images a visual near-dup of anything
ALREADY ingested?" — and answering it by re-mining the corpus per
batch is a full rescan per ingest. Same ingest-maintained-index
pattern as `MinHashTextIndex` (text) and `IvfVectorIndex` (vectors),
which the reference applies to its event-type index
(IndexByEventTypeStore.cs:44-61: keep the index current at write time
so reads never rescan the log):

- build/append hash each image ONCE and persist (8-byte hash + the 7
  pigeonhole block keys — never pixels);
- a probe hashes only the new batch, equi-joins its block keys
  against the stored buckets and verifies survivors with
  ``bit_count(xor)`` — per-batch cost is |batch|·7 bucket rows joined
  on 8-byte keys; the corpus images are never re-decoded;
- ``append_unique`` is dedup-at-ingest: index only images that match
  nothing.

Layout: ``<path>/buckets`` (_blk, _bv, _id, _h — the hash rides in
the bucket rows so the verify needs no second join), ``<path>/meta``
one-line JSON sidecar; plain Spark parquet/text so the index
round-trips on any Hadoop-visible filesystem.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.phash import (
    _BLOCK_BITS,
    _N_BLOCKS,
    image_phashes,
)


@dataclass(frozen=True)
class PhashIndexMeta:
    n_blocks: int
    block_bits: int
    id_col: str
    payload_col: str


class PhashImageIndex:
    """Pigeonhole block buckets over 63-bit image pHashes, persisted.

    Subclass seam: ``N_BLOCKS`` / ``BLOCK_BITS`` set the pigeonhole
    geometry and ``_hashes`` maps an asset batch to (id, hash) rows —
    `AudioFingerprintIndex` below swaps in the spectral fingerprint
    with its 9×7-bit geometry; everything else (layout, probe,
    append_unique) is hash-agnostic."""

    N_BLOCKS = _N_BLOCKS
    BLOCK_BITS = _BLOCK_BITS

    def __init__(self, spark: SparkSession, path: str, meta: PhashIndexMeta):
        self.spark = spark
        self.path = path.rstrip("/")
        self.meta = meta

    def _buckets_path(self) -> str:
        return self.path + "/buckets"

    def _meta_path(self) -> str:
        return self.path + "/meta"

    def _hashes(self, assets: DataFrame) -> DataFrame:
        """(id, hash) rows for a batch — the hash-family hook."""
        m = self.meta
        return image_phashes(assets, m.id_col, m.payload_col).select(
            F.col(m.id_col), F.col("phash").alias("_h63")
        )

    def _derive(self, assets: DataFrame) -> DataFrame:
        m = self.meta
        mask = (1 << m.block_bits) - 1
        hashes = self._hashes(assets)
        return hashes.select(
            F.col(m.id_col).alias("_id"),
            F.col("_h63").alias("_h"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("_h63"), b * m.block_bits)
                        .bitwiseAND(F.lit(mask))
                        for b in range(m.n_blocks)
                    ]
                )
            ).alias("_blk", "_bv"),
        )

    @classmethod
    def build(
        cls,
        assets: DataFrame,
        path: str,
        id_col: str = "asset_id",
        payload_col: str = "payload",
    ) -> "PhashImageIndex":
        meta = PhashIndexMeta(cls.N_BLOCKS, cls.BLOCK_BITS, id_col, payload_col)
        idx = cls(assets.sparkSession, path, meta)
        idx._derive(assets).write.mode("overwrite").parquet(
            idx._buckets_path()
        )
        (
            assets.sparkSession.createDataFrame(
                [(json.dumps(asdict(meta)),)], "v string"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .text(idx._meta_path())
        )
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PhashImageIndex":
        meta = PhashIndexMeta(
            **json.loads(
                spark.read.text(path.rstrip("/") + "/meta").first()["value"]
            )
        )
        return cls(spark, path, meta)

    def append(self, assets: DataFrame) -> None:
        """Index a new batch (same hash geometry); later probes see it."""
        self._derive(assets).write.mode("append").parquet(
            self._buckets_path()
        )

    def query(
        self, assets: DataFrame, max_hamming: int = 6
    ) -> DataFrame:
        """(query_id, match_id, hamming ≤ max_hamming): visual matches
        of a NEW batch against the indexed corpus — lossless for
        max_hamming ≤ n_blocks − 1 (pigeonhole)."""
        m = self.meta
        if max_hamming > m.n_blocks - 1:
            raise ValueError(
                f"max_hamming {max_hamming} > {m.n_blocks - 1} breaks "
                "the pigeonhole guarantee"
            )
        new = self._derive(assets).select(
            "_blk", "_bv",
            F.col("_id").alias("query_id"), F.col("_h").alias("_hq"),
        )
        stored = self.spark.read.parquet(self._buckets_path()).select(
            "_blk", "_bv",
            F.col("_id").alias("match_id"), F.col("_h").alias("_hm"),
        )
        return (
            new.join(stored, ["_blk", "_bv"])
            .select("query_id", "match_id", "_hq", "_hm")
            .dropDuplicates(["query_id", "match_id"])
            .withColumn(
                "hamming",
                F.bit_count(F.col("_hq").bitwiseXOR(F.col("_hm"))).cast(
                    "bigint"
                ),
            )
            .where(F.col("hamming") <= int(max_hamming))
            .select("query_id", "match_id", "hamming")
        )

    def append_unique(
        self, assets: DataFrame, max_hamming: int = 6
    ) -> DataFrame:
        """Dedup-at-ingest: index only images matching nothing already
        indexed; returns the appended (unique) rows. Matches are
        materialized BEFORE the append so the probe cannot see the
        batch's own rows."""
        m = self.meta
        dup_ids = (
            self.query(assets, max_hamming)
            .select(F.col("query_id").alias(m.id_col))
            .distinct()
            .localCheckpoint(eager=True)
        )
        unique = assets.join(dup_ids, m.id_col, "left_anti")
        self.append(unique)
        return unique


class AudioFingerprintIndex(PhashImageIndex):
    """Audio twin of the visual index: spectral fingerprints
    (`audiofp.audio_fingerprint63`) with the 9×7-bit pigeonhole
    geometry (lossless to hamming 8 — the measured robustness envelope
    of the fingerprint: PCM re-encode / ×0.5 volume / ×2 upsample).
    Probe with ``max_hamming=8``."""

    N_BLOCKS = 9
    BLOCK_BITS = 7

    def _hashes(self, assets: DataFrame) -> DataFrame:
        from inception_eventstore_spark.operators.audiofp import (
            audio_fingerprints,
        )

        m = self.meta
        return audio_fingerprints(assets, m.id_col, m.payload_col).select(
            F.col(m.id_col), F.col("afp").alias("_h63")
        )
