"""Bloom-filter corpus-membership dedup.

"Is this incoming document already in the 100 TB corpus?" answered
without joining the incoming batch against the corpus: a Bloom filter
over the corpus's 8-byte content keys is built once (one codegen'd
scan + one bit_or aggregation), broadcast to executors, and each
incoming batch is prefiltered locally. Only the bloom-POSITIVE rows
(true dups + the configured false-positive fraction) reach the exact
verification join, so the join input shrinks from |batch| to
|dups| + fpp·|batch|.

The result is EXACT, not approximate: Bloom filters have no false
negatives, so a bloom-negative row is definitively new; positives are
re-checked with an exact semi-join on the content key. The declared
query (plans/queries.py `dedup_bloom_membership`) is therefore
oracle-paired with a plain anti-join.

Spark-first shape (no RDDs, no Python in the build path):

- positions: ``pmod(xxhash64(key, i), m)`` for i < k — k independent
  hash functions from the seeded-xxhash64 family, ANSI-safe (no
  overflowing ``h1 + i*h2`` arithmetic);
- build: explode positions → ``groupBy(pos >> 6)`` →
  ``bit_or(1 << (pos & 63))`` — one shuffle keyed by bitmap word, all
  JVM; the driver assembles the sparse (word, bits) rows into a dense
  numpy bitmap (same size as the serialized filter itself);
- probe: positions computed JVM-side again; an Arrow-batched pandas
  UDF tests all k bits per row against the broadcast bitmap with
  vectorized numpy indexing.

Sizing: standard m = -n·ln(p)/ln²2, k = (m/n)·ln2. At n = 10¹⁰ keys
and p = 1%, the bitmap is ~12 GB — broadcastable to big executors but
not free; raise ``fpp`` (the verify join stays exact) or shard the
filter by key range if that bites.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.dedup import normalize_text


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)  # whole uint64 words
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a key — k seeded xxhash64 draws,
    each reduced mod m. pmod keeps the result non-negative and the
    per-hash form avoids ANSI-mode overflow (``h1 + i*h2`` wraps)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


class BloomFilter:
    """Numpy-backed bloom bitmap with Spark-side hashing."""

    def __init__(self, m_bits: int, k: int, words: np.ndarray):
        self.m_bits = m_bits
        self.k = k
        self.words = words  # uint64[m_bits / 64]

    @classmethod
    def build(
        cls,
        keys: DataFrame,
        key_col: str,
        expected_items: int,
        fpp: float = 0.01,
    ) -> "BloomFilter":
        """One scan of ``keys``: explode the k positions, OR the bits
        per 64-bit word JVM-side, assemble the dense bitmap on the
        driver. The collect is ≤ the bitmap's own size (only words
        with at least one set bit come back)."""
        m_bits, k = optimal_params(expected_items, fpp)
        pos = keys.select(
            F.explode(_positions(F.col(key_col), m_bits, k)).alias("p")
        )
        words = (
            pos.select(
                F.shiftright("p", 6).alias("w"),
                F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("bits"))
            .collect()
        )
        dense = np.zeros(m_bits // 64, dtype=np.uint64)
        for r in words:
            dense[r["w"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
        return cls(m_bits, k, dense)

    def might_contain_col(self, key: Column) -> Column:
        """Boolean column: all k bits set for this key. The bitmap
        rides to executors inside the UDF closure (broadcast once per
        stage); bit tests are vectorized numpy over each Arrow batch."""
        bits = self.words

        @F.pandas_udf("boolean")
        def _test(pos: pd.Series) -> pd.Series:
            if len(pos) == 0:
                return pd.Series([], dtype=bool)
            P = np.vstack(pos.to_numpy()).astype(np.int64)  # rows × k
            w = bits[P >> 6]
            b = (w >> (P & 63).astype(np.uint64)) & np.uint64(1)
            return pd.Series(b.all(axis=1))

        return _test(_positions(key, self.m_bits, self.k))


def bloom_membership_dedup(
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    expected_corpus_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact "new content only" filter: rows of ``incoming`` whose
    normalized content does NOT appear in ``corpus``.

    Two stages: (1) bloom prefilter — bloom-negatives pass through
    with no shuffle at all; (2) exact left-anti join of the
    bloom-positives against corpus keys — removes true dups AND the
    false positives, so the output is exactly the anti-join result.
    """
    key_in = F.xxhash64(normalize_text(text_col)).alias("_bk")
    corpus_keys = corpus.select(
        F.xxhash64(normalize_text(text_col)).alias("_bk")
    )
    if expected_corpus_items is None:
        expected_corpus_items = max(1, corpus_keys.count())
    bf = BloomFilter.build(corpus_keys, "_bk", expected_corpus_items, fpp)

    keyed = incoming.withColumn("_bk", F.xxhash64(normalize_text(text_col)))
    flagged = keyed.withColumn(
        "_maybe", bf.might_contain_col(F.col("_bk"))
    )
    negatives = flagged.where(~F.col("_maybe"))
    positives = flagged.where(F.col("_maybe")).join(
        corpus_keys, "_bk", "left_anti"
    )
    return negatives.unionByName(positives).drop("_bk", "_maybe")
