"""Audio fingerprinting + near-duplicate audio pairs.

The audio leg of multimodal dedup (images: `operators/phash.py`): a
63-bit Haitsma-Kalker-style spectral-band fingerprint — decode WAV →
10 half-overlapping Hann frames spanning the clip → power in 8
log-spaced ABSOLUTE-Hz bands (200–3200 Hz) per frame → bit(f, b) =
sign of the time-delta of the band-delta, the classic "Philips robust
hash" bit function (Haitsma & Kalker 2002). 63 bits = 9 frame deltas
× 7 band deltas, BIGINT-safe like the pHash.

Absolute-Hz bands (not FFT-bin splits) make the fingerprint
sample-rate-independent; band/time DELTAS make it exactly invariant
to volume scaling (a positive factor scales every energy, preserving
all difference signs — residual flips come only from PCM
re-quantization noise). Measured on the textured fixtures: unrelated
clips ≥ 16 bits apart (mean ~31), while PCM-16 re-encodes, ×0.5
volume, and ×2 upsampling stay within 8 bits — hence the pair
default ``max_hamming=8`` with 9 blocks × 7 bits (pigeonhole-lossless
to 8). Aggressive DOWN-sampling through a linear interpolator is NOT
in the robustness envelope (no anti-alias filter → real spectral
change); resample with `multimodal.resample_audio` before
fingerprinting if rates must be unified.

Pair join: `hamming63_pairs` — the generic banded-hamming self-join
(explode into blocks, bucket equi-join, bit_count verify) shared with
the image pHash. Never all-pairs; fan-out bounded by bucket sizes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.multimodal import decode_wav

#: Fingerprint geometry.
_N_FRAMES = 10
_N_BANDS = 8
_EDGES = np.geomspace(200.0, 3200.0, _N_BANDS + 1)
_BITS = (_N_FRAMES - 1) * (_N_BANDS - 1)  # 63


def audio_fingerprint63(payload: bytes) -> int:
    """63-bit spectral fingerprint of one WAV payload (any PCM/float
    format `decode_wav` reads; channels already averaged to mono)."""
    x, rate = decode_wav(payload)
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < _N_FRAMES:
        raise ValueError(f"clip too short to fingerprint ({n} samples)")
    fl = max(2, n // 5)
    hop = max(1, (n - fl) // (_N_FRAMES - 1))
    win = np.hanning(fl)
    E = np.empty((_N_FRAMES, _N_BANDS))
    for f in range(_N_FRAMES):
        fr = x[f * hop:f * hop + fl]
        spec = np.abs(np.fft.rfft(fr * win[: len(fr)])) ** 2
        freqs = np.fft.rfftfreq(len(fr), d=1.0 / rate)
        for b in range(_N_BANDS):
            E[f, b] = spec[
                (freqs >= _EDGES[b]) & (freqs < _EDGES[b + 1])
            ].sum()
    h, bit = 0, 0
    for f in range(_N_FRAMES - 1):
        for b in range(_N_BANDS - 1):
            d = (E[f + 1, b] - E[f + 1, b + 1]) - (E[f, b] - E[f, b + 1])
            if d > 0:
                h |= 1 << bit
            bit += 1
    return h


def audio_fingerprints(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, afp): fingerprint every audio asset — one Arrow kernel per
    partition (decode + 10 small FFTs per clip). Filter to audio rows
    first; the kernel raises on non-WAV payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "afp": [
                        audio_fingerprint63(p) for p in pdf[payload_col]
                    ],
                }
            )

    id_type = assets.schema[id_col].dataType.simpleString()
    out = assets.select(id_col, payload_col).mapInPandas(
        kernel, schema=f"_id {id_type}, afp long"
    )
    return out.select(F.col("_id").alias(id_col), "afp")


def hamming63_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    n_blocks: int,
    block_bits: int,
    materialize: bool = True,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Generic banded-hamming self-join over a 63-bit hash column:
    (id_a, id_b, hamming ≤ max_hamming). Lossless iff max_hamming ≤
    n_blocks − 1 (pigeonhole: a pair within the ball agrees on at
    least one block); enforced. n_blocks · block_bits must cover the
    63-bit domain.

    The quadratic step runs over DISTINCT hash values, not ids: at
    corpus scale the hot buckets are floods of byte-identical content
    (empty pages, flat/black images, silence) whose members all share
    ONE hash — deduping first collapses a df² bucket blow-up to df
    before the banded equi-join + ``bit_count(xor)`` verify, and the
    id-level report is recovered by two hash-equality joins:
    same-hash pairs (hamming 0) from a plain equi self-join,
    cross-hash pairs by expanding each verified hash pair. (The
    expansion is output-sized — the pair CONTRACT is quadratic within
    a true duplicate flood; for web-scale floods prefer
    exact-group dedup (`dedup.exact_duplicate_groups` on the hash)
    and feed only group representatives here.) Never an all-pairs
    join on either level.

    ``max_bucket`` (skew.cap_hot_buckets) additionally bounds the
    DISTINCT-hash bucket fan-out: with small block alphabets
    (block_bits=7 → 128 values) a large distinct-hash population piles
    thousands of unrelated hashes into each (block, value) bucket by
    birthday pressure alone, and a dense near-dup cluster does the
    same with related ones — either way the bucket self-join goes df²
    before the bit_count verify. Over-cap buckets are dropped with a
    logged report; pairs agreeing on another, cooler block still
    surface."""
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"max_hamming {max_hamming} > {n_blocks - 1} breaks the "
            "pigeonhole guarantee; raise n_blocks"
        )
    if n_blocks * block_bits < 63:
        raise ValueError("blocks must cover the 63-bit hash")
    base = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    ).persist()
    base.count()
    mask = (1 << block_bits) - 1
    hd = base.select("_h").distinct()
    blocks = hd.select(
        "_h",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_h"), b * block_bits)
                    .bitwiseAND(F.lit(mask))
                    for b in range(n_blocks)
                ]
            )
        ).alias("_blk", "_bv"),
    )
    from inception_eventstore_spark.functions.skew import cap_hot_buckets

    blocks = cap_hot_buckets(
        blocks, ["_blk", "_bv"], max_bucket, "hamming63_pairs"
    )
    left = blocks.select("_blk", "_bv", F.col("_h").alias("_ha"))
    right = blocks.select("_blk", "_bv", F.col("_h").alias("_hb"))
    hash_pairs = (
        left.join(right, ["_blk", "_bv"])
        .where(F.col("_ha") < F.col("_hb"))
        .select("_ha", "_hb")
        .dropDuplicates(["_ha", "_hb"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast(
                "bigint"
            ),
        )
        .where(F.col("hamming") <= int(max_hamming))
    )
    a = base.select(F.col("_id").alias("id_a"), F.col("_h").alias("_ha"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_h").alias("_hb"))
    cross = (
        hash_pairs.join(a, "_ha")
        .join(b, "_hb")
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "hamming",
        )
    )
    same = (
        a.join(
            b,
            (F.col("_ha") == F.col("_hb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", F.lit(0).cast("bigint").alias("hamming"))
    )
    pairs = cross.unionByName(same)
    if not materialize:
        return pairs  # lineage-open plan for dump_plans probes
    out = pairs.localCheckpoint(eager=True)
    base.unpersist()
    return out


def audio_near_duplicates(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_hamming: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, hamming): audio pairs within hamming ≤ 8 of the
    spectral fingerprint — re-encoded / re-leveled / upsampled copies
    of the same recording. 9 blocks × 7 bits (lossless to 8)."""
    fp = audio_fingerprints(assets, id_col, payload_col)
    return hamming63_pairs(
        fp, id_col, "afp", max_hamming,
        n_blocks=9, block_bits=7, materialize=materialize,
    )


_TEXTURED_CACHE: dict[tuple, list] = {}


def textured_test_audio(
    n: int, rate: int = 8000, ms: int = 512
) -> list:
    """n deterministic TEXTURED test clips as (clip_id, wav_bytes):
    eight seeded AM-modulated tones spread over the 220–3000 Hz band
    — the audio analog of `phash.textured_test_images` (the
    multimodal fixture clips are single sines: one hot band, 60+
    noise-driven bits). Separation measured over the first 32 ids:
    unrelated ≥ 16 bits, perturbed copies ≤ 8."""
    from inception_eventstore_spark.operators.multimodal import encode_wav

    cached = _TEXTURED_CACHE.get((n, rate, ms))
    if cached is not None:
        return cached
    out = []
    nsamp = rate * ms // 1000
    t = np.arange(nsamp) / rate
    for i in range(n):
        rng = np.random.default_rng(2000 + i)
        x = np.zeros(nsamp)
        for _ in range(8):
            f = rng.uniform(220, 3000)
            a = rng.uniform(0.05, 0.15)
            ph = rng.uniform(0, 2 * np.pi)
            fm = rng.uniform(1, 6)
            x += (
                a
                * np.sin(2 * np.pi * f * t + ph)
                * (0.6 + 0.4 * np.sin(2 * np.pi * fm * t + rng.uniform(0, 6)))
            )
        out.append(
            (i, encode_wav((np.clip(x, -1, 1) * 32767).astype(np.int16), rate))
        )
    _TEXTURED_CACHE[(n, rate, ms)] = out
    return out
