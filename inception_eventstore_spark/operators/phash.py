"""Perceptual image hashing (pHash) + near-duplicate image pairs.

Image-level dedup for a multimodal training corpus: the text dedup
family (MinHash/SimHash, `operators/dedup.py`) finds byte- or
token-level copies, but re-encoded / resized / slightly-filtered
images share NO bytes — the standard tool is the DCT perceptual hash
(pHash): decode → grayscale → bilinear-resize to 32×32 → 2-D DCT-II →
keep the top-left 8×8 low-frequency block → threshold the 63 AC
coefficients at their median → a 63-bit fingerprint whose hamming
distance tracks visual similarity. 63 bits (not 64) on purpose: the
fingerprint stays inside a signed BIGINT on every engine, and 63
splits exactly into 7 blocks of 9 bits for the pigeonhole bucket join.

Everything reuses in-repo parts: container sniff + pixel decode from
`operators/multimodal` (PPM/PNG/JPEG, pure numpy), `bilinear_resize`
(the pixel-center convention the resize oracle pins), and the
orthonormal 8-point DCT convention of `operators/jpeg`. The hash runs
as ONE Arrow-batched `mapInPandas` kernel per partition — decode is
the cost, the DCT of a 32×32 plane is two 32×32 matmuls.

Pair finding mirrors `simhash_near_duplicates`' block-permutation
trick, sized for images: split the 63-bit hash into 7 blocks of
9 bits; any pair within hamming ≤ 6 shares at least one exact block
(pigeonhole), so a bucket equi-join on (block_idx, block_value) +
`bit_count(xor)` verify returns EXACTLY the hamming ball — never an
all-pairs join. At 100 TB of images the join fan-out is bounded by
the bucket sizes; genuinely hot buckets (flat/black images) should be
frequency-capped upstream like every pair query here (CLAUDE.md).

Reference scope note: the reference engine stores payloads as opaque
blobs (SURVEY §1.2) — this module is part of the mandated
LLM-pipeline extension surface, not a port.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.multimodal import (
    _decode_image,
    bilinear_resize,
)

#: pHash geometry: resize target and retained low-frequency block.
_RESIZE = 32
_BLOCK = 8
_BITS = _BLOCK * _BLOCK - 1  # 63: AC coefficients only, BIGINT-safe
_N_BLOCKS = 7
_BLOCK_BITS = 9  # 7 × 9 = 63 exactly


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II matrix (same convention as
    operators/jpeg._dct_matrix, generalized to n): F = C·X·Cᵀ."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    C = np.sqrt(2.0 / n) * np.cos((2 * x + 1) * k * np.pi / (2 * n))
    C[0] = np.sqrt(1.0 / n)
    return C


_C32 = _dct_matrix(_RESIZE)


def phash63(payload: bytes) -> int:
    """63-bit perceptual hash of one encoded image (PPM/PNG/JPEG).

    Bit b (0 = least significant) is 1 iff AC coefficient number b+1
    in row-major order of the top-left 8×8 DCT block exceeds the
    median of all 63 AC coefficients. Median of an odd count is an
    element of the set, so exactly 31 bits are 1 — every hash has
    fixed weight, which also makes the expected hamming distance of
    unrelated images concentrate (~31.5)."""
    img = _decode_image(payload).astype(np.float64)
    lum = img.mean(axis=2)  # same grayscale as _image_features_real
    small = bilinear_resize(lum[:, :, None], _RESIZE, _RESIZE)[:, :, 0]
    coeffs = _C32 @ small @ _C32.T
    ac = coeffs[:_BLOCK, :_BLOCK].reshape(-1)[1:]
    med = float(np.median(ac))
    bits = ac > med
    h = 0
    for b in range(_BITS):
        if bits[b]:
            h |= 1 << b
    return h


def image_phashes(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash): the 63-bit pHash of every image asset, one Arrow
    kernel per partition. Callers filter to image rows first (the
    kernel raises on non-image containers — silent skips would hide
    corrupt data). Coalesce tiny inputs upstream (CLAUDE.md: one cold
    python worker per partition)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "phash": [phash63(p) for p in pdf[payload_col]],
                }
            )

    out = assets.select(id_col, payload_col).mapInPandas(
        kernel, schema=f"_id {assets.schema[id_col].dataType.simpleString()}, phash long"
    )
    return out.select(F.col("_id").alias(id_col), "phash")


def phash_near_duplicates(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, hamming): image pairs with hamming(pHash) ≤
    ``max_hamming`` — visually near-duplicate candidates. Lossless for
    max_hamming ≤ 6 (7 blocks, pigeonhole): the result is EXACTLY the
    hamming ball over the hash set, which is what lets the declared
    query hash-match a DuckDB all-pairs replay of the same literal
    hashes. Bucket join + bit_count verify, mirroring
    simhash_near_duplicates."""
    from inception_eventstore_spark.operators.audiofp import hamming63_pairs

    fp = image_phashes(assets, id_col, payload_col)
    return hamming63_pairs(
        fp, id_col, "phash", max_hamming,
        n_blocks=_N_BLOCKS, block_bits=_BLOCK_BITS, materialize=materialize,
    )


# ---------------------------------------------------------------------
# Textured fixture images
# ---------------------------------------------------------------------
_TEXTURED_CACHE: dict[tuple, list] = {}


def textured_test_images(n: int, h: int = 48, w: int = 64) -> list:
    """n deterministic TEXTURED test images as (image_id, png_bytes).

    The multimodal fixture family (`multimodal._synthetic_image`) is
    near-linear gradients — spectrally so simple that 60 of the 63
    pHash AC coefficients sit at ~0 and the median threshold digitizes
    noise (measured: ±1 pixel noise flipped up to 32/63 bits). pHash
    needs images with energy spread across the low-frequency block, so
    this fixture sums five seeded sinusoidal plaids per channel:
    unrelated ids land at hamming ~31 (min 16 over the first 32 ids),
    while JPEG-85 re-encodes and ±2 pixel noise stay within hamming 2
    — the separation the near-dup query and its oracle pin."""
    from inception_eventstore_spark.operators.multimodal import encode_png

    cached = _TEXTURED_CACHE.get((n, h, w))
    if cached is not None:
        return cached
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    out = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        img = np.zeros((h, w, 3))
        for c in range(3):
            acc = np.full((h, w), 128.0)
            for _ in range(5):
                fx = rng.uniform(0.5, 5.0)
                fy = rng.uniform(0.5, 5.0)
                ph = rng.uniform(0, 2 * np.pi)
                amp = rng.uniform(15, 40)
                acc += amp * np.sin(
                    2 * np.pi * (fx * xs / w + fy * ys / h) + ph
                )
            img[:, :, c] = acc
        px = np.clip(np.round(img), 0, 255).astype(np.uint8)
        out.append((i, encode_png(px)))
    _TEXTURED_CACHE[(n, h, w)] = out
    return out


# ---------------------------------------------------------------------
# Video near-dup via frame pHashes
# ---------------------------------------------------------------------
def video_frame_phashes(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, frame_idx, phash): pHash of every frame of every AVI/MJPEG
    video — frame EXTRACTION is RIFF chunk slicing (no pixel work);
    the decode cost is per extracted frame inside the same Arrow
    kernel. Non-AVI payloads raise (MP4 needs an external codec),
    matching the extract_features contract."""
    from inception_eventstore_spark.operators.avi import (
        extract_mjpeg_frames,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"_id": [], "frame_idx": [], "phash": []}
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                for idx, jpeg in enumerate(
                    extract_mjpeg_frames(bytes(payload))
                ):
                    out["_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["phash"].append(phash63(jpeg))
            yield pd.DataFrame(out)

    id_type = assets.schema[id_col].dataType.simpleString()
    out = assets.select(id_col, payload_col).mapInPandas(
        kernel, schema=f"_id {id_type}, frame_idx int, phash long"
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        "phash",
    )


def video_near_duplicates(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    min_coverage: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, n_matched_a, n_matched_b, coverage): video pairs
    where ≥ ``min_coverage`` of BOTH videos' frames visually match a
    frame of the other (frame pHashes within ``max_hamming``) — the
    video leg of multimodal dedup: re-encoded (e.g. different JPEG
    quality) copies match frame-for-frame (measured ≤ 2 bits at
    q85→q70) while unrelated textured frames sit ≥ 20 apart.

    Frame matching is the SAME banded pigeonhole join as the image
    path (7 × 9-bit blocks, lossless to hamming 6) over (video,
    frame) rows — never an all-pairs frame join; per-video frame
    counts are a tiny aggregate joined back. coverage = round(min
    coverage of the two sides, 6): frame counts are small integers,
    so the ratio never terminates at a 6-dp half boundary."""
    fp = video_frame_phashes(assets, id_col, payload_col).select(
        F.col(id_col).alias("_vid"), "frame_idx", "phash"
    )
    fp = fp.persist()
    nframes = fp.groupBy("_vid").agg(F.count("*").alias("_nf"))
    mask = (1 << _BLOCK_BITS) - 1
    blocks = fp.select(
        "_vid",
        "frame_idx",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("phash"), b * _BLOCK_BITS)
                    .bitwiseAND(F.lit(mask))
                    for b in range(_N_BLOCKS)
                ]
            )
        ).alias("_blk", "_bv"),
    )
    left = blocks.select(
        "_blk", "_bv", F.col("_vid").alias("id_a"),
        F.col("frame_idx").alias("_fa"), F.col("phash").alias("_ha"),
    )
    right = blocks.select(
        "_blk", "_bv", F.col("_vid").alias("id_b"),
        F.col("frame_idx").alias("_fb"), F.col("phash").alias("_hb"),
    )
    fpairs = (
        left.join(right, ["_blk", "_bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "_fa", "_ha", "id_b", "_fb", "_hb")
        .dropDuplicates(["id_a", "_fa", "id_b", "_fb"])
        .where(
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
            <= int(max_hamming)
        )
    )
    agg = fpairs.groupBy("id_a", "id_b").agg(
        F.countDistinct("_fa").alias("n_matched_a"),
        F.countDistinct("_fb").alias("n_matched_b"),
    )
    na = nframes.select(
        F.col("_vid").alias("id_a"), F.col("_nf").alias("_na")
    )
    nb = nframes.select(
        F.col("_vid").alias("id_b"), F.col("_nf").alias("_nb")
    )
    cov = F.least(
        F.col("n_matched_a").cast("double") / F.col("_na"),
        F.col("n_matched_b").cast("double") / F.col("_nb"),
    )
    pairs = (
        agg.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .withColumn("coverage", F.round(cov, 6))
        .where(F.col("coverage") >= float(min_coverage))
        .select(
            "id_a", "id_b",
            F.col("n_matched_a").cast("bigint").alias("n_matched_a"),
            F.col("n_matched_b").cast("bigint").alias("n_matched_b"),
            "coverage",
        )
    )
    if not materialize:
        return pairs
    out = pairs.localCheckpoint(eager=True)
    fp.unpersist()
    return out


def textured_test_videos(
    n: int, n_frames: int = 4, quality: int = 85
) -> list:
    """n deterministic textured AVI/MJPEG clips as (video_id,
    avi_bytes); clip v's frames are textured images n_frames·v ..
    n_frames·v+n_frames−1, so frames are distinct across and within
    clips (cross-frame pHash min 20 measured)."""
    from inception_eventstore_spark.operators.avi import encode_avi_mjpeg
    from inception_eventstore_spark.operators.multimodal import (
        _decode_image,
    )

    cached = _TEXTURED_CACHE.get(("video", n, n_frames, quality))
    if cached is not None:
        return cached
    imgs = textured_test_images(n * n_frames)
    out = []
    for v in range(n):
        frames = [
            _decode_image(imgs[v * n_frames + f][1])
            for f in range(n_frames)
        ]
        out.append((v, encode_avi_mjpeg(frames, fps=4, quality=quality)))
    _TEXTURED_CACHE[("video", n, n_frames, quality)] = out
    return out
