"""Multimodal (image/audio/video) columns as opaque binaries + typed
metadata, with Arrow-batched Pandas-UDF plumbing for decode/feature
steps (SURVEY §2 F extensions).

The container has no image/audio codecs, so the decode kernels are
STUBBED: ``decode=\"fake\"`` produces deterministic synthetic features
(so the full Spark plumbing — schema, batching, partitioning — is real
and testable) and ``decode=\"real\"`` raises NotImplementedError at the
point where PIL/librosa/ffmpeg would be called. Swapping in a real
kernel changes only the per-batch pandas function, nothing in the plan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Envelope for a multimodal asset: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decode+embed kernel: bucket byte
    histogram folded to _FEATURE_DIM dims, L2-normalized."""
    if payload is None or len(payload) == 0:
        return np.zeros(_FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n > 0 else hist


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode + feature-extract each asset via ``mapInPandas`` (Arrow
    batches; one python worker per partition, vectorized within batch).

    Partitioning note for 100 TB: repartition upstream by size so each
    Arrow batch holds a bounded payload volume
    (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows; large
    binaries argue for smaller caps).
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real decode needs PIL/librosa/ffmpeg — not in this "
                    "container; use decode='fake' for the plumbing path"
                )
            feats = [
                _fake_features(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        0 if p is None else len(p) for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return assets.mapInPandas(kernel, schema=_FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to extract
    (asset_id, frame_idx, offset_ms) — pure column math (sequence over
    duration), ready to feed a decode kernel. Videos only."""
    return (
        assets.where(F.col("modality") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "asset_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)
                    ),
                )
            ).alias("frame_idx", "_step"),
        )
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("offset_ms"),
        )
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: n assets across modalities with payloads
    derived from the id (no external data needed). Built as a pandas
    frame so createDataFrame takes the Arrow path — one batch transfer
    instead of per-row pickling (~2× faster even at n=256)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        rows.append(
            {
                "asset_id": i,
                "modality": modality,
                "mime": {
                    "image": "image/png",
                    "audio": "audio/wav",
                    "video": "video/mp4",
                }[modality],
                "width": 64 if modality == "image" else None,
                "height": 48 if modality == "image" else None,
                "duration_ms": 5000 + i * 100 if modality != "image" else None,
                "payload": bytes((i * 7 + j) % 256 for j in range(128 + i)),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=ASSET_SCHEMA)
