"""Multimodal kernel scale smoke: Arrow decode/resize/frame-extract
throughput on a few thousand REAL binary assets (PPM/PNG/JPEG images,
PCM WAVs, AVI/MJPEG clips — the in-repo pure-numpy codecs).

The fixture is built driver-side once (numpy encodes), written to
parquet, and every kernel pass reads the on-disk table — so the
timings measure the mapInPandas pipelines, not fixture construction.

Usage: python tools/scale_smoke_multimodal.py [n_assets] [out_dir]
Prints one JSON line with per-kernel asset throughput.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="mm_smoke_")
    )

    from inception_eventstore_spark.operators import multimodal as MM
    from inception_eventstore_spark.session import get_spark

    spark = get_spark(
        "scale-smoke-multimodal",
        extra_configs={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    volumes: dict[str, int] = {}

    t0 = time.time()
    path = os.path.join(out_dir, "assets")
    MM.synthetic_assets(spark, n=n).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)
    timings["fixture_build_write"] = round(time.time() - t0, 3)
    assets = spark.read.parquet(path)
    volumes["assets"] = assets.count()

    decodable = assets.where(F.col("mime") != "video/mp4")
    t0 = time.time()
    volumes["real_features"] = MM.extract_features(
        decodable, decode="real"
    ).count()
    timings["extract_features_real"] = round(time.time() - t0, 3)

    t0 = time.time()
    volumes["resized"] = MM.resize_images(assets, 32, 24).count()
    timings["resize_images_32x24"] = round(time.time() - t0, 3)

    t0 = time.time()
    volumes["resampled"] = MM.resample_audio(assets, 4000).count()
    timings["resample_audio_4k"] = round(time.time() - t0, 3)

    avi = assets.where(F.col("mime") == "video/x-msvideo")
    t0 = time.time()
    frames = MM.sample_frames(avi, every_ms=250)
    volumes["sampled_frames"] = frames.count()
    timings["sample_frames"] = round(time.time() - t0, 3)

    # r6 perceptual dedup kernels over the same on-disk assets
    from inception_eventstore_spark.operators import audiofp as AFP
    from inception_eventstore_spark.operators import phash as PH

    images = assets.where(F.col("modality") == "image")
    t0 = time.time()
    volumes["image_phashes"] = PH.image_phashes(images).count()
    timings["image_phashes"] = round(time.time() - t0, 3)

    t0 = time.time()
    volumes["phash_pairs"] = PH.phash_near_duplicates(images).count()
    timings["phash_near_duplicates"] = round(time.time() - t0, 3)

    audio = assets.where(F.col("modality") == "audio")
    t0 = time.time()
    volumes["audio_fps"] = AFP.audio_fingerprints(audio).count()
    timings["audio_fingerprints"] = round(time.time() - t0, 3)

    t0 = time.time()
    volumes["video_pairs"] = PH.video_near_duplicates(avi).count()
    timings["video_near_duplicates"] = round(time.time() - t0, 3)

    # ingest-time visual dedup: build the persisted index over the
    # image corpus, then probe the SAME images (every probe row should
    # match at least itself at hamming 0) — probe cost is the bucket
    # join, no corpus re-decode
    from inception_eventstore_spark.operators.phash_index import (
        PhashImageIndex,
    )

    t0 = time.time()
    pix = PhashImageIndex.build(images, os.path.join(out_dir, "pix"))
    timings["phash_index_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    volumes["index_probe_hits"] = pix.query(images).count()
    timings["phash_index_probe"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "n_assets": n,
                "volumes": volumes,
                "timings": timings,
                "assets_per_sec_real_decode": round(
                    volumes["real_features"]
                    / max(timings["extract_features_real"], 1e-9),
                    1,
                ),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
