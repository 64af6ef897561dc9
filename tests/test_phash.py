"""pHash image near-dup: hash determinism, container invariance,
pigeonhole losslessness of the banded join, guard."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from inception_eventstore_spark.operators import multimodal as MM
from inception_eventstore_spark.operators import phash as PH


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class TestPhash63:
    def test_deterministic_and_63_bit(self):
        imgs = PH.textured_test_images(8)
        hs = [PH.phash63(p) for _, p in imgs]
        assert hs == [PH.phash63(p) for _, p in imgs]
        for h in hs:
            assert 0 <= h < 1 << 63
            # median split: exactly 31 of 63 bits set
            assert bin(h).count("1") == 31

    def test_container_invariance_jpeg(self):
        from inception_eventstore_spark.operators.jpeg import encode_jpeg

        for i, p in PH.textured_test_images(8):
            px = MM._decode_image(p)
            hj = PH.phash63(encode_jpeg(px, quality=85))
            assert _ham(PH.phash63(p), hj) <= 6, f"img {i}"

    def test_unrelated_images_far(self):
        hs = [PH.phash63(p) for _, p in PH.textured_test_images(16)]
        dists = [_ham(a, b) for a, b in itertools.combinations(hs, 2)]
        assert min(dists) > 6

    def test_noise_robust(self):
        rng = np.random.default_rng(7)
        for i, p in PH.textured_test_images(6):
            px = MM._decode_image(p).astype(np.int16)
            pert = np.clip(
                px + rng.integers(-2, 3, size=px.shape), 0, 255
            ).astype(np.uint8)
            assert _ham(PH.phash63(p), PH.phash63(MM.encode_png(pert))) <= 6


class TestPhashPairs:
    def _assets(self, spark, n=12):
        from inception_eventstore_spark.operators.jpeg import encode_jpeg

        rows = []
        for i, p in PH.textured_test_images(n):
            rows.append((i, bytearray(p)))
            # planted near-dup: JPEG-85 re-encode at id + 1000
            px = MM._decode_image(p)
            rows.append((i + 1000, bytearray(encode_jpeg(px, quality=85))))
        return spark.createDataFrame(rows, "asset_id long, payload binary")

    def test_recovers_planted_pairs_exactly(self, spark):
        assets = self._assets(spark).coalesce(2)
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in PH.phash_near_duplicates(assets, max_hamming=6).collect()
        }
        assert set(got) == {(i, i + 1000) for i in range(12)}
        assert all(h <= 6 for h in got.values())

    def test_banded_join_is_lossless(self, spark):
        # the bucket join must return EXACTLY the hamming ball that a
        # brute-force over the same hashes yields (pigeonhole, t <= 6)
        assets = self._assets(spark, n=8).coalesce(2)
        hashes = {
            r["asset_id"]: r["phash"]
            for r in PH.image_phashes(assets).collect()
        }
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(hashes), 2)
            if _ham(hashes[a], hashes[b]) <= 6
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in PH.phash_near_duplicates(assets, max_hamming=6).collect()
        }
        assert got == want

    def test_max_hamming_guard(self, spark):
        assets = self._assets(spark, n=2)
        with pytest.raises(ValueError):
            PH.phash_near_duplicates(assets, max_hamming=7)


class TestVideoNearDup:
    def _assets(self, spark, n=4):
        from inception_eventstore_spark.operators.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        rows = []
        for v, avi in PH.textured_test_videos(n):
            rows.append((v, bytearray(avi)))
            frames, fps = decode_avi_mjpeg(avi)
            rows.append(
                (v + 1000,
                 bytearray(encode_avi_mjpeg(frames, fps=4, quality=70)))
            )
        return spark.createDataFrame(rows, "asset_id long, payload binary")

    def test_recovers_reencoded_clips(self, spark):
        assets = self._assets(spark).coalesce(2)
        got = {
            (r["id_a"], r["id_b"]): r["coverage"]
            for r in PH.video_near_duplicates(assets).collect()
        }
        assert set(got) == {(v, v + 1000) for v in range(4)}
        assert all(c == 1.0 for c in got.values())

    def test_frame_hashes_shape(self, spark):
        assets = self._assets(spark, n=2).coalesce(1)
        rows = PH.video_frame_phashes(assets).collect()
        per_vid = {}
        for r in rows:
            per_vid.setdefault(r["asset_id"], []).append(r["frame_idx"])
        assert all(sorted(v) == list(range(4)) for v in per_vid.values())

    def test_coverage_threshold(self, spark):
        from inception_eventstore_spark.operators.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        # clip 0 and a HALF-overlapping clip (2 shared, 2 new frames)
        (v0, avi0), (v1, avi1) = PH.textured_test_videos(2)
        f0, _ = decode_avi_mjpeg(avi0)
        f1, _ = decode_avi_mjpeg(avi1)
        mixed = encode_avi_mjpeg(f0[2:] + f1[:2], fps=4, quality=85)
        assets = spark.createDataFrame(
            [(0, bytearray(avi0)), (5, bytearray(mixed))],
            "asset_id long, payload binary",
        )
        half = PH.video_near_duplicates(assets, min_coverage=0.5).collect()
        assert len(half) == 1 and half[0]["coverage"] == 0.5
        assert not PH.video_near_duplicates(
            assets, min_coverage=0.6
        ).collect()


class TestDuplicateFlood:
    def test_identical_hash_flood(self, spark):
        # 20 byte-identical copies + 2 distinct images: the banded join
        # runs over DISTINCT hashes (3 rows), same-hash pairs come from
        # the equi expansion — exact pair report either way
        imgs = PH.textured_test_images(3)
        rows = [(100 + j, bytearray(imgs[0][1])) for j in range(20)]
        rows += [(1, bytearray(imgs[1][1])), (2, bytearray(imgs[2][1]))]
        assets = spark.createDataFrame(
            rows, "asset_id long, payload binary"
        ).coalesce(2)
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in PH.phash_near_duplicates(assets, max_hamming=6).collect()
        }
        want = {
            (100 + i, 100 + j)
            for i in range(20)
            for j in range(i + 1, 20)
        }
        assert set(got) == want
        assert all(h == 0 for h in got.values())
