"""Persisted pHash image index: probe precision, load round-trip,
append visibility, dedup-at-ingest."""

from __future__ import annotations

import pytest

from inception_eventstore_spark.operators import multimodal as MM
from inception_eventstore_spark.operators import phash as PH
from inception_eventstore_spark.operators.phash_index import PhashImageIndex


def _corpus(spark, n=10):
    rows = [(i, bytearray(p)) for i, p in PH.textured_test_images(n)]
    return spark.createDataFrame(rows, "asset_id long, payload binary")


def _jpeg_copies(spark, ids, offset=1000):
    from inception_eventstore_spark.operators.jpeg import encode_jpeg

    imgs = PH.textured_test_images(max(ids) + 1)
    rows = [
        (i + offset,
         bytearray(encode_jpeg(MM._decode_image(imgs[i][1]), quality=85)))
        for i in ids
    ]
    return spark.createDataFrame(rows, "asset_id long, payload binary")


class TestPhashImageIndex:
    def test_probe_finds_reencodes_only(self, spark, tmp_path):
        idx = PhashImageIndex.build(_corpus(spark, 10), str(tmp_path / "ix"))
        probe = _jpeg_copies(spark, [2, 5])
        got = {
            (r["query_id"], r["match_id"]): r["hamming"]
            for r in idx.query(probe).collect()
        }
        assert set(got) == {(1002, 2), (1005, 5)}
        assert all(h <= 6 for h in got.values())

    def test_load_roundtrip_and_append(self, spark, tmp_path):
        path = str(tmp_path / "ix")
        PhashImageIndex.build(_corpus(spark, 6), path)
        idx = PhashImageIndex.load(spark, path)
        late = _corpus(spark, 8).where("asset_id >= 6")
        # not indexed yet: a re-encode of image 7 matches nothing
        assert not idx.query(_jpeg_copies(spark, [7])).collect()
        idx.append(late)
        got = idx.query(_jpeg_copies(spark, [7])).collect()
        assert {(r["query_id"], r["match_id"]) for r in got} == {(1007, 7)}

    def test_append_unique(self, spark, tmp_path):
        idx = PhashImageIndex.build(_corpus(spark, 6), str(tmp_path / "ix"))
        batch = _jpeg_copies(spark, [1, 3]).unionByName(
            _corpus(spark, 8).where("asset_id >= 6")
        )
        unique = idx.append_unique(batch)
        assert sorted(r["asset_id"] for r in unique.collect()) == [6, 7]
        # the appended originals are now probe-visible; the dup copies
        # were never indexed
        hits = idx.query(_jpeg_copies(spark, [6])).collect()
        assert {(r["query_id"], r["match_id"]) for r in hits} == {(1006, 6)}
        assert not idx.query(
            _jpeg_copies(spark, [1], offset=5000)
        ).where("match_id >= 1000").collect()

    def test_guard(self, spark, tmp_path):
        idx = PhashImageIndex.build(_corpus(spark, 2), str(tmp_path / "ix"))
        with pytest.raises(ValueError):
            idx.query(_corpus(spark, 2), max_hamming=7)


class TestAudioFingerprintIndex:
    def test_probe_and_append_unique(self, spark, tmp_path):
        import numpy as np

        from inception_eventstore_spark.operators import audiofp as AF
        from inception_eventstore_spark.operators.phash_index import (
            AudioFingerprintIndex,
        )

        clips = AF.textured_test_audio(8)
        corpus = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in clips[:6]],
            "asset_id long, payload binary",
        )
        idx = AudioFingerprintIndex.build(corpus, str(tmp_path / "aix"))

        def relevel(p, s=0.5):
            x, rate = MM.decode_wav(p)
            return bytearray(MM.encode_wav(
                (np.clip(np.asarray(x) * s, -1, 1) * 32767).astype(np.int16),
                rate,
            ))

        probe = spark.createDataFrame(
            [(1002, relevel(clips[2][1])), (1007, bytearray(clips[7][1]))],
            "asset_id long, payload binary",
        )
        got = {
            (r["query_id"], r["match_id"])
            for r in idx.query(probe, max_hamming=8).collect()
        }
        assert got == {(1002, 2)}
        kept = idx.append_unique(probe, max_hamming=8)
        assert [r["asset_id"] for r in kept.collect()] == [1007]
        # geometry round-trips through the meta sidecar
        re = AudioFingerprintIndex.load(spark, str(tmp_path / "aix"))
        assert re.meta.n_blocks == 9 and re.meta.block_bits == 7
