"""Audio fingerprint: determinism, volume/resample robustness,
banded-join losslessness, guards."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from inception_eventstore_spark.operators import audiofp as AF
from inception_eventstore_spark.operators import multimodal as MM


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _redo(payload, scale=1.0, target=None):
    x, rate = MM.decode_wav(payload)
    if target:
        n2 = int(round(len(x) * target / rate))
        x = np.interp(
            np.arange(n2) / target, np.arange(len(x)) / rate, x
        )
        rate = target
    return MM.encode_wav(
        (np.clip(x * scale, -1, 1) * 32767).astype(np.int16), rate
    )


class TestAudioFingerprint:
    def test_deterministic_63_bit(self):
        clips = AF.textured_test_audio(8)
        hs = [AF.audio_fingerprint63(p) for _, p in clips]
        assert hs == [AF.audio_fingerprint63(p) for _, p in clips]
        assert all(0 <= h < 1 << 63 for h in hs)

    def test_unrelated_clips_far(self):
        hs = [AF.audio_fingerprint63(p) for _, p in AF.textured_test_audio(16)]
        assert min(
            _ham(a, b) for a, b in itertools.combinations(hs, 2)
        ) > 8

    def test_perturbation_envelope(self):
        for i, p in AF.textured_test_audio(8):
            h = AF.audio_fingerprint63(p)
            assert _ham(h, AF.audio_fingerprint63(_redo(p, scale=0.5))) <= 8
            assert _ham(h, AF.audio_fingerprint63(_redo(p, target=16000))) <= 8

    def test_short_clip_raises(self):
        with pytest.raises(ValueError):
            AF.audio_fingerprint63(
                MM.encode_wav(np.zeros(4, dtype=np.int16), 8000)
            )


class TestAudioPairs:
    def _assets(self, spark, n=10):
        rows = []
        for i, p in AF.textured_test_audio(n):
            rows.append((i, bytearray(p)))
            rows.append((i + 1000, bytearray(_redo(p, scale=0.5))))
        return spark.createDataFrame(rows, "asset_id long, payload binary")

    def test_recovers_planted_pairs(self, spark):
        assets = self._assets(spark).coalesce(2)
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in AF.audio_near_duplicates(assets).collect()
        }
        assert set(got) == {(i, i + 1000) for i in range(10)}

    def test_banded_join_lossless(self, spark):
        assets = self._assets(spark, n=6).coalesce(2)
        hashes = {
            r["asset_id"]: r["afp"]
            for r in AF.audio_fingerprints(assets).collect()
        }
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(hashes), 2)
            if _ham(hashes[a], hashes[b]) <= 8
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in AF.audio_near_duplicates(assets).collect()
        }
        assert got == want

    def test_guards(self, spark):
        assets = self._assets(spark, n=2)
        with pytest.raises(ValueError):
            AF.audio_near_duplicates(assets, max_hamming=9)
        fp = AF.audio_fingerprints(assets)
        with pytest.raises(ValueError):
            AF.hamming63_pairs(fp, "asset_id", "afp", 3, n_blocks=4,
                               block_bits=9)
