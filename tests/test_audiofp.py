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


class TestHardNegatives:
    def test_masks_same_label_and_ranks(self, spark):
        import numpy as np

        from inception_eventstore_spark.operators.similarity import (
            hard_negatives,
        )

        rng = np.random.default_rng(3)
        rows = []
        for i in range(40):
            v = rng.normal(size=8)
            rows.append((i, [float(x) for x in v], i % 4))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        anchors = [(0, rows[0][1], 0), (1, rows[1][1], 1)]
        got = hard_negatives(emb, anchors, k=3).collect()
        by_anchor = {}
        for r in got:
            by_anchor.setdefault(r["anchor_id"], []).append(r)
        lab = {i: i % 4 for i in range(40)}
        for aid, rs in by_anchor.items():
            assert len(rs) == 3
            assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == [1, 2, 3]
            for r in rs:
                assert lab[r["vec_id"]] != lab[aid]
        # brute-force agreement for anchor 0 (float32 storage: compare
        # against the same float32-rounded vectors the kernel reads)
        stored = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb.collect()}
        a = stored[0] / np.linalg.norm(stored[0])
        sims = sorted(
            ((float(stored[i] @ a / np.linalg.norm(stored[i])), i)
             for i in range(40) if lab[i] != 0),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got0 = [r["vec_id"] for r in sorted(by_anchor[0], key=lambda r: r["rank"])]
        assert got0 == [i for _, i in sims]


class TestTokenFertilityMatryoshka:
    def test_fertility_values(self, spark):
        from inception_eventstore_spark.operators.tokenstats import (
            token_fertility,
        )

        docs = spark.createDataFrame(
            [
                (1, "en", "hello world"),          # 2 words, 2 subwords
                (2, "en", "internationalization"),  # 1 word, 5 subwords
                (3, "de", "abc def"),
            ],
            "doc_id long, lang string, text string",
        )
        out = {r["lang"]: r for r in token_fertility(docs).collect()}
        en = out["en"]
        assert en["n_docs"] == 2 and en["n_words"] == 3
        # ceil(5/4)+ceil(5/4) = 4 for "hello world", ceil(20/4) = 5
        assert en["n_subwords"] == 4 + 5
        assert en["n_bytes"] == len(b"hello world") + len(
            b"internationalization"
        )
        assert abs(en["subwords_per_word"] - round(9 / 3, 6)) < 1e-9

    def test_matryoshka_monotone_and_full(self, spark):
        import numpy as np

        from inception_eventstore_spark.operators.matryoshka import (
            prefix_topk_overlap,
        )

        rng = np.random.default_rng(11)
        rows = [
            (i, [float(x) for x in rng.normal(size=16)]) for i in range(200)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = rows[0][1]
        out = {
            r["dims"]: r["overlap"]
            for r in prefix_topk_overlap(
                emb.where("vec_id != 0"), q, dims=(4, 16), k=10
            ).collect()
        }
        assert out[16] == 1.0  # full prefix == full scan
        assert 0.0 <= out[4] <= 1.0
        with pytest.raises(ValueError):
            prefix_topk_overlap(emb, q, dims=(32,))


class TestKAnonymity:
    def _df(self, spark):
        rows = [(i, "A", "x") for i in range(6)]       # class of 6: safe
        rows += [(10 + i, "B", "x") for i in range(3)]  # class of 3: risk
        rows += [(20, "C", None)]                       # null class of 1
        return spark.createDataFrame(rows, "id long, q1 string, q2 string")

    def test_report(self, spark):
        from inception_eventstore_spark.operators.pii import (
            k_anonymity_report,
        )

        r = k_anonymity_report(self._df(spark), ["q1", "q2"], k=5).first()
        assert r["k_anonymity"] == 1
        assert r["n_groups"] == 3
        assert r["n_violating_groups"] == 2
        assert r["rows_at_risk"] == 4
        assert r["n_rows"] == 10

    def test_suppress(self, spark):
        from inception_eventstore_spark.operators.pii import suppress_to_k

        kept = suppress_to_k(self._df(spark), ["q1", "q2"], k=5)
        assert sorted(r["id"] for r in kept.collect()) == list(range(6))
        with pytest.raises(ValueError):
            suppress_to_k(self._df(spark), [], k=5)
