"""Baseline JPEG codec: spec-component pins + lossy round trips.

No codec library exists in this container to cross-check against, so
correctness rests on two legs: (1) the spec-defined components are
pinned directly (zigzag order, canonical Huffman code construction,
magnitude/extend inversion, DCT orthonormality), and (2) encoder and
decoder — which share only those pinned components, not the pipeline
direction — must round-trip within JPEG's quantization error (PSNR
floors chosen well above what a systematic transform/entropy bug could
reach)."""

from __future__ import annotations

import numpy as np
import pytest

from inception_eventstore_spark.operators.jpeg import (
    _AC_CHROM,
    _AC_LUM,
    _C,
    _DC_CHROM,
    _DC_LUM,
    _ZZ,
    _canonical_codes,
    _extend,
    _magnitude,
    _split_entropy,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 4) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)


class TestSpecComponents:
    def test_zigzag_order_matches_spec_table(self):
        # ITU T.81 Figure 5 — first and last entries of the scan
        assert list(_ZZ[:16]) == [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        ]
        assert list(_ZZ[-8:]) == [53, 60, 61, 54, 47, 55, 62, 63]
        assert sorted(_ZZ) == list(range(64))

    def test_ac_tables_cover_all_162_symbols(self):
        want = {(r << 4) | s for r in range(16) for s in range(1, 11)}
        want |= {0x00, 0xF0}
        for bits, vals in (_AC_LUM, _AC_CHROM):
            assert sum(bits) == len(vals) == 162
            assert set(vals) == want

    def test_canonical_code_recurrence(self):
        # DC luminance (Annex K.3): BITS=[0,1,5,...] → category 0 gets
        # the single 2-bit code 00, categories 1-5 the 3-bit codes
        # 010..110, category 6 the 4-bit 1110, etc.
        codes = _canonical_codes(*_DC_LUM)
        assert codes[0] == (0b00, 2)
        assert codes[1] == (0b010, 3)
        assert codes[5] == (0b110, 3)
        assert codes[6] == (0b1110, 4)
        assert codes[11] == (0b111111110, 9)
        # prefix-free: no code is a prefix of a longer one
        all_codes = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(all_codes):
            for c2, l2 in all_codes[i + 1 :]:
                assert not (l2 > l1 and (c2 >> (l2 - l1)) == c1)

    def test_magnitude_extend_roundtrip(self):
        for v in list(range(-300, 301)) + [-1023, 1023, -2047, 2047]:
            size, extra = _magnitude(v)
            assert _extend(extra, size) == v, v
        assert _magnitude(0) == (0, 0)
        assert _magnitude(1) == (1, 1)
        assert _magnitude(-1) == (1, 0)

    def test_dct_matrix_orthonormal_and_matches_jpeg_fdct(self):
        assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
        # JPEG FDCT of a constant block: S(0,0) = 8·level, all AC = 0
        x = np.full((8, 8), 12.0)
        f = _C @ x @ _C.T
        assert f[0, 0] == pytest.approx(96.0)
        assert np.abs(f).sum() == pytest.approx(96.0)

    def test_split_entropy_destuffs_and_splits_on_rst(self):
        data = bytes([0x12, 0xFF, 0x00, 0x34]) + b"\xff\xd0" + bytes(
            [0x56]
        ) + b"\xff\xd9"
        segs, stop = _split_entropy(data, 0)
        assert segs == [bytes([0x12, 0xFF, 0x34]), bytes([0x56])]
        assert data[stop:] == b"\xff\xd9"


class TestRoundTrip:
    def test_444_high_quality_near_lossless(self):
        img = _gradient(40, 56)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        assert _psnr(dec, img) > 45

    def test_420_subsampled(self):
        img = _gradient(40, 56)
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert dec.shape == img.shape
        assert _psnr(dec, img) > 35

    def test_noise_q100_exercises_all_huffman_paths(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        assert _psnr(dec, img) > 40

    def test_odd_dimensions_crop_back(self):
        rng = np.random.default_rng(11)
        for shape in ((13, 21), (8, 8), (1, 1), (17, 32)):
            img = rng.integers(
                0, 256, size=(*shape, 3), dtype=np.uint8
            )
            for sub in (False, True):
                dec = decode_jpeg(
                    encode_jpeg(img, quality=95, subsample=sub)
                )
                assert dec.shape == img.shape, (shape, sub)

    def test_flat_color_compresses_tiny_and_exact(self):
        img = np.full((32, 32, 3), 77, dtype=np.uint8)
        payload = encode_jpeg(img, quality=85)
        assert len(payload) < 900  # EOB-only blocks
        dec = decode_jpeg(payload)
        assert int(np.abs(dec.astype(int) - 77).max()) <= 1

    def test_quality_monotone_in_size(self):
        img = _gradient(48, 48)
        sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]


class TestErrors:
    def test_not_jpeg_raises(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"P6 1 1 255 xxx")

    def test_progressive_raises_not_implemented(self):
        img = _gradient(16, 16)
        payload = bytearray(encode_jpeg(img))
        # rewrite the SOF0 marker (FFC0) to SOF2 (progressive)
        i = payload.find(b"\xff\xc0")
        payload[i + 1] = 0xC2
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))

    def test_truncated_entropy_raises(self):
        img = _gradient(32, 32)
        payload = encode_jpeg(img)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) // 2])

    def test_bad_pixel_shape_rejected(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((8, 8), dtype=np.uint8))


class TestRealDecodePath:
    def test_jpeg_assets_flow_through_extract_features(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators import multimodal as M

        df = M.synthetic_assets(spark, n=27)
        jp = df.where(F.col("mime") == "image/jpeg")
        assert jp.count() == 3
        feats = M.extract_features(jp, decode="real").collect()
        assert len(feats) == 3
        for r in feats:
            assert len(r["features"]) == 16
            assert all(np.isfinite(x) for x in r["features"])

    def test_jpeg_features_close_to_ppm_twin(self):
        # same pixel content through PPM (exact) and JPEG (lossy)
        # kernels must agree to within compression error
        from inception_eventstore_spark.operators import multimodal as M

        ppm = M._synthetic_image(6)
        pixels = M.decode_ppm(ppm)
        f_exact = M._image_features_real(ppm)
        f_jpeg = M._image_features_real(encode_jpeg(pixels, quality=95))
        assert np.abs(f_exact - f_jpeg).max() < 0.02
