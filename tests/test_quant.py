"""Quantization codec tests.

Mirrors the reference's quantization round-trip and property tests
(``bitnet-quantization/src/{property_tests,property_based_tests}.rs``,
``i2s_qk256.rs`` inline tests).
"""

import numpy as np
import pytest

from bitnet_tpu.errors import QuantizationError
from bitnet_tpu.quant import (
    LUT_SYM,
    I2SFlavor,
    detect_i2s_flavor,
    dequantize_bitnet32,
    dequantize_iq2s,
    dequantize_qk256,
    dequantize_split32,
    dequantize_tl1,
    dequantize_tl2,
    gemv_qk256,
    quantize_activations_int8,
    dequantize_activations_int8,
    quantize_bitnet32,
    quantize_iq2s,
    quantize_qk256,
    quantize_split32,
    quantize_tl1,
    quantize_tl2,
)
from bitnet_tpu.quant.ternary import (
    pack_codes_lsb_first,
    unpack_codes_lsb_first,
)


class TestPacking:
    def test_pack_unpack_roundtrip(self, rng):
        codes = rng.integers(0, 4, size=1024).astype(np.uint8)
        packed = pack_codes_lsb_first(codes)
        assert packed.size == 256
        out = unpack_codes_lsb_first(packed)
        np.testing.assert_array_equal(codes, out)

    def test_lsb_first_order(self):
        # byte = c0 | c1<<2 | c2<<4 | c3<<6  (i2s_qk256.rs docstring)
        codes = np.array([1, 2, 3, 0], dtype=np.uint8)
        packed = pack_codes_lsb_first(codes)
        assert packed[0] == 1 | (2 << 2) | (3 << 4)

    def test_unpack_truncation(self):
        packed = np.array([0b11100100], dtype=np.uint8)
        out = unpack_codes_lsb_first(packed, n=3)
        np.testing.assert_array_equal(out, [0, 1, 2])


class TestBitNet32:
    def test_roundtrip_exact_on_lut_values(self, rng):
        # values that are exactly representable: scale * {-2,-1,1,2}
        scale = 0.7
        codes = rng.integers(0, 4, size=320)
        vals = (LUT_SYM[codes] * scale).astype(np.float32)
        payload = quantize_bitnet32(vals)
        out = dequantize_bitnet32(payload, vals.size)
        np.testing.assert_allclose(out, vals, rtol=1e-2)

    def test_block_layout_size(self):
        x = np.ones(100, dtype=np.float32)
        payload = quantize_bitnet32(x)
        # ceil(100/32)=4 blocks * 10 bytes
        assert len(payload) == 40

    def test_dequant_magnitude_bounded(self, rng):
        x = rng.standard_normal(4096).astype(np.float32)
        payload = quantize_bitnet32(x)
        out = dequantize_bitnet32(payload, x.size)
        # dequantized values bounded by 2*scale <= absmax (per block)
        assert np.abs(out).max() <= np.abs(x).max() * 1.01 + 1e-3

    def test_truncated_payload_raises(self):
        with pytest.raises(QuantizationError):
            dequantize_bitnet32(b"\x00" * 9, 32)

    def test_scale_robustness_clamped(self):
        # corrupt f16 scale (huge) must be clamped to the 1e3 envelope
        packed = np.zeros(10, dtype=np.uint8)
        packed[8:10] = np.array([0x00, 0x7b], dtype=np.uint8)  # f16 ~ 57344
        out = dequantize_bitnet32(packed.tobytes(), 32)
        assert np.abs(out).max() <= 2e3


class TestSplit32:
    def test_roundtrip(self, rng):
        scale = 1.3
        codes = rng.integers(0, 4, size=256)
        vals = (LUT_SYM[codes] * scale).astype(np.float32)
        payload, scales = quantize_split32(vals)
        out = dequantize_split32(payload, vals.size, scales)
        np.testing.assert_allclose(out, vals, rtol=1e-5)

    def test_no_scales_defaults_to_lut(self):
        codes = np.array([0, 1, 2, 3] * 8, dtype=np.uint8)
        payload = pack_codes_lsb_first(codes).tobytes()
        out = dequantize_split32(payload, 32)
        np.testing.assert_array_equal(out[:4], LUT_SYM[[0, 1, 2, 3]])

    def test_scalar_scale(self):
        codes = np.array([2] * 32, dtype=np.uint8)
        payload = pack_codes_lsb_first(codes).tobytes()
        out = dequantize_split32(payload, 32, np.array([0.5]))
        np.testing.assert_allclose(out, 0.5)


class TestQK256:
    def test_roundtrip_on_lut_values(self, rng):
        rows, cols = 4, 512
        codes = rng.integers(0, 4, size=(rows, cols))
        vals = LUT_SYM[codes].astype(np.float32)
        payload = quantize_qk256(vals)
        assert len(payload) == rows * (cols // 256) * 64
        out = dequantize_qk256(payload, rows, cols)
        np.testing.assert_array_equal(out, vals)

    def test_row_padding(self):
        # cols not a multiple of 256: rows padded independently
        rows, cols = 3, 300
        vals = np.full((rows, cols), 1.0, dtype=np.float32)
        payload = quantize_qk256(vals)
        assert len(payload) == rows * 2 * 64  # ceil(300/256)=2 blocks/row
        out = dequantize_qk256(payload, rows, cols)
        np.testing.assert_array_equal(out, vals)

    def test_gemv_matches_dense(self, rng):
        rows, cols = 8, 256
        codes = rng.integers(0, 4, size=(rows, cols))
        w = LUT_SYM[codes].astype(np.float32)
        payload = quantize_qk256(w)
        x = rng.standard_normal(cols).astype(np.float32)
        y = gemv_qk256(payload, x, rows, cols)
        np.testing.assert_allclose(y, w @ x, rtol=1e-5)

    def test_size_mismatch_raises(self):
        with pytest.raises(QuantizationError):
            dequantize_qk256(b"\x00" * 10, 16, 256)


class TestIQ2S:
    def test_roundtrip(self, rng):
        x = rng.standard_normal(512).astype(np.float32)
        payload = quantize_iq2s(x)
        assert len(payload) == 2 * 82
        out = dequantize_iq2s(payload, x.size)
        # 2-bit quantization: crude, but max error bounded by d
        blocked = x.reshape(2, 256)
        d = np.abs(blocked).max(axis=1) / 2
        err = np.abs(out.reshape(2, 256) - blocked)
        assert (err <= d[:, None] * 1.01 + 1e-6).all()

    def test_exact_on_representable(self, rng):
        d = 0.25
        codes = rng.integers(0, 4, size=256)
        vals = (LUT_SYM[codes] * d).astype(np.float32)
        payload = quantize_iq2s(vals)
        out = dequantize_iq2s(payload, 256)
        np.testing.assert_allclose(out, vals, rtol=1e-2)

    def test_non_multiple_raises(self):
        with pytest.raises(QuantizationError):
            quantize_iq2s(np.zeros(100, dtype=np.float32))


class TestTL:
    @pytest.mark.parametrize("q,dq,block", [
        (quantize_tl1, dequantize_tl1, 64),
        (quantize_tl2, dequantize_tl2, 128),
    ])
    def test_roundtrip_ternary(self, rng, q, dq, block):
        # ternary values {-s, 0, s} are exactly representable in TL codecs
        s = 0.8
        vals = (rng.integers(-1, 2, size=block * 4) * s).astype(np.float32)
        payload, scales = q(vals)
        out = dq(payload, vals.size, scales)
        np.testing.assert_allclose(out, vals, rtol=1e-5, atol=1e-6)

    def test_tl1_block_size(self):
        payload, scales = quantize_tl1(np.ones(64, dtype=np.float32))
        assert len(payload) == 16  # 64 codes / 4 per byte
        assert scales.shape == (1,)

    def test_tl2_block_size(self):
        payload, scales = quantize_tl2(np.ones(128, dtype=np.float32))
        assert len(payload) == 32
        assert scales.shape == (1,)


class TestFlavorDetection:
    """Decision-table parity with detect_i2s_flavor (types.rs:868-925)."""

    def test_exact_qk256(self):
        n = 1024
        assert detect_i2s_flavor(n, (n // 256) * 64) == I2SFlavor.GGML_QK256_NO_SCALE

    def test_exact_inline(self):
        n = 1024
        assert detect_i2s_flavor(n, (n // 32) * 10) == I2SFlavor.BITNET32_F16

    def test_exact_split_with_sibling(self):
        # n NOT divisible by 256, else split_need == qk256_need and the
        # exact-match priority hands it to QK256 (see ambiguity test below)
        n = 1056
        assert detect_i2s_flavor(n, (n // 32) * 8, has_scale_sibling=True) \
            == I2SFlavor.SPLIT32_WITH_SIBLING

    def test_split_without_sibling_still_split(self):
        n = 1056
        assert detect_i2s_flavor(n, (n // 32) * 8) == I2SFlavor.SPLIT32_WITH_SIBLING

    def test_ambiguity_prefers_larger_block(self):
        # n divisible by 256: qk256_need = n/4, split_need = n/4 — identical!
        # exact-match priority says QK256 wins (reference behavior).
        n = 2048
        assert (n // 256) * 64 == (n // 32) * 8
        assert detect_i2s_flavor(n, n // 4) == I2SFlavor.GGML_QK256_NO_SCALE

    def test_tolerance_match(self):
        n = 100_000
        need = (-(-n // 256)) * 64
        assert detect_i2s_flavor(n, need + 32) == I2SFlavor.GGML_QK256_NO_SCALE

    def test_strict_tolerance_tight(self):
        n = 100_000
        need = (-(-n // 256)) * 64
        with pytest.raises(QuantizationError):
            detect_i2s_flavor(n, need + 3000, strict=True)

    def test_no_match_raises(self):
        with pytest.raises(QuantizationError):
            detect_i2s_flavor(1024, 9999999)


class TestInt8Activations:
    def test_roundtrip_error_bounded(self, rng):
        x = rng.standard_normal((4, 128)).astype(np.float32)
        q, s = quantize_activations_int8(x)
        out = dequantize_activations_int8(q, s)
        assert np.abs(out - x).max() <= s.max() * 0.5 + 1e-6

    def test_zero_row(self):
        x = np.zeros((2, 16), dtype=np.float32)
        q, s = quantize_activations_int8(x)
        assert (q == 0).all()
        out = dequantize_activations_int8(q, s)
        np.testing.assert_array_equal(out, x)

    def test_range(self, rng):
        x = rng.standard_normal((8, 64)).astype(np.float32) * 100
        q, _ = quantize_activations_int8(x)
        assert q.max() <= 127 and q.min() >= -127
