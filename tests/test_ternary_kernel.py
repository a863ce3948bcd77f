"""Fused ternary-matmul Pallas kernel tests (interpret mode on CPU).

Golden model: the numpy codecs (quant/) + dense matmul — the same pairing
the reference uses for its SIMD kernel tests
(``bitnet-kernels/src/cpu/x86.rs:782-832`` AVX-512-vs-scalar parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.ops.linear import (
    TernaryLinear,
    bitnet32_linear_from_codes,
    dequantize_weight,
    linear_apply,
    qk256_linear_from_codes,
    repack_codes_for_tpu,
    unpack_codes_host,
)
from bitnet_tpu.ops.ternary_matmul import ternary_matmul_pallas
from bitnet_tpu.quant.ternary import LUT_SYM


def random_codes(rng, k, n):
    return rng.integers(0, 4, size=(k, n)).astype(np.uint8)


class TestRepack:
    def test_roundtrip(self, rng):
        codes = random_codes(rng, 512, 128)
        packed = repack_codes_for_tpu(codes)
        assert packed.shape == (128, 128)
        out = unpack_codes_host(packed, 512)
        np.testing.assert_array_equal(out, codes)

    def test_k_padding(self, rng):
        codes = random_codes(rng, 300, 128)
        packed = repack_codes_for_tpu(codes)
        assert packed.shape == (512 // 4, 128)
        np.testing.assert_array_equal(unpack_codes_host(packed, 300), codes)


class TestXLAUnpackPath:
    def test_dequantize_weight_matches_lut(self, rng):
        codes = random_codes(rng, 256, 128)
        lin = qk256_linear_from_codes(codes)
        w = np.asarray(dequantize_weight(lin, jnp.float32))
        np.testing.assert_array_equal(w, LUT_SYM[codes])

    def test_bitnet32_scales_applied(self, rng):
        k, n = 256, 128
        codes = random_codes(rng, k, n)
        scales = rng.uniform(0.1, 2.0, size=(k // 32, n)).astype(np.float32)
        lin = bitnet32_linear_from_codes(codes, scales)
        w = np.asarray(dequantize_weight(lin, jnp.float32))
        expect = LUT_SYM[codes] * np.repeat(scales, 32, axis=0)
        np.testing.assert_allclose(w, expect, rtol=1e-6)

    def test_n_padding_sliced(self, rng):
        codes = random_codes(rng, 256, 100)  # N=100 → padded to 128
        lin = qk256_linear_from_codes(codes)
        assert lin.packed.shape[1] == 128
        w = np.asarray(dequantize_weight(lin, jnp.float32))
        assert w.shape == (256, 100)


class TestPallasKernelQK256:
    @pytest.mark.parametrize("m,k,n", [
        (1, 256, 128),      # decode GEMV
        (16, 512, 256),     # small batch
        (128, 256, 128),    # prefill tile
        (100, 300, 100),    # ragged everything
    ])
    def test_matches_golden(self, rng, m, k, n):
        codes = random_codes(rng, k, n)
        lin = qk256_linear_from_codes(codes)
        x = rng.standard_normal((m, k)).astype(np.float32) * 0.1
        y = np.asarray(ternary_matmul_pallas(lin, jnp.asarray(x, jnp.float32),
                                             interpret=True))
        golden = x.astype(np.float32) @ LUT_SYM[codes]
        # bf16 activations inside the kernel → bf16-level tolerance
        np.testing.assert_allclose(y, golden, rtol=2e-2, atol=2e-2)

    def test_per_tensor_scale(self, rng):
        codes = random_codes(rng, 256, 128)
        lin = qk256_linear_from_codes(codes, scale=0.5)
        x = rng.standard_normal((8, 256)).astype(np.float32) * 0.1
        y = np.asarray(ternary_matmul_pallas(lin, jnp.asarray(x), interpret=True))
        golden = 0.5 * (x @ LUT_SYM[codes])
        np.testing.assert_allclose(y, golden, rtol=2e-2, atol=2e-2)

    def test_batched_leading_dims(self, rng):
        codes = random_codes(rng, 256, 128)
        lin = qk256_linear_from_codes(codes)
        x = rng.standard_normal((2, 4, 256)).astype(np.float32) * 0.1
        y = np.asarray(ternary_matmul_pallas(lin, jnp.asarray(x), interpret=True))
        assert y.shape == (2, 4, 128)
        golden = x @ LUT_SYM[codes]
        np.testing.assert_allclose(y, golden, rtol=2e-2, atol=2e-2)


class TestPallasKernelBitNet32:
    @pytest.mark.parametrize("m,k,n", [
        (1, 256, 128),
        (32, 512, 256),
        (64, 288, 160),     # K not multiple of 256 (but of 32)
    ])
    def test_matches_golden(self, rng, m, k, n):
        codes = random_codes(rng, k, n)
        scales = rng.uniform(0.05, 1.5, size=(k // 32, n)).astype(np.float32)
        lin = bitnet32_linear_from_codes(codes, scales)
        x = rng.standard_normal((m, k)).astype(np.float32) * 0.1
        y = np.asarray(ternary_matmul_pallas(lin, jnp.asarray(x), interpret=True))
        golden = x @ (LUT_SYM[codes] * np.repeat(scales, 32, axis=0))
        # weights are scaled in f32 then cast bf16 inside the kernel →
        # tolerance scales with output magnitude
        atol = 0.02 * float(np.abs(golden).max()) + 1e-3
        np.testing.assert_allclose(y, golden, rtol=2e-2, atol=atol)


class TestPallasVsXLAPath:
    def test_linear_apply_paths_agree(self, rng):
        codes = random_codes(rng, 512, 256)
        lin = qk256_linear_from_codes(codes)
        x = jnp.asarray(rng.standard_normal((16, 512)) * 0.1, jnp.float32)
        y_xla = np.asarray(linear_apply(lin, x, path="xla"))
        y_pal = np.asarray(ternary_matmul_pallas(lin, x, interpret=True))
        np.testing.assert_allclose(y_xla, y_pal, rtol=2e-2, atol=2e-2)


def _w2a8_emulate(x: np.ndarray, w_lut: np.ndarray, scale) -> np.ndarray:
    """Numpy mirror of the W2A8 kernel numerics (f32 quantization, exact
    int32 accumulation, same scale-multiply order)."""
    xf = x.astype(np.float32)
    absmax = np.maximum(np.max(np.abs(xf), axis=1, keepdims=True),
                        np.float32(1e-8))
    sx = (absmax / np.float32(127.0)).astype(np.float32)
    xq = np.clip(np.round(xf / sx), -127, 127).astype(np.int64)
    acc = xq @ w_lut.astype(np.int64)
    y = acc.astype(np.float32) * sx
    return (y * np.float32(scale)).astype(np.float32)


class TestW2A8Kernel:
    """Int8-activation path (reference W2A8 numerics,
    bitnet-kernels/src/cpu/x86.rs:417 matmul_i2s_avx2)."""

    @pytest.mark.parametrize("m,k,n", [
        (1, 256, 128),      # decode GEMV
        (16, 512, 256),
        (100, 300, 100),    # ragged
    ])
    def test_matches_int_emulation(self, rng, m, k, n):
        codes = random_codes(rng, k, n)
        lin = qk256_linear_from_codes(codes, scale=0.25)
        x = rng.standard_normal((m, k)).astype(np.float32)
        y = np.asarray(ternary_matmul_pallas(
            lin, jnp.asarray(x, jnp.float32), interpret=True,
            variant="w2a8"))
        want = _w2a8_emulate(x, LUT_SYM[codes], 0.25)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)

    def test_cosine_vs_exact(self, rng):
        """Per-token int8 activations keep cosine > 0.999 vs exact bf16."""
        k, n = 512, 512
        codes = random_codes(rng, k, n)
        lin = qk256_linear_from_codes(codes, scale=0.02)
        x = rng.standard_normal((4, k)).astype(np.float32)
        y8 = np.asarray(ternary_matmul_pallas(
            lin, jnp.asarray(x), interpret=True, variant="w2a8")
        ).astype(np.float64)
        y = (x.astype(np.float64) @ LUT_SYM[codes]) * 0.02
        for i in range(4):
            cos = np.dot(y8[i], y[i]) / (
                np.linalg.norm(y8[i]) * np.linalg.norm(y[i]) + 1e-30)
            assert cos > 0.999, cos

    def test_fused_vecscale(self, rng):
        """Per-column scales (fused QKV / gate|up projections)."""
        from bitnet_tpu.ops.linear import concat_linears

        k = 256
        codes_a = random_codes(rng, k, 128)
        codes_b = random_codes(rng, k, 256)
        fused = concat_linears([
            qk256_linear_from_codes(codes_a, scale=0.5),
            qk256_linear_from_codes(codes_b, scale=0.02),
        ])
        x = rng.standard_normal((3, k)).astype(np.float32)
        y = np.asarray(ternary_matmul_pallas(
            fused, jnp.asarray(x), interpret=True, variant="w2a8"))
        wa = _w2a8_emulate(x, LUT_SYM[codes_a], 0.5)
        wb = _w2a8_emulate(x, LUT_SYM[codes_b], 0.02)
        np.testing.assert_allclose(y[:, :128], wa, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(y[:, 128:], wb, rtol=1e-4, atol=1e-5)

    def test_bitnet32_falls_back_exact(self, rng):
        """variant='w2a8' on bitnet32 uses the exact bf16 kernel."""
        k, n = 256, 128
        codes = random_codes(rng, k, n)
        scales = rng.uniform(0.05, 1.5, size=(k // 32, n)).astype(np.float32)
        lin = bitnet32_linear_from_codes(codes, scales)
        x = rng.standard_normal((4, k)).astype(np.float32) * 0.1
        y8 = np.asarray(ternary_matmul_pallas(
            lin, jnp.asarray(x), interpret=True, variant="w2a8"))
        yb = np.asarray(ternary_matmul_pallas(
            lin, jnp.asarray(x), interpret=True, variant="pallas"))
        np.testing.assert_allclose(y8, yb, rtol=1e-6, atol=1e-6)


class TestWordStorage:
    def test_words_roundtrip(self, rng):
        from bitnet_tpu.ops.linear import fold_packed_words, unpack_words_host

        codes = random_codes(rng, 512, 128)
        words = fold_packed_words(repack_codes_for_tpu(codes))
        assert words.shape == (32, 128) and words.dtype == np.int32
        np.testing.assert_array_equal(unpack_words_host(words, 512), codes)
