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
