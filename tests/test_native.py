"""Native C++ codec + C ABI tests.

Gate: the native codec must be bit-identical to the numpy reference
implementations, and the C ABI must drive real inference from plain C.
"""

import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu import native
from bitnet_tpu.ops.linear import repack_codes_for_tpu
from bitnet_tpu.quant.i2s import quantize_bitnet32
from bitnet_tpu.quant.qk256 import dequantize_qk256, quantize_qk256
from bitnet_tpu.quant.ternary import unpack_codes_lsb_first

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_AVAILABLE = native.available()

pytestmark = pytest.mark.skipif(
    not NATIVE_AVAILABLE, reason="native codec not built (no toolchain)")


@pytest.fixture(scope="module")
def payload():
    # own rng: the shared `rng` fixture is function-scoped (round-3
    # flake fix) and can't feed a module-scoped fixture
    rng = np.random.default_rng(0xB17)
    w = rng.normal(size=(16, 512)).astype(np.float32) * 1.2
    return w, np.frombuffer(quantize_qk256(w), np.uint8)


class TestCodecParity:
    def test_extract_codes(self, payload):
        w, raw = payload
        rows, cols = w.shape
        got = native.qk256_extract_codes(raw, rows, cols)
        stride = (-(-cols // 256)) * 64
        want = unpack_codes_lsb_first(raw).reshape(rows, stride * 4)[:, :cols]
        np.testing.assert_array_equal(got, want)

    def test_dequant(self, payload):
        w, raw = payload
        rows, cols = w.shape
        got = native.qk256_dequant_f32(raw, rows, cols, 0.5)
        want = dequantize_qk256(raw, rows, cols) * np.float32(0.5)
        np.testing.assert_array_equal(got, want)

    def test_quantize(self, payload):
        w, raw = payload
        got = native.qk256_quantize(w)
        np.testing.assert_array_equal(got.reshape(-1), raw)

    def test_quantize_unpadded_cols(self, rng):
        w = rng.normal(size=(4, 300)).astype(np.float32)
        got = native.qk256_quantize(w)
        want = np.frombuffer(quantize_qk256(w), np.uint8).reshape(4, -1)
        np.testing.assert_array_equal(got, want)

    def test_repack(self, rng):
        codes = rng.integers(0, 4, size=(300, 64)).astype(np.uint8)
        got = native.repack_codes_tpu(codes)
        want = repack_codes_for_tpu(codes)
        np.testing.assert_array_equal(got, want)

    def test_fused_payload_to_tpu(self, rng):
        """payload[N,K] → transpose → interleave in one native pass."""
        N, K = 48, 512
        w = rng.normal(size=(N, K)).astype(np.float32)
        raw = np.frombuffer(quantize_qk256(w), np.uint8)
        got = native.qk256_payload_to_tpu(raw, N, K, out_cols=128)
        codes_nk = native.qk256_extract_codes(raw, N, K)
        want = repack_codes_for_tpu(codes_nk.T.copy())
        want = np.concatenate(
            [want, np.zeros((want.shape[0], 128 - N), np.uint8)], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_repack_words(self, rng):
        """Fused repack+fold == byte repack → numpy fold."""
        from bitnet_tpu.ops.linear import fold_packed_words

        codes = rng.integers(0, 4, size=(300, 64)).astype(np.uint8)
        got = native.repack_codes_tpu_words(codes)
        want = fold_packed_words(repack_codes_for_tpu(codes))
        np.testing.assert_array_equal(got, want)

    def test_repack_words_transposed_view(self, rng):
        """A `.T` view (F-order [K, N]) rides the in-kernel transpose —
        bit-identical to the contiguous route, no host copy."""
        codes_nk = rng.integers(0, 4, size=(96, 300)).astype(np.uint8)
        view = codes_nk.T                      # [K=300, N=96], F-order
        assert not view.flags.c_contiguous
        got = native.repack_codes_tpu_words(view)
        want = native.repack_codes_tpu_words(view.copy())  # C-contiguous
        np.testing.assert_array_equal(got, want)

    def test_fused_payload_to_tpu_words(self, rng):
        """payload[N,K] → transpose → interleave → int32 words, one pass
        (the 2B-model load path, models/loader.py qk256 branch)."""
        from bitnet_tpu.ops.linear import fold_packed_words

        N, K = 48, 512
        w = rng.normal(size=(N, K)).astype(np.float32)
        raw = np.frombuffer(quantize_qk256(w), np.uint8)
        got = native.qk256_payload_to_tpu_words(raw, N, K, out_cols=128)
        want = fold_packed_words(
            native.qk256_payload_to_tpu(raw, N, K, out_cols=128))
        np.testing.assert_array_equal(got, want)

    def test_fold_fast_path_matches_shift_route(self, rng):
        """The little-endian transpose+view fold == the shift/or fold."""
        from bitnet_tpu.ops.linear import fold_packed_words

        pb = rng.integers(0, 256, size=(128, 96)).astype(np.uint8)
        got = fold_packed_words(pb)
        b = pb.reshape(32, 4, 96).astype(np.uint32)
        want = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                | (b[:, 3] << 24)).view(np.int32)
        np.testing.assert_array_equal(got, want)

    def test_bitnet32_extract(self, rng):
        x = rng.normal(size=(4, 64)).astype(np.float32)
        raw = np.frombuffer(quantize_bitnet32(x), np.uint8)
        nblocks = x.size // 32
        codes, scales = native.bitnet32_extract(raw, nblocks)
        blocks = raw.reshape(nblocks, 10)
        want_codes = unpack_codes_lsb_first(blocks[:, :8].reshape(-1))
        want_scales = np.ascontiguousarray(
            blocks[:, 8:10]).view(np.float16).reshape(nblocks)
        np.testing.assert_array_equal(codes, want_codes)
        np.testing.assert_allclose(scales, want_scales.astype(np.float32),
                                   rtol=1e-3)


class TestBF16Cast:
    def test_rne_bit_twiddle_matches_ml_dtypes_exhaustive(self):
        """loader._as_param's vectorized f32→bf16 == ml_dtypes' cast for
        every high halfword × boundary low halfwords (covers all
        exponents, signs, NaN/inf payloads, subnormals, and every RNE
        rounding case: below/at/above the tie, both parities)."""
        import ml_dtypes

        from bitnet_tpu.models.loader import _as_param

        hi = np.arange(65536, dtype=np.uint32) << 16
        for lo in (0x0000, 0x0001, 0x7FFF, 0x8000, 0x8001, 0xFFFF):
            u = (hi | lo).view(np.float32)
            want = u.astype(ml_dtypes.bfloat16)
            got = np.asarray(_as_param(u, jnp.bfloat16))
            # compare bit patterns; NaNs only need to stay NaNs
            wb = want.view(np.uint16)
            gb = got.view(np.uint16)
            nan = np.isnan(u)
            np.testing.assert_array_equal(wb[~nan], gb[~nan],
                                          err_msg=f"lo=0x{lo:04x}")
            assert np.isnan(got[nan].astype(np.float32)).all()

    def test_non_f32_passthrough(self):
        from bitnet_tpu.models.loader import _as_param

        a = np.arange(6, dtype=np.float16).reshape(2, 3)
        got = _as_param(a, jnp.bfloat16)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      a.astype(np.float32))
        b = np.arange(4, dtype=np.float32)
        assert _as_param(b, jnp.float32).dtype == jnp.float32


class TestCABI:
    def test_c_smoke_binary(self, mini_gguf_f32):
        """Compile-and-run the standalone C program against the C ABI."""
        smoke = os.path.join(REPO, "native", "build", "c_smoke")
        if not os.path.exists(smoke):
            r = subprocess.run(
                ["make", "-C", os.path.join(REPO, "native"), "build/c_smoke"],
                capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                pytest.skip(f"c_smoke build failed: {r.stderr[-500:]}")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        # the axon sitecustomize registers the TPU plugin whenever
        # PALLAS_AXON_POOL_IPS is set, REGARDLESS of JAX_PLATFORMS — and
        # hangs the embedded interpreter at import when the relay is
        # down.  The smoke is a CPU test; drop the latch entirely.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [smoke, REPO, mini_gguf_f32.path],
            capture_output=True, text=True, timeout=600, env=env)
        assert r.returncode == 0, (r.stdout, r.stderr)
        assert "C_SMOKE_OK" in r.stdout
        assert "generated" in r.stdout


class TestFallback:
    def test_numpy_fallback_matches(self, monkeypatch, rng):
        """With the lib force-disabled, wrappers fall back identically."""
        codes = rng.integers(0, 4, size=(256, 32)).astype(np.uint8)
        want = native.repack_codes_tpu(codes)
        want_w = native.repack_codes_tpu_words(codes)
        monkeypatch.setattr(native, "get_lib", lambda: None)
        got = native.repack_codes_tpu(codes)
        got_w = native.repack_codes_tpu_words(codes)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got_w, want_w)

    def test_payload_words_fallback_matches(self, monkeypatch, rng):
        N, K = 20, 256
        w = rng.normal(size=(N, K)).astype(np.float32)
        raw = np.frombuffer(quantize_qk256(w), np.uint8)
        want = native.qk256_payload_to_tpu_words(raw, N, K, out_cols=128)
        monkeypatch.setattr(native, "get_lib", lambda: None)
        got = native.qk256_payload_to_tpu_words(raw, N, K, out_cols=128)
        np.testing.assert_array_equal(got, want)
