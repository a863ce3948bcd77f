"""Property-based tests (hypothesis) — the pytest translation of the
reference's proptest + fuzz layers (SURVEY.md §4 items 2-3: quantization
round-trips, GGUF header robustness, sampling invariants, packing).
"""

import io
import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from bitnet_tpu.engine.sampling import (
    apply_min_p,
    apply_temperature,
    apply_top_k,
    apply_top_p,
    softmax,
)
from bitnet_tpu.errors import FormatError, QuantizationError
from bitnet_tpu.ops.linear import repack_codes_for_tpu, unpack_codes_host
from bitnet_tpu.quant.i2s import (
    dequantize_bitnet32,
    quantize_bitnet32,
)
from bitnet_tpu.quant.qk256 import (
    dequantize_iq2s,
    dequantize_qk256,
    quantize_iq2s,
    quantize_qk256,
)
from bitnet_tpu.quant.ternary import (
    LUT_SYM,
    pack_codes_lsb_first,
    unpack_codes_lsb_first,
)

SET = settings(max_examples=50, deadline=None,
               suppress_health_check=[HealthCheck.too_slow])


floats = st.floats(min_value=-4.0, max_value=4.0, allow_nan=False,
                   width=32)


class TestPackingProps:
    @SET
    @given(st.lists(st.integers(0, 3), min_size=4, max_size=256)
           .filter(lambda l: len(l) % 4 == 0))
    def test_pack_unpack_roundtrip(self, codes):
        c = np.asarray(codes, np.uint8)
        assert (unpack_codes_lsb_first(pack_codes_lsb_first(c)) == c).all()

    @SET
    @given(st.integers(1, 600), st.integers(1, 8))
    def test_tpu_repack_roundtrip(self, k, n):
        rng = np.random.default_rng(k * 1000 + n)
        codes = rng.integers(0, 4, size=(k, n)).astype(np.uint8)
        packed = repack_codes_for_tpu(codes)
        assert packed.shape[0] % 64 == 0
        got = unpack_codes_host(packed, k)
        assert (got == codes).all()


class TestQuantProps:
    @SET
    @given(st.integers(1, 5), st.integers(1, 700))
    def test_qk256_roundtrip_idempotent(self, rows, cols):
        """quantize(dequantize(quantize(w))) == quantize(w)."""
        rng = np.random.default_rng(rows * 10007 + cols)
        w = rng.normal(size=(rows, cols)).astype(np.float32) * 2
        q1 = quantize_qk256(w)
        d1 = dequantize_qk256(q1, rows, cols)
        q2 = quantize_qk256(d1)
        assert q1 == q2
        # dequantized values are exactly LUT levels
        assert set(np.unique(d1)).issubset(set(LUT_SYM.tolist()))

    @SET
    @given(st.integers(1, 40))
    def test_bitnet32_roundtrip_error_bounded(self, nblocks):
        rng = np.random.default_rng(nblocks)
        x = rng.normal(size=nblocks * 32).astype(np.float32)
        payload = quantize_bitnet32(x)
        y = dequantize_bitnet32(payload, x.size)
        # absmax/2 scale → max error is d (half a LUT step × scale)
        d = np.abs(x.reshape(nblocks, 32)).max(axis=1) / 2
        err = np.abs(y - x).reshape(nblocks, 32).max(axis=1)
        assert (err <= d * 1.01 + 1e-6).all()

    @SET
    @given(st.integers(1, 10))
    def test_iq2s_roundtrip_error_bounded(self, nblocks):
        rng = np.random.default_rng(nblocks + 999)
        x = rng.normal(size=nblocks * 256).astype(np.float32)
        y = dequantize_iq2s(quantize_iq2s(x), x.size)
        d = np.abs(x.reshape(nblocks, 256)).max(axis=1) / 2
        err = np.abs(y - x).reshape(nblocks, 256).max(axis=1)
        assert (err <= d * 1.01 + 1e-6).all()

    def test_iq2s_bad_size_raises(self):
        with pytest.raises(QuantizationError):
            quantize_iq2s(np.zeros(100, np.float32))


class TestSamplingProps:
    @SET
    @given(st.lists(floats, min_size=4, max_size=64),
           st.floats(0.05, 3.0, allow_nan=False))
    def test_temperature_preserves_argmax(self, logits, temp):
        lg = jnp.asarray(np.asarray(logits, np.float32)[None])
        out = apply_temperature(lg, temp)
        # scaling can flush subnormal gaps to zero and create NEW ties
        # (e.g. FLT_MIN/2 → -0.0 == 0.0), so assert the scaled argmax is
        # among the unscaled near-maximal indices rather than bit-equal
        lg_np = np.asarray(lg)[0]
        top = float(lg_np.max())
        near_top = np.flatnonzero(
            top - lg_np <= abs(top) * 1e-6 + 1e-37)
        assert int(jnp.argmax(out)) in set(near_top.tolist())

    @SET
    @given(st.lists(floats, min_size=8, max_size=64), st.integers(1, 8))
    def test_top_k_keeps_k(self, logits, k):
        lg = jnp.asarray(np.asarray(logits, np.float32)[None])
        out = np.asarray(apply_top_k(lg, k))[0]
        kept = np.isfinite(out) & (out > -1e29)
        # ties at the k-th value may all survive (threshold semantics),
        # but never fewer than k and every kept logit >= every dropped one
        assert kept.sum() >= min(k, len(logits))
        src = np.asarray(lg)[0]
        if (~kept).any() and kept.any():
            assert src[kept].min() >= src[~kept].max()
        assert np.argmax(out) == int(np.argmax(src))

    @SET
    @given(st.lists(floats, min_size=8, max_size=64),
           st.floats(0.1, 0.99))
    def test_top_p_keeps_argmax_and_probability_mass(self, logits, p):
        lg = jnp.asarray(np.asarray(logits, np.float32)[None])
        out = np.asarray(apply_top_p(lg, p))[0]
        assert np.argmax(out) == int(np.argmax(np.asarray(lg)[0]))
        probs = np.asarray(softmax(lg))[0]
        kept_mass = probs[out > -1e29].sum()
        assert kept_mass >= min(p, 1.0) - 1e-4

    @SET
    @given(st.lists(floats, min_size=8, max_size=64),
           st.floats(0.01, 0.9))
    def test_min_p_keeps_argmax(self, logits, mp):
        lg = jnp.asarray(np.asarray(logits, np.float32)[None])
        out = np.asarray(apply_min_p(lg, mp))[0]
        assert np.argmax(out) == int(np.argmax(np.asarray(lg)[0]))
        assert np.isfinite(out).any()


class TestGGUFProps:
    @SET
    @given(st.binary(min_size=0, max_size=64))
    def test_arbitrary_bytes_never_crash_reader(self, blob):
        """Fuzz-lite: random junk must raise a controlled error, not crash."""
        import tempfile

        from bitnet_tpu.errors import BitNetError
        from bitnet_tpu.gguf.reader import GGUFReader

        with tempfile.NamedTemporaryFile(suffix=".gguf") as f:
            f.write(blob)
            f.flush()
            try:
                with GGUFReader(f.name):
                    pass
            except BitNetError:
                pass          # controlled error taxonomy — expected

    @SET
    @given(st.integers(1, 2**32 - 1))
    def test_corrupt_tensor_count_rejected(self, count):
        """Tensor-count bombs hit the security limit, never allocate."""
        import struct
        import tempfile

        from bitnet_tpu.errors import BitNetError
        from bitnet_tpu.gguf.constants import GGUF_MAGIC
        from bitnet_tpu.gguf.reader import GGUFReader

        with tempfile.NamedTemporaryFile(suffix=".gguf") as f:
            f.write(struct.pack("<IIQQ", GGUF_MAGIC, 3, count, 0))
            f.flush()
            try:
                with GGUFReader(f.name):
                    pass
            except BitNetError:
                pass  # controlled error; the point is no hang/OOM
