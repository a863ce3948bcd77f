"""Classic GGML quant codecs (Q8_0/Q4_0/Q4_1/Q5_0/Q5_1) tests.

The reference cannot decode these (keeps raw bytes, loader.rs:1622); we
gate round-trips and whole-model load+generate through a Q8_0 GGUF.
"""

import numpy as np
import pytest

from bitnet_tpu.errors import QuantizationError
from bitnet_tpu.quant import ggml_classic as gc


class TestRoundTrips:
    def test_q8_0_roundtrip_error(self):
        # own deterministic rng: the shared session fixture's state depends
        # on test order, and this bound is data-sensitive
        x = np.random.default_rng(123).normal(size=256).astype(np.float32)
        y = gc.dequantize_q8_0(gc.quantize_q8_0(x), x.size)
        amax = np.abs(x.reshape(-1, 32)).max(axis=1)
        err = np.abs(y - x).reshape(-1, 32).max(axis=1)
        # 0.5 steps of round-to-nearest + up to ~0.062 steps from the f16
        # scale storage (|q| ≤ 127 × relative eps 2^-11)
        assert (err <= amax / 127.0 * 0.57 + 1e-6).all()

    def test_q4_0_roundtrip_error(self, rng):
        x = rng.normal(size=128).astype(np.float32)
        y = gc.dequantize_q4_0(gc.quantize_q4_0(x), x.size)
        amax = np.abs(x.reshape(-1, 32)).max(axis=1)
        err = np.abs(y - x).reshape(-1, 32).max(axis=1)
        # ggml's q4_0 grid is asymmetric (-8d..7d): values on the short
        # side clip at q=15, so worst-case error approaches one step d
        assert (err <= amax / 8.0 * 1.01 + 2e-3).all()

    def test_q8_0_exact_levels(self):
        """Hand-built block: d=0.5, q = [-2, -1, 0, 1, ...]."""
        d = np.float16(0.5)
        q = np.arange(-16, 16, dtype=np.int8)
        payload = d.tobytes() + q.tobytes()
        y = gc.dequantize_q8_0(payload, 32)
        np.testing.assert_allclose(y, q.astype(np.float32) * 0.5)

    def test_q4_1_affine(self):
        """d=1, m=10 → values are q + 10."""
        blk = (np.float16(1.0).tobytes() + np.float16(10.0).tobytes()
               + bytes(range(16)))
        y = gc.dequantize_q4_1(blk, 32)
        lo = np.asarray([b & 15 for b in range(16)], np.float32)
        hi = np.asarray([b >> 4 for b in range(16)], np.float32)
        np.testing.assert_allclose(y, np.concatenate([lo, hi]) + 10.0)

    def test_q5_0_fifth_bit(self):
        """qh bits raise elements past nibble range."""
        d = np.float16(1.0).tobytes()
        qh = np.uint32(0b1).tobytes()       # element 0 gets bit 4
        qs = bytes(32 - 6 - 10) + bytes(10)  # 16 bytes of zeros
        blk = d + qh + bytes(16)
        y = gc.dequantize_q5_0(blk, 32)
        assert y[0] == (0 | 16) - 16        # = 0
        assert y[1] == -16                  # plain zero nibble

    def test_q5_1_roundtrip_shape(self, rng):
        x = rng.normal(size=64).astype(np.float32)
        # no quantizer for q5_1; just validate a zero payload decodes
        nb = 2
        payload = bytes(nb * 24)
        y = gc.dequantize_q5_1(payload, 64)
        assert y.shape == (64,)

    def test_bad_sizes(self):
        with pytest.raises(QuantizationError):
            gc.dequantize_q8_0(b"", 32)
        with pytest.raises(QuantizationError):
            gc.quantize_q8_0(np.zeros(33, np.float32))


class TestQ80ModelLoad:
    def test_q8_0_gguf_loads_and_generates(self, tmp_path, rng):
        """Write a Q8_0-quantized llama-style GGUF, load, generate."""
        import jax.numpy as jnp

        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.gguf.constants import GGMLType
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
        from bitnet_tpu.gguf.reader import GGUFReader
        from bitnet_tpu.gguf.writer import GGUFWriter
        from bitnet_tpu.models import load_model

        # base f32 fixture → requantize every 2D linear to Q8_0
        src = str(tmp_path / "f32.gguf")
        m = generate_mini_gguf(src, MiniModelSpec(quant="f32",
                                                  architecture="llama"))
        dst = str(tmp_path / "q8.gguf")
        with GGUFReader(src) as r:
            w = GGUFWriter()
            for k, v in r.metadata.items():
                w.add_metadata(k, v)
            for info in r:
                data = np.asarray(r.tensor_data(info.name), np.float32)
                if data.ndim == 2 and "norm" not in info.name \
                        and "embd" not in info.name:
                    w.add_quantized_tensor(
                        info.name, tuple(info.logical_shape), GGMLType.Q8_0,
                        gc.quantize_q8_0(data))
                else:
                    w.add_tensor(info.name, data, GGMLType.F32)
            w.write(dst)

        cfg, params, report = load_model(dst, param_dtype=jnp.float32)
        eng = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kv_cache_dtype="f32", compute_dtype="f32"))
        out = eng.generate([2, 7, 11],
                           GenerationConfig(max_new_tokens=4, greedy=True))
        assert len(out.token_ids) == 4

        # Q8_0 at this scale is near-lossless: tokens match the f32 model
        cfg2, params2, _ = load_model(src, param_dtype=jnp.float32)
        eng2 = InferenceEngine(cfg2, params2, EngineConfig(
            max_seq_len=64, kv_cache_dtype="f32", compute_dtype="f32"))
        golden = eng2.generate([2, 7, 11],
                               GenerationConfig(max_new_tokens=4,
                                                greedy=True))
        assert out.token_ids == golden.token_ids


class TestKQuants:
    def test_q6_k_zero_payload(self):
        """All-zero block: q=0 → (0-32); d=0 → all zeros."""
        y = gc.dequantize_q6_k(bytes(210), 256)
        np.testing.assert_array_equal(y, 0.0)

    def test_q6_k_d_scaling_linear(self):
        """Doubling d doubles every output (layout-independent check)."""
        rng = np.random.default_rng(0)
        blk = bytearray(rng.integers(0, 256, 210, dtype=np.uint8).tobytes())
        blk[208:210] = np.float16(1.0).tobytes()
        y1 = gc.dequantize_q6_k(bytes(blk), 256)
        blk[208:210] = np.float16(2.0).tobytes()
        y2 = gc.dequantize_q6_k(bytes(blk), 256)
        np.testing.assert_allclose(y2, 2 * y1, rtol=1e-6)

    def test_q6_k_known_block(self):
        """ql=0, qh=0, all scales=1, d=1 → every element = 1*(0-32) = -32."""
        blk = bytearray(210)
        blk[192:208] = np.ones(16, np.int8).tobytes()
        blk[208:210] = np.float16(1.0).tobytes()
        y = gc.dequantize_q6_k(bytes(blk), 256)
        np.testing.assert_array_equal(y, -32.0)

    def test_q6_k_six_bit_range(self):
        """ql nibble 15 + qh bits 3 → q = 15 | 48 = 63 → y = 31."""
        blk = bytearray(210)
        blk[0] = 0x0F               # ql[0] low nibble = 15
        blk[128] = 0x03             # qh[0] bits 0..1 = 3
        blk[192:208] = np.ones(16, np.int8).tobytes()
        blk[208:210] = np.float16(1.0).tobytes()
        y = gc.dequantize_q6_k(bytes(blk), 256)
        assert y[0] == 63 - 32
        assert y[1] == -32

    def test_q4_k_known_block(self):
        """d=1, dmin=0, scale_0=1 → y[0..31] = low nibbles of qs[0..31]."""
        blk = bytearray(144)
        blk[0:2] = np.float16(1.0).tobytes()
        blk[2:4] = np.float16(0.0).tobytes()
        blk[4] = 1                   # scales[0] = 1 (6-bit sc for j=0)
        qs = np.arange(32, dtype=np.uint8) % 16
        blk[16:48] = qs.tobytes()
        y = gc.dequantize_q4_k(bytes(blk), 256)
        np.testing.assert_array_equal(y[:32], (qs & 0xF).astype(np.float32))

    def test_q4_k_min_subtraction(self):
        """dmin·m offsets the sub-block: scales[4] holds m for j=0."""
        blk = bytearray(144)
        blk[0:2] = np.float16(1.0).tobytes()
        blk[2:4] = np.float16(2.0).tobytes()     # dmin = 2
        blk[4] = 0                                # sc_0 = 0
        blk[8] = 3                                # m_0 = 3 (scales[4])
        y = gc.dequantize_q4_k(bytes(blk), 256)
        np.testing.assert_array_equal(y[:32], -6.0)

    def test_k_quant_bad_size(self):
        with pytest.raises(QuantizationError):
            gc.dequantize_q6_k(bytes(210), 100)


class TestLlamaFamilyQ8:
    """Generic llama-architecture GGUF with classic Q8_0 quantization —
    the reference's FP16/quantized fallback class (BASELINE.md
    'Larger-model GPU (FP16 fallback-class)'; arch_registry generic
    llama spec).  Loads through quant/ggml_classic into dense linears."""

    @pytest.fixture(scope="class")
    def llama_q8(self, tmp_path_factory):
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

        path = str(tmp_path_factory.mktemp("llama_q8") / "mini_llama_q8.gguf")
        return generate_mini_gguf(path, MiniModelSpec(
            quant="q8_0", architecture="llama", seed=3))

    def test_loads_dense_and_generates(self, llama_q8):
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine

        eng = InferenceEngine.from_gguf(
            llama_q8.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32"))
        assert eng.cfg.architecture == "llama"
        b = eng.params.blocks
        lin = b.wqkv if b.wqkv is not None else b.wq
        assert lin.kind == "dense"
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        a = eng.generate([1, 9, 17], gen).token_ids
        b2 = eng.generate([1, 9, 17], gen).token_ids
        assert a == b2 and len(a) >= 1

    def test_crossval_vs_numpy_golden(self, llama_q8):
        """Engine vs the independent numpy golden model over the
        fixture's dequantized reference weights — the same >0.99 cosine
        gate every other flavor passes, now for the classic-quant
        llama-family path."""
        from bitnet_tpu.config import EngineConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.verify.crossval import crossval_golden

        eng = InferenceEngine.from_gguf(
            llama_q8.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32"))
        res = crossval_golden(eng, llama_q8, [1, 9, 17, 4])
        assert res.passed, (res.min_cosine, res.worst_token)
