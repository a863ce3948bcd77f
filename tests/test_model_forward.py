"""Model forward parity tests: JAX model vs independent numpy golden model.

The TPU-build version of the crossval gate (SURVEY.md §3.3): per-token
cosine similarity > 0.99 between two independent implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.models import forward, load_model, logits
from bitnet_tpu.verify.reference import (
    compare_logits,
    cosine_similarity,
    reference_forward,
)


def run_jax_full(cfg, params, tokens, kernel_path="xla", dtype=jnp.float32):
    """Prefill-style full forward; returns logits [T, V] numpy."""
    B, T = 1, len(tokens)
    S = 64
    tok = jnp.asarray([tokens], dtype=jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]
    kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim), dtype)
    vc = jnp.zeros_like(kc)
    h, kc, vc, _, _ = forward(cfg, params, tok, pos, kc, vc,
                        jnp.zeros(B, jnp.int32), T, kernel_path)
    lg = logits(cfg, params, h, kernel_path)
    return np.asarray(lg[0], dtype=np.float32)


class TestForwardParity:
    def test_f32_model_matches_reference(self, mini_gguf_f32):
        m = mini_gguf_f32
        cfg, params, report = load_model(m.path, param_dtype=jnp.float32)
        tokens = [1, 5, 9, 200, 43, 77]
        ours = run_jax_full(cfg, params, tokens)
        golden = reference_forward(cfg, m.weights, tokens)
        res = compare_logits(ours, golden, threshold=0.99)
        assert res["passed"], res
        # f32 + tiny model should be far tighter than the 0.99 gate
        assert res["min_cosine"] > 0.9999, res["cosine_similarities"]

    def test_qk256_model_matches_reference(self, mini_gguf_qk256):
        m = mini_gguf_qk256
        cfg, params, report = load_model(m.path, param_dtype=jnp.float32)
        # quantized linears must load packed, not dense
        assert report.kinds["wq"] == "qk256"
        tokens = [2, 100, 3, 50, 11]
        ours = run_jax_full(cfg, params, tokens)
        golden = reference_forward(cfg, m.weights, tokens)
        res = compare_logits(ours, golden, threshold=0.99)
        assert res["passed"], res

    def test_bitnet32_model_matches_reference(self, mini_gguf_bitnet32):
        m = mini_gguf_bitnet32
        cfg, params, report = load_model(m.path, param_dtype=jnp.float32)
        assert report.kinds["wq"] == "bitnet32"
        tokens = [4, 8, 15, 16, 23, 42]
        ours = run_jax_full(cfg, params, tokens)
        golden = reference_forward(cfg, m.weights, tokens)
        res = compare_logits(ours, golden, threshold=0.99)
        assert res["passed"], res

    def test_dense_mode_equals_packed_mode(self, mini_gguf_qk256):
        m = mini_gguf_qk256
        cfg, p_packed, _ = load_model(m.path, mode="auto", param_dtype=jnp.float32)
        cfg2, p_dense, rep = load_model(m.path, mode="dense", param_dtype=jnp.float32)
        assert rep.kinds["wq"] == "dense"
        tokens = [7, 7, 7, 19]
        a = run_jax_full(cfg, p_packed, tokens)
        b = run_jax_full(cfg2, p_dense, tokens)
        # dense path stores bf16 weights; allow small tolerance
        assert cosine_similarity(a[-1], b[-1]) > 0.999


class TestIncrementalDecodeParity:
    def test_prefill_then_decode_matches_full_forward(self, mini_gguf_f32):
        """Incremental (KV-cached) decode must equal full-sequence forward.

        Mirrors the reference's engine prefill/incremental tests
        (``bitnet-inference/src/engine.rs:1918-2155``).
        """
        m = mini_gguf_f32
        cfg, params, _ = load_model(m.path, param_dtype=jnp.float32)
        tokens = [1, 9, 33, 7, 121, 55, 40]
        full = run_jax_full(cfg, params, tokens)

        B, S = 1, 32
        kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
                       jnp.float32)
        vc = jnp.zeros_like(kc)
        # prefill first 3 tokens
        t0 = jnp.asarray([tokens[:3]], jnp.int32)
        pos = jnp.arange(3, dtype=jnp.int32)[None, :]
        h, kc, vc, _, _ = forward(cfg, params, t0, pos, kc, vc,
                            jnp.zeros(B, jnp.int32), 3)
        step_logits = [np.asarray(logits(cfg, params, h)[0])]
        # decode one token at a time
        for t in range(3, len(tokens)):
            tok = jnp.asarray([[tokens[t]]], jnp.int32)
            pos = jnp.asarray([[t]], jnp.int32)
            h, kc, vc, _, _ = forward(cfg, params, tok, pos, kc, vc,
                                jnp.asarray([t], jnp.int32), 1)
            step_logits.append(np.asarray(logits(cfg, params, h)[0]))

        inc = np.concatenate(step_logits, axis=0)  # [T, V]
        np.testing.assert_allclose(inc, full, rtol=2e-4, atol=2e-4)

    def test_padded_query_slots_are_dropped(self, mini_gguf_f32):
        """Padding tokens (position == S) must not corrupt the cache."""
        m = mini_gguf_f32
        cfg, params, _ = load_model(m.path, param_dtype=jnp.float32)
        tokens = [3, 14, 15]
        B, S = 1, 32
        kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
                       jnp.float32)
        vc = jnp.zeros_like(kc)

        # prefill padded to T=8: 3 real + 5 padding slots at position S
        T = 8
        tok = jnp.asarray([tokens + [0] * (T - 3)], jnp.int32)
        pos = jnp.asarray(
            [list(range(3)) + [S] * (T - 3)], jnp.int32)
        h, kc, vc, _, _ = forward(cfg, params, tok, pos, kc, vc,
                            jnp.zeros(B, jnp.int32), 3)
        padded_last_real = np.asarray(logits(cfg, params, h)[0, 2])

        # unpadded run
        unpadded = run_jax_full(cfg, params, tokens)[-1]
        np.testing.assert_allclose(padded_last_real, unpadded, rtol=2e-4,
                                   atol=2e-4)


class TestCosineCompare:
    def test_identical(self):
        a = np.random.default_rng(0).standard_normal((3, 10))
        res = compare_logits(a, a)
        assert res["passed"] and res["min_cosine"] == pytest.approx(1.0)

    def test_divergence_detection(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 50))
        b = a.copy()
        b[2] = rng.standard_normal(50)  # diverge at position 2
        res = compare_logits(a, b)
        assert not res["passed"]
        assert res["first_divergence"] == 2


class TestInt8Head:
    def test_int8_head_cosine(self, mini_gguf_qk256):
        """quantize_head: int8 tied-logits head stays >0.999 cosine vs the
        bf16 head (EngineConfig logits_dtype='int8')."""
        import numpy as np

        from bitnet_tpu.models import load_model
        from bitnet_tpu.models.bitnet import (
            forward,
            logits as model_logits,
            quantize_head,
        )

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        pq = quantize_head(params)
        assert pq.embed_q is not None and pq.embed_q.dtype == jnp.int8
        S = 16
        kc = jnp.zeros((cfg.num_layers, 1, S, cfg.num_kv_heads,
                        cfg.head_dim), jnp.float32)
        tok = jnp.asarray([[5, 9, 2]], jnp.int32)
        pos = jnp.asarray([[0, 1, 2]], jnp.int32)
        h, *_ = forward(cfg, params, tok, pos, kc, jnp.zeros_like(kc),
                        jnp.zeros((1,), jnp.int32), 3, "xla")
        lg_bf = np.asarray(model_logits(cfg, params, h, "xla"),
                           np.float64)[0]
        lg_i8 = np.asarray(model_logits(cfg, pq, h, "w2a8"), np.float64)[0]
        for t in range(3):
            cos = lg_i8[t] @ lg_bf[t] / (
                np.linalg.norm(lg_i8[t]) * np.linalg.norm(lg_bf[t]) + 1e-30)
            assert cos > 0.999, (t, cos)

    def test_engine_config_knob(self, mini_gguf_qk256):
        from bitnet_tpu.config import EngineConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        eng = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=32, kernel_path="w2a8", logits_dtype="int8"))
        assert eng.params.embed_q is not None
        # generation still runs end to end on the int8 head
        out = eng.generate([1, 5, 9],
                           __import__("bitnet_tpu.config",
                                      fromlist=["GenerationConfig"]
                                      ).GenerationConfig(
                               max_new_tokens=3, greedy=True))
        assert len(out.token_ids) >= 1
