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


class TestFlatCacheLayout:
    """Round-4: the decode cache can be stored FLAT [L, B, S, KV*D] by
    the caller — the 5D [.., KV, D] while-carry made XLA pick an S-minor
    layout (sublane padding on KV=5) and relayout-copy the full cache 4x
    per step at B=8.  forward() must accept either layout on every plan
    and return the caller's layout with identical numerics."""

    # loose=True marks pairs where the two layouts legitimately select
    # DIFFERENT plans (5D -> einsum, flat -> pallas batched_v2): numerics
    # then differ at bf16 level, not bitwise
    @pytest.mark.parametrize("B,quant,env,loose", [
        (1, False, {}, False),
        (1, True, {}, False),
        (8, False, {"BITNET_BATCHED_ATTN": "0"}, False),  # einsum both
        (8, True, {"BITNET_BATCHED_ATTN": "0"}, False),
        (8, False, {}, True),                 # einsum-5D vs pallas-flat
        (8, True, {}, True),
        (8, False, {"BITNET_BATCHED_ATTN": "v2qkv"}, False),
    ])
    def test_flat_matches_5d(self, mini_gguf_qk256, B, quant, env, loose,
                             monkeypatch):
        import dataclasses

        from bitnet_tpu.models.bitnet import fuse_block_params

        for k, v in env.items():
            monkeypatch.setenv(k, v)
        cfg, params, _ = load_model(mini_gguf_qk256.path)
        params = dataclasses.replace(
            params, blocks=fuse_block_params(params.blocks))
        L, KV, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        S = 32
        dt = jnp.int8 if quant else jnp.bfloat16
        rng = np.random.default_rng(7)
        kc5 = jnp.zeros((L, B, S, KV, D), dt)
        ks = jnp.zeros((L, B, S, KV), jnp.float32) if quant else None
        vs = jnp.zeros_like(ks) if quant else None
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)),
                          jnp.int32)
        pos = jnp.asarray(rng.integers(0, 3, (B, 1)), jnp.int32)
        vl = pos[:, 0]
        h5, k5, v5, ks5, _ = forward(
            cfg, params, tok, pos, kc5, jnp.zeros_like(kc5), vl, 1,
            "w2a8", ks, vs)
        kcf = kc5.reshape(L, B, S, KV * D)
        hf, kf, vf, ksf, _ = forward(
            cfg, params, tok, pos, kcf, jnp.zeros_like(kcf), vl, 1,
            "w2a8", ks, vs)
        assert kf.ndim == 4 and vf.ndim == 4
        if loose:
            a = np.asarray(hf, np.float64).reshape(B, -1)
            r = np.asarray(h5, np.float64).reshape(B, -1)
            for bb in range(B):
                cos = float(a[bb] @ r[bb] / (np.linalg.norm(a[bb])
                                             * np.linalg.norm(r[bb])
                                             + 1e-12))
                assert cos > 0.999, (bb, cos)
            np.testing.assert_allclose(a, r, atol=2e-1)
        else:
            np.testing.assert_allclose(
                np.asarray(hf, np.float32), np.asarray(h5, np.float32),
                atol=1e-5)
        if loose:
            # deeper layers' rows inherit the hidden-state drift between
            # the two plans (bf16 kernel vs f32 einsum) — same loose
            # gate; quantized codes are only comparable scale-applied
            kff = np.asarray(kf, np.float32)
            k5f = np.asarray(k5.reshape(L, B, S, KV * D), np.float32)
            if quant:
                kff = kff * np.repeat(np.asarray(ksf, np.float32),
                                      D, axis=-1)
                k5f = k5f * np.repeat(np.asarray(ks5, np.float32),
                                      D, axis=-1)
            np.testing.assert_allclose(kff, k5f, atol=2e-1)
        else:
            np.testing.assert_array_equal(
                np.asarray(kf), np.asarray(k5.reshape(L, B, S, KV * D)))
            np.testing.assert_array_equal(
                np.asarray(vf), np.asarray(v5.reshape(L, B, S, KV * D)))
        if quant and not loose:
            np.testing.assert_array_equal(np.asarray(ksf),
                                          np.asarray(ks5))

    def test_flat_prefill_roundtrip(self, mini_gguf_qk256):
        """T>1 (prefill path) with a flat caller cache: layout restored,
        numerics match the 5D call."""
        cfg, params, _ = load_model(mini_gguf_qk256.path)
        L, KV, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        B, S, T = 1, 32, 3
        kc5 = jnp.zeros((L, B, S, KV, D), jnp.bfloat16)
        tok = jnp.asarray([[5, 9, 2]], jnp.int32)
        pos = jnp.asarray([[0, 1, 2]], jnp.int32)
        vl = jnp.zeros((B,), jnp.int32)
        h5, k5, v5, *_ = forward(cfg, params, tok, pos, kc5,
                                 jnp.zeros_like(kc5), vl, T, "w2a8")
        kcf = kc5.reshape(L, B, S, KV * D)
        hf, kf, vf, *_ = forward(cfg, params, tok, pos, kcf,
                                 jnp.zeros_like(kcf), vl, T, "w2a8")
        assert kf.shape == kcf.shape
        np.testing.assert_allclose(
            np.asarray(hf, np.float32), np.asarray(h5, np.float32),
            atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(kf), np.asarray(k5.reshape(L, B, S, KV * D)))
