"""Projection-fusion tests: fused QKV / gate+up == unfused, all paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.models import forward, load_model, logits
from bitnet_tpu.models.bitnet import fuse_block_params
from bitnet_tpu.ops.linear import (
    concat_linears,
    linear_apply,
    qk256_linear_from_codes,
)
import dataclasses


class TestConcatLinears:
    def test_qk256_scalar_scales_become_columns(self, rng):
        a_codes = rng.integers(0, 4, (256, 128)).astype(np.uint8)
        b_codes = rng.integers(0, 4, (256, 256)).astype(np.uint8)
        la = qk256_linear_from_codes(a_codes, 0.5)
        lb = qk256_linear_from_codes(b_codes, 2.0)
        fused = concat_linears([la, lb])
        assert fused.n == 384
        x = jnp.asarray(rng.normal(size=(3, 256)), jnp.float32)
        ya = np.asarray(linear_apply(la, x))
        yb = np.asarray(linear_apply(lb, x))
        yf = np.asarray(linear_apply(fused, x))
        np.testing.assert_allclose(yf[:, :128], ya, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(yf[:, 128:], yb, rtol=1e-4, atol=1e-4)

    def test_pallas_interpret_vecscale(self, rng):
        """Fused per-column-scale kernel (interpret mode) == XLA path."""
        a = qk256_linear_from_codes(
            rng.integers(0, 4, (256, 128)).astype(np.uint8), 0.25)
        b = qk256_linear_from_codes(
            rng.integers(0, 4, (256, 128)).astype(np.uint8), 4.0)
        fused = concat_linears([a, b])
        x = jnp.asarray(rng.normal(size=(2, 256)), jnp.float32)
        y_xla = np.asarray(linear_apply(fused, x, path="xla"))
        y_pl = np.asarray(linear_apply(fused, x, path="pallas"))
        # pallas feeds the MXU bf16 — error is absolute in the scale of
        # the output magnitude, so bound by the row max, not per-element
        err = np.abs(y_pl - y_xla).max()
        assert err <= 0.01 * np.abs(y_xla).max(), err
        # and per-column scales must be applied (cosine per half-slice)
        for sl in (slice(0, 128), slice(128, 256)):
            a_, b_ = y_pl[:, sl].ravel(), y_xla[:, sl].ravel()
            cos = a_ @ b_ / (np.linalg.norm(a_) * np.linalg.norm(b_))
            assert cos > 0.9999, cos

    def test_mixed_kind_rejected(self, rng):
        from bitnet_tpu.errors import QuantizationError
        from bitnet_tpu.ops.linear import dense_linear

        a = qk256_linear_from_codes(
            rng.integers(0, 4, (256, 128)).astype(np.uint8))
        d = dense_linear(rng.normal(size=(256, 128)).astype(np.float32))
        with pytest.raises(QuantizationError):
            concat_linears([a, d])


class TestFusedModelParity:
    def test_fused_forward_matches_unfused(self, mini_gguf_qk256):
        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        fused_params = dataclasses.replace(
            params, blocks=fuse_block_params(params.blocks))
        assert fused_params.blocks.wqkv is not None

        B, T, S = 1, 6, 16
        tok = jnp.asarray([[2, 100, 3, 50, 11, 7]], jnp.int32)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads,
                        cfg.head_dim), jnp.float32)

        outs = []
        for p in (params, fused_params):
            h, _, _, _, _ = forward(cfg, p, tok, pos, kc,
                                    jnp.zeros_like(kc),
                                    jnp.zeros(B, jnp.int32), T)
            outs.append(np.asarray(logits(cfg, p, h)))
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)

    def test_engine_fusion_flag(self, mini_gguf_f32):
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        on = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kv_cache_dtype="f32", compute_dtype="f32",
            fuse_projections=True))
        off = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kv_cache_dtype="f32", compute_dtype="f32",
            fuse_projections=False))
        # f32 mini model is dense → fusion concatenates dense weights
        a = on.generate([2, 7, 11], gen).token_ids
        b = off.generate([2, 7, 11], gen).token_ids
        assert a == b
