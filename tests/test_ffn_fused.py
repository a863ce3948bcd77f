"""Fused W2A8 FFN kernel vs the unfused reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.ops.ffn_fused import ffn_fused_supported, ffn_w2a8_fused
from bitnet_tpu.ops.linear import concat_linears, qk256_linear_from_codes
from bitnet_tpu.quant.ternary import LUT_SYM


def _build(rng, K=256, F=512, H=256):
    codes_g = rng.integers(0, 4, size=(K, F)).astype(np.uint8)
    codes_u = rng.integers(0, 4, size=(K, F)).astype(np.uint8)
    codes_d = rng.integers(0, 4, size=(F, H)).astype(np.uint8)
    gu = concat_linears([qk256_linear_from_codes(codes_g, 0.05),
                         qk256_linear_from_codes(codes_u, 0.04)])
    down = qk256_linear_from_codes(codes_d, 0.03)
    return gu, down, codes_g, codes_u, codes_d


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _ref(x, codes_g, codes_u, codes_d, sg, su, sd):
    """Float reference (per-tile act-quant noise is tested via cosine)."""
    g = (x @ LUT_SYM[codes_g]) * sg
    u = (x @ LUT_SYM[codes_u]) * su
    return (_silu(g) * u) @ LUT_SYM[codes_d] * sd


class TestFFNFused:
    @pytest.mark.parametrize("M", [1, 4, 16])
    def test_cosine_vs_float_reference(self, rng, M):
        K, F, H = 256, 512, 256
        gu, down, cg, cu, cd = _build(rng, K, F, H)
        x = rng.standard_normal((M, K)).astype(np.float32) * 0.5
        y = np.asarray(ffn_w2a8_fused(
            jnp.asarray(x), gu.packed, gu.scales, down.packed, down.scales,
            k_dim=K, f_dim=F, n_dim=H, interpret=True)).astype(np.float64)
        ref = _ref(x.astype(np.float64), cg, cu, cd, 0.05, 0.04, 0.03)
        for m in range(M):
            cos = y[m] @ ref[m] / (np.linalg.norm(y[m])
                                   * np.linalg.norm(ref[m]) + 1e-30)
            assert cos > 0.999, (m, cos)

    def test_matches_unfused_w2a8_closely(self, rng):
        """Same inputs through linear_apply(w2a8) twice — per-tile vs
        per-row activation quantization differ at int8-noise level only."""
        from bitnet_tpu.ops.linear import linear_apply

        K, F, H = 256, 1024, 256
        gu, down, *_ = _build(rng, K, F, H)
        x = jnp.asarray(rng.standard_normal((2, K)) * 0.5, jnp.float32)
        y_f = np.asarray(ffn_w2a8_fused(
            x, gu.packed, gu.scales, down.packed, down.scales,
            k_dim=K, f_dim=F, n_dim=H, interpret=True)).astype(np.float64)
        guv = np.asarray(linear_apply(gu, x, "w2a8")).astype(np.float64)
        act = _silu(guv[:, :F]) * guv[:, F:]
        y_u = np.asarray(linear_apply(
            down, jnp.asarray(act, jnp.float32), "w2a8")).astype(np.float64)
        for m in range(2):
            cos = y_f[m] @ y_u[m] / (np.linalg.norm(y_f[m])
                                     * np.linalg.norm(y_u[m]) + 1e-30)
            assert cos > 0.999, cos

    def test_supported_gates(self, rng):
        gu, down, *_ = _build(rng)
        assert ffn_fused_supported(gu, down, 512, 1)
        assert not ffn_fused_supported(None, down, 512, 1)
        assert not ffn_fused_supported(gu, down, 512, 100)   # M too big
        assert not ffn_fused_supported(gu, down, 100, 1)     # F % 256

    def test_model_forward_uses_fused_path(self, rng, monkeypatch):
        """End-to-end: a synthetic 256-F model decodes identically-ish
        (cosine) via the fused FFN vs the xla path."""
        monkeypatch.setenv("BITNET_FUSED_FFN", "1")
        from bitnet_tpu.config import ModelConfig
        from bitnet_tpu.models.bitnet import (
            BitNetParams,
            BlockParams,
            forward,
            fuse_block_params,
            logits as model_logits,
        )
        from bitnet_tpu.ops.rope import build_rope_tables

        cfg = ModelConfig(vocab_size=128, hidden_size=256,
                          intermediate_size=512, num_layers=2, num_heads=2,
                          num_kv_heads=2, head_dim=128, max_seq_len=64)
        L, H, F, V = 2, 256, 512, 128

        def lin_stack(k, n, scale):
            import jax.numpy as jnp

            from bitnet_tpu.ops.linear import TernaryLinear
            kp = -(-k // 256) * 256
            npad = -(-n // 128) * 128
            packed = jnp.asarray(rng.integers(
                np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                size=(L, kp // 16, npad), dtype=np.int32))
            return TernaryLinear(kind="qk256", k=k, n=n, packed=packed,
                                 scales=jnp.full((L,), scale, jnp.float32))

        blocks = fuse_block_params(BlockParams(
            attn_norm=jnp.ones((L, H), jnp.float32),
            wq=lin_stack(H, 256, 0.05), wk=lin_stack(H, 256, 0.05),
            wv=lin_stack(H, 256, 0.05), wo=lin_stack(256, H, 0.05),
            ffn_norm=jnp.ones((L, H), jnp.float32),
            w_gate=lin_stack(H, F, 0.05), w_up=lin_stack(H, F, 0.05),
            w_down=lin_stack(F, H, 0.05)))
        sin, cos_t = build_rope_tables(128, 64, 10000.0)
        params = BitNetParams(
            embed=jnp.asarray(rng.standard_normal((V, H)) * 0.05,
                              jnp.float32),
            blocks=blocks, final_norm=jnp.ones((H,), jnp.float32),
            lm_head=None, rope_sin=jnp.asarray(sin),
            rope_cos=jnp.asarray(cos_t))

        S = 16
        kc = jnp.zeros((L, 1, S, 2, 128), jnp.float32)
        tok = jnp.asarray([[5]], jnp.int32)
        pos = jnp.zeros((1, 1), jnp.int32)
        outs = {}
        for kp_path in ("xla", "w2a8"):
            h, _, _, _, _ = forward(cfg, params, tok, pos, kc,
                                    jnp.zeros_like(kc),
                                    jnp.zeros((1,), jnp.int32), 1, kp_path)
            outs[kp_path] = np.asarray(
                model_logits(cfg, params, h, kp_path)[0, 0]).astype(
                np.float64)
        a, b = outs["w2a8"], outs["xla"]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.99, cos
