"""BitNet 2B-4T sub-layernorm tests.

The reference only maps attn_sub_norm/ffn_sub_norm tensor names
(weight_mapper.rs:260-270) and never applies them; the real 2B-4T model
requires them — our forward applies them and must match the (also
patched) golden numpy model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
from bitnet_tpu.models import forward, load_model, logits
from bitnet_tpu.verify.reference import compare_logits, reference_forward


@pytest.fixture(scope="module")
def sub_norm_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "subnorm.gguf"
    return generate_mini_gguf(str(path), MiniModelSpec(quant="f32",
                                                       sub_norm=True))


def run_jax(cfg, params, tokens):
    B, T, S = 1, len(tokens), 64
    tok = jnp.asarray([tokens], jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
                   jnp.float32)
    h, *_ = forward(cfg, params, tok, pos, kc, jnp.zeros_like(kc),
                    jnp.zeros(B, jnp.int32), T)
    return np.asarray(logits(cfg, params, h))[0]


class TestSubNorm:
    def test_loader_picks_up_sub_norms(self, sub_norm_model):
        cfg, params, report = load_model(sub_norm_model.path,
                                         param_dtype=jnp.float32)
        assert params.blocks.attn_sub_norm is not None
        assert params.blocks.ffn_sub_norm is not None
        assert cfg.use_sub_norm
        assert params.blocks.attn_sub_norm.shape == (
            cfg.num_layers, cfg.num_heads * cfg.head_dim)
        assert params.blocks.ffn_sub_norm.shape == (
            cfg.num_layers, cfg.intermediate_size)

    def test_forward_matches_golden(self, sub_norm_model):
        cfg, params, _ = load_model(sub_norm_model.path,
                                    param_dtype=jnp.float32)
        tokens = [1, 5, 9, 200, 43]
        ours = run_jax(cfg, params, tokens)
        golden = reference_forward(cfg, sub_norm_model.weights, tokens)
        res = compare_logits(ours, golden, threshold=0.99)
        assert res["passed"], res
        assert res["min_cosine"] > 0.9999

    def test_sub_norm_changes_logits(self, sub_norm_model, tmp_path):
        """Dropping the sub-norms must change the output — proves they are
        actually applied, not silently ignored."""
        import dataclasses

        cfg, params, _ = load_model(sub_norm_model.path,
                                    param_dtype=jnp.float32)
        stripped = dataclasses.replace(
            params, blocks=dataclasses.replace(
                params.blocks, attn_sub_norm=None, ffn_sub_norm=None))
        tokens = [1, 5, 9]
        a = run_jax(cfg, params, tokens)
        b = run_jax(cfg, stripped, tokens)
        assert not np.allclose(a, b)

    def test_without_sub_norm_unchanged(self, mini_gguf_f32):
        """Plain models keep bit-identical behavior (fields stay None)."""
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        assert params.blocks.attn_sub_norm is None
        assert not cfg.use_sub_norm
