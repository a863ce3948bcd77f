"""Fused decode-attention kernel vs the XLA attention path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.ops.attention import attention
from bitnet_tpu.ops.decode_attention import decode_attention


@pytest.mark.parametrize("B,S,H,KV,D,pos", [
    (1, 64, 8, 2, 128, 17),
    (2, 128, 4, 4, 128, 63),   # MHA (G=1), different batch rows
    (3, 32, 8, 2, 128, 0),     # empty cache: only the new token
])
def test_matches_xla_attention(rng, B, S, H, KV, D, pos):
    k_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    positions = jnp.full((B,), pos, jnp.int32)

    out = decode_attention(q, k_new, v_new, k_cache, v_cache, positions,
                           interpret=True)

    # reference: write the new token at slot pos, run the XLA path
    b = jnp.arange(B)[:, None]
    kc = k_cache.at[b, positions[:, None]].set(k_new[:, None][:, 0][:, None])
    vc = v_cache.at[b, positions[:, None]].set(v_new[:, None][:, 0][:, None])
    ref = attention(q[:, None], kc, vc, positions[:, None], positions + 1
                    )[:, 0]
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_ragged_positions(rng):
    B, S, H, KV, D = 4, 64, 8, 4, 128
    k_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    positions = jnp.asarray([0, 5, 31, 63], jnp.int32)

    out = decode_attention(q, k_new, v_new, k_cache, v_cache, positions,
                           interpret=True)
    b = jnp.arange(B)[:, None]
    kc = k_cache.at[b, positions[:, None]].set(k_new[:, None][:, 0][:, None])
    vc = v_cache.at[b, positions[:, None]].set(v_new[:, None][:, 0][:, None])
    ref = attention(q[:, None], kc, vc, positions[:, None], positions + 1
                    )[:, 0]
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_engine_decode_uses_fused_path(mini_gguf_qk256):
    """Greedy decode via kernel_path='pallas' (fused attention, interpret)
    matches the XLA path on CPU within bf16 tolerance."""
    from bitnet_tpu.config import EngineConfig, GenerationConfig
    from bitnet_tpu.engine import InferenceEngine
    from bitnet_tpu.models import load_model

    cfg, params, _ = load_model(mini_gguf_qk256.path,
                                param_dtype=jnp.float32)
    gen = GenerationConfig(max_new_tokens=6, greedy=True)
    outs = {}
    for kp in ("xla", "pallas"):
        eng = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kernel_path=kp))
        outs[kp] = eng.generate([1, 7, 20], gen).token_ids
    assert outs["pallas"] == outs["xla"]
