"""Fully on-device decode loops.

The reference's decode loop syncs with the host every token
(``engine.rs:1076-1231``).  On TPU that sync costs more than the compute
for small models, so the hot path here is a ``lax.while_loop`` that runs
entirely on device: sample → append → forward → repeat, with the KV cache
as loop carry.  The host only sees the final token buffer (and can stream
in chunks by running the loop in segments).

Used by: greedy/sampled generation fast path, the benchmark harness, and
speculative decoding's verify loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.bitnet import BitNetParams, forward, logits as model_logits


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "kernel_path", "temperature"),
    donate_argnums=(2, 3),
)
def decode_loop(
    cfg: ModelConfig,
    params: BitNetParams,
    k_cache: jnp.ndarray,        # [L, B, S, KV, D]
    v_cache: jnp.ndarray,
    first_token: jnp.ndarray,    # [B] token sampled from prefill logits
    start_pos: jnp.ndarray,      # [B] position of first_token
    n_steps: int,
    key: jax.Array,
    eos_id: int = -1,
    kernel_path: str = "xla",
    temperature: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate ``n_steps`` tokens on device.

    Returns (tokens [B, n_steps], k_cache, v_cache).  Greedy when
    ``temperature == 0``.  Generation continues past EOS (host trims) so
    shapes stay static; ``eos_id`` freezes a finished row's token to keep
    caches consistent.
    """
    B = first_token.shape[0]
    S = k_cache.shape[2]
    out = jnp.zeros((B, n_steps), jnp.int32)

    def body(i, carry):
        tok, pos, kc, vc, out, key, done = carry
        out = out.at[:, i].set(tok)
        # forward one token at current positions
        positions = jnp.where(done | (pos >= S), S, pos)[:, None]
        h, kc, vc, _, _ = forward(
            cfg, params, tok[:, None], positions, kc, vc, pos,
            num_real_tokens=jnp.where(done, 0, 1).astype(jnp.int32),
            kernel_path=kernel_path,
        )
        lg = model_logits(cfg, params, h, kernel_path)[:, 0, :]
        if temperature > 0.0:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, lg / temperature, axis=-1)
            nxt = nxt.astype(jnp.int32)
        else:
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        done = done | (nxt == eos_id)
        nxt = jnp.where(done, jnp.maximum(eos_id, 0), nxt)
        return nxt, pos + 1, kc, vc, out, key, done

    init = (first_token.astype(jnp.int32), start_pos.astype(jnp.int32),
            k_cache, v_cache, out, key, jnp.zeros((B,), bool))
    tok, pos, kc, vc, out, key, done = jax.lax.fori_loop(
        0, n_steps, body, init)
    return out, kc, vc
