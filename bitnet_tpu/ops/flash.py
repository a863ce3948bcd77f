"""Memory-bounded attention for long-context prefill (online softmax).

The dense path (ops/attention.py) materializes [B, KV, G, Tq, S] scores —
at 4k×4k with 20 heads that is gigabytes of HBM per layer.  This module
computes identical results in O(Tq · chunk) memory by scanning KV chunks
with the online-softmax recurrence (the flash-attention algorithm), as a
``lax.scan`` XLA fuses into a tight loop on the VPU/MXU.

Replaces the memory half of the reference's long-context machinery
(sliding_window.rs / context_window.rs compression) with the exact
computation instead of approximations; composes with sliding windows via
the same positional masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("chunk", "window"))
def flash_attention(
    q: jnp.ndarray,             # [B, Tq, H, D]
    k: jnp.ndarray,             # [B, S, KV, D]
    v: jnp.ndarray,             # [B, S, KV, D]
    q_positions: jnp.ndarray,   # [B, Tq]
    kv_valid_len: jnp.ndarray,  # [B]
    chunk: int = 512,
    window: int | None = None,
) -> jnp.ndarray:
    """Causal GQA attention, KV scanned in ``chunk``-sized tiles.

    Bit-compatible (up to fp addition order) with ops.attention for the
    default slot==position layout.  Returns [B, Tq, H, D] in q.dtype.
    """
    B, Tq, H, D = q.shape
    S, KV = k.shape[1], k.shape[2]
    G = H // KV
    pad = (-S) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = k.shape[1] // chunk

    scale = jnp.float32(1.0 / (D ** 0.5))
    # KV stays in its stored dtype; MXU accumulates f32 (see ops.attention)
    qf = q.astype(k.dtype).reshape(B, Tq, KV, G, D)
    kc = k.reshape(B, n_chunks, chunk, KV, D)
    vc = v.reshape(B, n_chunks, chunk, KV, D)
    # scan over the chunk axis
    kc = jnp.moveaxis(kc, 1, 0)          # [n, B, chunk, KV, D]
    vc = jnp.moveaxis(vc, 1, 0)

    def body(carry, xs):
        m, l, acc, idx = carry           # running max/denominator/numerator
        kt, vt = xs                      # [B, chunk, KV, D]
        s = jnp.einsum("btkgd,bckd->bkgtc", qf, kt,
                       preferred_element_type=jnp.float32) * scale
        slot = idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        causal = slot[None, None, :] <= q_positions[:, :, None]
        valid = slot[None, None, :] < kv_valid_len[:, None, None]
        mask = causal & valid
        if window is not None:
            mask &= slot[None, None, :] > q_positions[:, :, None] - window
        s = jnp.where(mask[:, None, None, :, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))          # [B,KV,G,Tq]
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])                    # [B,KV,G,Tq,c]
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bkgtc,bckd->bkgtd", p.astype(vt.dtype), vt,
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new, idx + 1), None

    m0 = jnp.full((B, KV, G, Tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, KV, G, Tq), jnp.float32)
    acc0 = jnp.zeros((B, KV, G, Tq, D), jnp.float32)
    (m, l, acc, _), _ = jax.lax.scan(
        body, (m0, l0, acc0, jnp.int32(0)), (kc, vc))
    out = acc / jnp.maximum(l, 1e-30)[..., None]             # [B,KV,G,Tq,D]
    out = jnp.moveaxis(out, 3, 1).reshape(B, Tq, H, D)
    return out.astype(q.dtype)
