"""Fused single-token (decode) attention Pallas kernel (flash-decode).

Decode attention at T=1 is dominated not by FLOPs but by XLA op dispatch:
the unfused path (ops/attention.py) is ~12 separate fusions per layer —
two cache-sized einsums, mask build, select, max/exp/sum/div, casts — and
round-1 profiling measured ~37 µs/layer of fixed overhead at S≤1024 (the
cache *bytes* only cost ~3 µs).  This kernel collapses the whole thing
into ONE Pallas call per layer.

Design notes (hardware-validated on v5e):
- the cache rides in as a FREE reshape to [B, S, KV*D] so per-head slices
  are 128-aligned lane selections — a (1, S, KV, D) block would pad the
  KV=5 head axis onto 8 sublanes and stride every row;
- the sequence axis is CHUNKED over the grid with online-softmax
  accumulators in VMEM scratch (flash-decode), so Pallas double-buffers
  the K/V streams across grid steps even at B=1;
- the NEW token's k/v is folded into the accumulator init, so the
  KV-cache scatter stays off the critical path and the kernel reads the
  cache read-only (no full-block write-back).

Reference: the 6-backend attention kernel family
(``bitnet-kernels/src/cpu/attention.rs``, ``bitnet_kernels.cu``) — this is
the TPU translation of its fused SDPA decode path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# sequence-chunk width (grid steps double-buffer the K/V DMA)
DEFAULT_CHUNK = 256


def _decode_attn_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                        out_ref, m_scr, d_scr, ctx_scr,
                        *, scale: float, n_kv: int, G: int, D: int,
                        chunk: int, n_chunks: int):
    b = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[b, 0]

    @pl.when(c == 0)
    def _():
        # accumulators start from the NEW token: m = s_new, denom = 1,
        # ctx = v_new (their e-weight is exp(0) = 1)
        for h in range(n_kv):
            q = q_ref[0, h]                               # [G, D]
            kn = kn_ref[0, :, pl.ds(h * D, D)]            # [1, D]
            s_new = jnp.sum(
                q.astype(jnp.float32) * kn.astype(jnp.float32),
                axis=1, keepdims=True) * scale            # [G, 1]
            m_scr[pl.ds(h * G, G), :] = s_new
            d_scr[pl.ds(h * G, G), :] = jnp.ones((G, 1), jnp.float32)
            ctx_scr[pl.ds(h * G, G), :] = jnp.broadcast_to(
                vn_ref[0, :, pl.ds(h * D, D)].astype(jnp.float32), (G, D))

    base = c * chunk
    for h in range(n_kv):
        q = q_ref[0, h]                                   # [G, D]
        kc = k_ref[0, :, pl.ds(h * D, D)]                 # [chunk, D]
        vc = v_ref[0, :, pl.ds(h * D, D)]                 # [chunk, D]
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [G, chunk]
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (G, chunk), 1)
        s = jnp.where(idx < pos, s, NEG_INF)

        m_old = m_scr[pl.ds(h * G, G), :]                 # [G, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)                    # [G, 1]
        e = jnp.exp(s - m_new)                            # [G, chunk]
        m_scr[pl.ds(h * G, G), :] = m_new
        d_scr[pl.ds(h * G, G), :] = (
            d_scr[pl.ds(h * G, G), :] * alpha
            + jnp.sum(e, axis=-1, keepdims=True))
        ctx_scr[pl.ds(h * G, G), :] = (
            ctx_scr[pl.ds(h * G, G), :] * alpha
            + jax.lax.dot_general(
                e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))

    @pl.when(c == n_chunks - 1)
    def _():
        for h in range(n_kv):
            ctx = ctx_scr[pl.ds(h * G, G), :] / d_scr[pl.ds(h * G, G), :]
            out_ref[0, h] = ctx.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]      (post-RoPE)
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D]   (PRE-write: new row not needed)
    v_cache: jnp.ndarray,   # [B, S, KV, D]
    pos: jnp.ndarray,       # [B] int32: #valid cache slots / query position
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused causal GQA attention for one decode step.

    Equivalent to ``attention(q[:,None], cache_after_write, ...)[:, 0]``
    with slot ``pos`` holding the new token.  Returns [B, n_heads, D].
    """
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(B, S, KV * D)       # free reshape (row-major)
    vcv = v_cache.reshape(B, S, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    chunk = min(DEFAULT_CHUNK, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    grid = (B, n_chunks)
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, chunk=chunk,
                          n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV * D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV * D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running max
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running denom
            pltpu.VMEM((KV * G, D), jnp.float32),    # running context
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)
