"""Ring attention: sequence-parallel exact attention via ppermute rotation.

The all-gather-KV path (parallel/sequence.py) materializes the full key
space on every device — right for GQA-sized KV up to ~100k tokens.  Ring
attention never does: each device holds one KV shard and the shards
*rotate* around the ICI ring while an online-softmax accumulator folds in
one shard per step.  Memory per device stays O(T/n); bandwidth cost is the
same KV bytes, but overlapped with compute by XLA (the ppermute of the
next shard runs while the current chunk's scores are on the MXU).

This is the natural TPU translation of blockwise/ring attention papers
(PAPERS.md) — and strictly more capable than the reference, which has no
sequence parallelism at all (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention_local(
    q: jnp.ndarray,             # [B, Tl, H, D]   local query chunk
    k: jnp.ndarray,             # [B, Tl, KV, D]  local key shard
    v: jnp.ndarray,             # [B, Tl, KV, D]
    q_positions: jnp.ndarray,   # [B, Tl] absolute positions of queries
    kv_positions: jnp.ndarray,  # [B, Tl] absolute positions of local keys
    axis_name: str,
) -> jnp.ndarray:
    """Exact causal GQA attention with the KV shards rotating the ring.

    Call inside shard_map with the sequence axis named ``axis_name``.
    Returns [B, Tl, H, D].
    """
    n = jax.lax.axis_size(axis_name)
    B, Tl, H, D = q.shape
    KV = k.shape[2]
    G = H // KV
    scale = jnp.float32(1.0 / (D ** 0.5))
    qf = q.astype(k.dtype).reshape(B, Tl, KV, G, D)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m, l, acc, kt, vt, kp = carry
        s = jnp.einsum("btkgd,bckd->bkgtc", qf, kt,
                       preferred_element_type=jnp.float32)
        s = s * scale
        mask = kp[:, None, :] <= q_positions[:, :, None]     # [B, Tl, c]
        s = jnp.where(mask[:, None, None, :, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bkgtc,bckd->bkgtd", p.astype(vt.dtype), vt,
            preferred_element_type=jnp.float32)
        # rotate the KV shard to the next device over ICI
        kt = jax.lax.ppermute(kt, axis_name, perm)
        vt = jax.lax.ppermute(vt, axis_name, perm)
        kp = jax.lax.ppermute(kp, axis_name, perm)
        return (m_new, l, acc, kt, vt, kp), None

    m0 = jnp.full((B, KV, G, Tl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, KV, G, Tl), jnp.float32)
    acc0 = jnp.zeros((B, KV, G, Tl, D), jnp.float32)
    (m, l, acc, _, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v, kv_positions), None, length=n)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.moveaxis(out, 3, 1).reshape(B, Tl, H, D).astype(q.dtype)


def ring_parallel_prefill(cfg, params, tokens: jnp.ndarray, mesh,
                          kernel_path: str = "xla"):
    """Sequence-sharded prefill with ring attention (drop-in alternative
    to sequence.sequence_parallel_prefill's all-gather-KV).

    tokens: [B, T], T divisible by the mesh size.  Returns
    (logits [B, T, V] seq-sharded, k_local, v_local).
    """
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..errors import ConfigError
    from ..models.bitnet import block_finish, block_qkv, embed_tokens
    from ..models.bitnet import logits as model_logits
    from ..ops.rmsnorm import rms_norm
    from .sequence import SEQ_AXIS

    B, T = tokens.shape
    n = mesh.shape[SEQ_AXIS]
    if T % n != 0:
        raise ConfigError(f"seq len {T} not divisible by {n} devices")
    positions = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS), P(None, SEQ_AXIS)),
        out_specs=(P(None, SEQ_AXIS),
                   P(None, None, SEQ_AXIS), P(None, None, SEQ_AXIS)),
        check_vma=False,
    )
    def run(prm, tok_local, pos_local):
        x = embed_tokens(prm, tok_local).astype(jnp.float32)

        def body(carry, bp):
            h_in = carry
            # SHIPPED block parameterization (fused wqkv + sub-norms)
            q, k, v = block_qkv(cfg, bp, h_in, prm.rope_sin, prm.rope_cos,
                                pos_local, kernel_path)
            attn = ring_attention_local(q, k, v, pos_local, pos_local,
                                        SEQ_AXIS)
            h_in = block_finish(cfg, bp, h_in, attn, kernel_path)
            return h_in, (k, v)

        x, (k_loc, v_loc) = jax.lax.scan(body, x, prm.blocks)
        x = rms_norm(x, prm.final_norm, cfg.rms_norm_eps)
        lg = model_logits(cfg, prm, x, kernel_path)
        return lg, k_loc, v_loc

    return run(params, tokens, positions)
