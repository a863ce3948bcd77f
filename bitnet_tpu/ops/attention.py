"""Attention (GQA, causal, KV-cache aware) — XLA path.

Functional equivalent of ``MultiHeadAttention::forward``
(``bitnet-transformer/src/lib.rs:275-520``): scale 1/sqrt(d), GQA expansion
of KV heads, causal masking, f32 softmax with max-subtraction.

TPU notes: the GQA "expansion" is done with a reshape of Q onto
[B, n_kv, group, T, D] so the K/V tensors are never materialized expanded
(the reference repeats KV in memory, ``lib.rs:410-424`` — wasteful on HBM).
XLA fuses mask+softmax into the matmuls; a fused flash/pallas variant for
long-context prefill lives in :mod:`bitnet_tpu.ops.flash`.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def attention(
    q: jnp.ndarray,          # [B, Tq, n_heads, D]
    k: jnp.ndarray,          # [B, S, n_kv, D]   (full cache buffer)
    v: jnp.ndarray,          # [B, S, n_kv, D]
    q_positions: jnp.ndarray,  # [B, Tq] absolute position of each query
    kv_valid_len: jnp.ndarray,  # [B] number of valid cache slots
    kv_positions: jnp.ndarray | None = None,  # [B, S] abs pos per slot
    window: int | None = None,                # sliding-window width
    extra_mask: jnp.ndarray | None = None,    # [B, Tq, S] pattern mask
) -> jnp.ndarray:
    """Causal GQA attention over a (possibly padded) KV buffer.

    Default layout: slot ``s`` holds absolute position ``s``; a key is
    attendable iff ``s < kv_valid_len`` and ``s <= q_position`` (causality).

    ``kv_positions`` overrides the slot→position identity for ring-buffer
    (windowed) caches: slot validity becomes ``kv_positions >= 0`` and
    causality uses the stored positions (``kv_valid_len`` is ignored).
    ``window`` adds a sliding-window constraint ``key_pos > q_pos - window``
    (reference sliding_window.rs:20-114). ``extra_mask`` ANDs an arbitrary
    pattern mask (dilated/global-local/block — ops.attention_patterns).

    Returns [B, Tq, n_heads, D].
    """
    B, Tq, H, D = q.shape
    S, KV = k.shape[1], k.shape[2]
    G = H // KV

    scale = jnp.float32(1.0 / (D ** 0.5))
    # keep the big KV operands in their stored dtype and let the MXU
    # accumulate in f32 — casting the whole [B, S, KV, D] cache to f32
    # materializes 2x its bytes per layer and dominated decode (measured
    # ~1 ms/token at S=1024 on v5e); bf16 inputs are exact in f32 products
    qc = q.astype(k.dtype).reshape(B, Tq, KV, G, D)

    # scores: [B, KV, G, Tq, S] in f32
    scores = jnp.einsum("btkgd,bskd->bkgts", qc, k,
                        preferred_element_type=jnp.float32) * scale

    if kv_positions is None:
        slot = jnp.arange(S, dtype=jnp.int32)
        key_pos = jnp.broadcast_to(slot[None, :], (B, S))          # [B, S]
        valid = slot[None, None, :] < kv_valid_len[:, None, None]  # [B,1→Tq,S]
    else:
        key_pos = kv_positions
        valid = (key_pos >= 0)[:, None, :]                          # [B, 1, S]
    causal = key_pos[:, None, :] <= q_positions[:, :, None]        # [B, Tq, S]
    mask = causal & valid
    if window is not None:
        mask &= key_pos[:, None, :] > q_positions[:, :, None] - window
    if extra_mask is not None:
        mask &= extra_mask
    mask = mask[:, None, None, :, :]                                # [B,1,1,Tq,S]
    scores = jnp.where(mask, scores, NEG_INF)

    # numerically-stable softmax (max-subtract like the reference :492)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    # cast the (tiny) probabilities to V's dtype rather than V (huge) to
    # f32; f32 caches keep exact f32 math
    out = jnp.einsum("bkgts,bskd->btkgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Tq, H, D).astype(q.dtype)
