"""Sequence parallelism: shard the *token* axis of prefill over devices.

The reference has NO sequence/context parallelism (SURVEY.md §5 confirms —
only single-device sliding-window machinery).  This is the TPU-native
addition: long-context prefill splits the sequence across the mesh, each
device computes its token chunk's Q/K/V, and attention reads the full key
space via ``all_gather`` over ICI.

Why all-gather-KV instead of ring attention for BitNet b1.58: with GQA
(5 KV heads × 128 dims) the per-token KV is 1.25 KB — an 8-way all-gather
of a 32k-token prefill moves ~40 MB per layer, far below ICI bandwidth,
and XLA overlaps it with the block's matmuls.  A ppermute ring becomes
worthwhile only at ~1M-token contexts; the mask logic below already
supports it (attention masks by absolute position, not slot).

Usage: wrap in jit with a mesh; tokens/positions sharded [B, T/dev] via
``P(None, "seq")``; output logits come back sequence-sharded the same way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..errors import ConfigError

SEQ_AXIS = "seq"


def make_seq_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


def sequence_parallel_prefill(
    cfg: ModelConfig,
    params,
    tokens: jnp.ndarray,        # [B, T] (T divisible by mesh size)
    mesh: Mesh,
    kernel_path: str = "xla",
):
    """Sequence-sharded prefill; returns (logits [B, T, V], k [L,B,T,KV,D],
    v) with logits/keys sequence-sharded on the mesh.

    Each device runs the full layer stack on its T/n token chunk; inside
    attention the K/V for *all* chunks are all-gathered so causal masking
    by absolute position sees the complete prefix.
    """
    from ..models.bitnet import block_finish, block_qkv, embed_tokens
    from ..models.bitnet import logits as model_logits
    from ..ops.attention import attention
    from ..ops.rmsnorm import rms_norm

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
        Tl = x.shape[1]

        def body(carry, bp):
            h_in = carry
            # projections + RoPE via the SHIPPED block parameterization
            # (fused wqkv + 2B-4T sub-norms included) — models.bitnet
            # block_qkv/block_finish are the same code block_forward runs
            q, k, v = block_qkv(cfg, bp, h_in, prm.rope_sin, prm.rope_cos,
                                pos_local, kernel_path)

            # gather the full key space over ICI: [B, T, nkv, D]
            k_all = jax.lax.all_gather(k, SEQ_AXIS, axis=1, tiled=True)
            v_all = jax.lax.all_gather(v, SEQ_AXIS, axis=1, tiled=True)
            pos_all = jax.lax.all_gather(pos_local, SEQ_AXIS, axis=1,
                                         tiled=True)

            attn = attention(
                q, k_all, v_all, pos_local,
                kv_valid_len=jnp.full((B,), Tl * n, jnp.int32),
                kv_positions=pos_all)
            h_in = block_finish(cfg, bp, h_in, attn, kernel_path)
            return h_in, (k, v)

        x, (k_loc, v_loc) = jax.lax.scan(body, x, prm.blocks)
        x = rms_norm(x, prm.final_norm, cfg.rms_norm_eps)
        lg = model_logits(cfg, prm, x, kernel_path)
        return lg, k_loc, v_loc

    return run(params, tokens, positions)
