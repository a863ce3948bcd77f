"""Windowed (ring-buffer) KV cache for sliding-window attention.

TPU-native rebuild of the reference's ``WindowedKVCache``
(``bitnet-gpu-hal/src/sliding_window.rs:238-441``): instead of shifting /
evicting entries, the cache is a fixed ``[L, B, W, KV, D]`` ring buffer —
token at absolute position ``p`` lives at slot ``p % W``, and a
``positions [B, W]`` array records each slot's true position so attention
masks by *position*, not slot index.  Everything is static-shape and
in-place under jit, so unbounded-length generation runs at constant HBM.

Memory: a 2B model with W=4096 needs the same cache as max_seq_len=4096
but serves arbitrarily long streams (the reference instead truncates
keep-half at overflow, ``bitnet-inference/src/engine.rs:1222-1227``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .cache import _DTYPES


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "positions", "lengths", "k_scale", "v_scale"],
    meta_fields=["window", "quantized"],
)
@dataclasses.dataclass
class WindowedKVCache:
    """k/v: [L, B, W, KV, D]; positions: [B, W] absolute pos (-1 = empty);
    lengths: [B] total tokens ever written (not capped at W)."""

    k: jnp.ndarray
    v: jnp.ndarray
    positions: jnp.ndarray
    lengths: jnp.ndarray
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None
    window: int = 0
    quantized: bool = False

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def allocate_windowed_cache(
    cfg: ModelConfig,
    batch_size: int,
    window: int,
    dtype: str = "bf16",
) -> WindowedKVCache:
    L, KV, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    jdtype = _DTYPES[dtype]
    quantized = dtype in ("int8", "fp8")
    zeros = jnp.zeros((L, batch_size, window, KV, D), jdtype)
    scale_shape = (L, batch_size, window, KV)
    return WindowedKVCache(
        k=zeros,
        v=jnp.zeros_like(zeros),
        positions=jnp.full((batch_size, window), -1, jnp.int32),
        lengths=jnp.zeros((batch_size,), jnp.int32),
        k_scale=jnp.ones(scale_shape, jnp.float32) if quantized else None,
        v_scale=jnp.ones(scale_shape, jnp.float32) if quantized else None,
        window=window,
        quantized=quantized,
    )


def reset_windowed_cache(cache: WindowedKVCache) -> WindowedKVCache:
    """Logical reset: positions back to -1 (attention's slot-validity
    test is ``positions >= 0``, so stale entries MUST be invalidated —
    lengths alone don't gate windowed reads) and lengths to 0."""
    return dataclasses.replace(
        cache,
        positions=jnp.full_like(cache.positions, -1),
        lengths=jnp.zeros_like(cache.lengths),
    )


def forward_windowed(
    cfg: ModelConfig,
    params,
    tokens: jnp.ndarray,          # [B, T]
    q_positions: jnp.ndarray,     # [B, T]; padded slots hold pad_marker
    cache: WindowedKVCache,
    num_real_tokens: jnp.ndarray | int | None = None,
    kernel_path: str = "xla",
    pad_marker: int | None = None,  # q_position value marking padding
):
    """Sliding-window forward: write at ``pos % W``, attend by true position.

    Returns (hidden [B, T, H], new_cache).  Queries at ``pad_marker`` (the
    engine's OOB padding convention) neither write nor affect lengths.
    """
    from ..models.bitnet import forward
    from ..errors import InferenceError

    W = cache.window
    if tokens.shape[1] > W:
        # two tokens at positions p and p+W would scatter to the SAME ring
        # slot in one call, and duplicate-index .at[].set order is
        # unspecified in JAX — both the KV rows and the positions mask
        # could silently keep the stale token.  Long prefills must be
        # chunked to ≤ window tokens per call (the engine's prefill
        # bucketing does this naturally when max bucket ≤ W).
        raise InferenceError(
            f"forward_windowed got {tokens.shape[1]} tokens > window {W}; "
            f"chunk the prefill into ≤{W}-token calls")
    if num_real_tokens is None:
        num_real_tokens = tokens.shape[1]

    if pad_marker is not None:
        real = q_positions != pad_marker
        slots = jnp.where(real, q_positions % W, W)  # W = OOB → drop
    else:
        slots = q_positions % W
    b_idx = jnp.arange(tokens.shape[0], dtype=jnp.int32)[:, None]
    positions = cache.positions.at[b_idx, slots].set(
        q_positions, mode="drop")

    h, k, v, ks, vs = forward(
        cfg, params, tokens, q_positions, cache.k, cache.v, cache.lengths,
        num_real_tokens, kernel_path, cache.k_scale, cache.v_scale,
        write_slots=slots, kv_positions=positions, window=W,
    )
    new_cache = dataclasses.replace(
        cache, k=k, v=v, k_scale=ks, v_scale=vs, positions=positions,
        lengths=cache.lengths + jnp.asarray(num_real_tokens, jnp.int32),
    )
    return h, new_cache
