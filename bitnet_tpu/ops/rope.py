"""Rotary position embeddings (RoPE), LLaMA split layout.

Parity with the reference (``bitnet-transformer/src/lib.rs:134-183`` and
``crates/bitnet-rope/src/lib.rs:15-59``): SPLIT (non-interleaved) layout —
``x = [r_0..r_{d/2-1}, i_0..i_{d/2-1}]`` — with
``inv_freq_j = base^(-2j/d)``.

Tables are precomputed once per model in f32 and indexed by absolute
position; everything is static-shape/jit friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_rope_tables(
    head_dim: int, max_seq_len: int, base: float = 10000.0
) -> tuple[np.ndarray, np.ndarray]:
    """Precompute (sin, cos) tables of shape [max_seq_len, head_dim//2]."""
    if head_dim % 2 != 0:
        raise ValueError(f"head_dim must be even for RoPE, got {head_dim}")
    half = head_dim // 2
    inv_freq = base ** (-np.arange(0, half, dtype=np.float64) * 2.0 / head_dim)
    t = np.arange(max_seq_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [S, half]
    return np.sin(freqs).astype(np.float32), np.cos(freqs).astype(np.float32)


def apply_rope(
    x: jnp.ndarray,
    sin: jnp.ndarray,
    cos: jnp.ndarray,
    positions: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate ``x`` at absolute ``positions``.

    x:         [B, T, n_heads, head_dim]
    sin/cos:   [max_seq_len, head_dim//2] tables, OR pre-gathered
               [B, T, 1, head_dim//2] rows (positions then ignored —
               the decode scan gathers ONCE for all layers instead of
               30 redundant per-layer table lookups)
    positions: [B, T] int32 absolute positions
    """
    half = x.shape[-1] // 2
    if sin.ndim == 2:
        s = sin[positions][:, :, None, :]  # [B, T, 1, half]
        c = cos[positions][:, :, None, :]
    else:
        s, c = sin, cos
    x0 = x[..., :half].astype(jnp.float32)
    x1 = x[..., half:].astype(jnp.float32)
    r0 = x0 * c - x1 * s
    r1 = x0 * s + x1 * c
    return jnp.concatenate([r0, r1], axis=-1).astype(x.dtype)
