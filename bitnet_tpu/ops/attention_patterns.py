"""Sparse/structured attention pattern masks.

TPU-native equivalent of the reference's attention-pattern machinery
(``bitnet-gpu-hal/src/attention_patterns.rs:54-536`` Dense/Causal/Sliding/
Sparse/Block and ``src/sliding_window.rs:81-238`` dilated / Longformer-style
global-local masks).  Here a pattern is a pure function from (query
positions, key positions) to a boolean mask, composed into the XLA
attention via ``ops.attention(extra_mask=...)`` — XLA fuses the mask into
the softmax, so a pattern costs nothing extra on the MXU.

All builders are shape-polymorphic and jit-safe (no data-dependent shapes).
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class PatternKind(enum.Enum):
    DENSE = "dense"                  # every key (no causality!)
    CAUSAL = "causal"                # key_pos <= q_pos
    SLIDING_WINDOW = "sliding_window"  # causal ∧ key > q - window
    DILATED = "dilated"              # causal ∧ (q - key) % rate == 0, within span
    GLOBAL_LOCAL = "global_local"    # causal ∧ (local window ∨ global keys)
    BLOCK_SPARSE = "block_sparse"    # causal ∧ same-or-earlier block stride


@dataclasses.dataclass(frozen=True)
class AttentionPattern:
    """Declarative pattern spec (reference attention_patterns.rs:54).

    - ``window``:   local span for SLIDING_WINDOW / DILATED / GLOBAL_LOCAL
    - ``rate``:     dilation rate for DILATED (1 == plain sliding window)
    - ``num_global``: first N absolute positions attendable by everyone
      (Longformer-style global tokens, sliding_window.rs:161)
    - ``block_size``/``stride``: BLOCK_SPARSE — a query in block ``i``
      attends keys in blocks ``i, i-stride, i-2*stride, ...`` plus block 0
    """

    kind: PatternKind = PatternKind.CAUSAL
    window: int = 0
    rate: int = 1
    num_global: int = 0
    block_size: int = 64
    stride: int = 1


def pattern_mask(
    pattern: AttentionPattern,
    q_positions: jnp.ndarray,    # [B, Tq] absolute query positions
    key_positions: jnp.ndarray,  # [B, S] absolute key positions (-1 = hole)
) -> jnp.ndarray:
    """Boolean [B, Tq, S] mask: True where attention is allowed.

    Invalid key slots (position < 0) are always masked.  Causality is
    baked into every kind except DENSE.
    """
    qp = q_positions[:, :, None].astype(jnp.int32)   # [B, Tq, 1]
    kp = key_positions[:, None, :].astype(jnp.int32)  # [B, 1, S]
    valid = kp >= 0
    causal = (kp <= qp) & valid
    kind = pattern.kind

    if kind == PatternKind.DENSE:
        return valid & jnp.ones_like(causal)
    if kind == PatternKind.CAUSAL:
        return causal
    if kind == PatternKind.SLIDING_WINDOW:
        return causal & (kp > qp - pattern.window)
    if kind == PatternKind.DILATED:
        dist = qp - kp
        span = pattern.window * pattern.rate
        return causal & (dist < span) & (dist % pattern.rate == 0)
    if kind == PatternKind.GLOBAL_LOCAL:
        local = kp > qp - pattern.window
        global_keys = kp < pattern.num_global
        return causal & (local | global_keys)
    if kind == PatternKind.BLOCK_SPARSE:
        qb = qp // pattern.block_size
        kb = kp // pattern.block_size
        diff = qb - kb
        hit = (diff % pattern.stride == 0) | (kb == 0)
        return causal & hit
    raise ValueError(f"unknown pattern kind {kind!r}")


def effective_kv_footprint(pattern: AttentionPattern, seq_len: int) -> int:
    """Upper bound on keys a single query can see — sizing windowed caches
    (reference context_window.rs budget heuristics)."""
    if pattern.kind in (PatternKind.DENSE, PatternKind.CAUSAL):
        return seq_len
    if pattern.kind == PatternKind.SLIDING_WINDOW:
        return min(pattern.window, seq_len)
    if pattern.kind == PatternKind.DILATED:
        return min(pattern.window, seq_len)
    if pattern.kind == PatternKind.GLOBAL_LOCAL:
        return min(pattern.window + pattern.num_global, seq_len)
    if pattern.kind == PatternKind.BLOCK_SPARSE:
        blocks = -(-seq_len // pattern.block_size)
        hit = -(-blocks // pattern.stride) + 1
        return min(hit * pattern.block_size, seq_len)
    raise ValueError(pattern.kind)
