"""RMSNorm.

Semantics follow the reference (``bitnet-transformer/src/lib.rs:1947-1949``):
``y = x / sqrt(mean(x^2) + eps) * w``, reduction in float32.

On TPU this is a bandwidth-trivial elementwise op that XLA fuses into its
neighbors; a Pallas version would add nothing, so this stays pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Apply RMSNorm along the last axis; accumulate in f32, keep x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + jnp.float32(eps))
    return (y * weight.astype(jnp.float32)).astype(dtype)
