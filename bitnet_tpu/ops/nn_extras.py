"""General NN op set (parity with bitnet-kernels' CPU op catalog).

The reference ships hand-written CPU kernels for conv2d, pooling, loss,
reductions, scatter/gather, transpose, layer_norm and embedding
(``bitnet-kernels/src/cpu/*.rs``) because candle needs them on the hot
path.  On TPU every one of these is an XLA-native op that fuses and tiles
onto the MXU/VPU automatically — hand-writing them in Pallas would be
strictly worse.  This module provides the same *surface* as documented,
thin functions with the reference semantics, so the op catalog is
explicit, testable, and greppable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# -- embedding / transpose / scatter-gather (cpu/{embedding,transpose,
#    scatter_gather}.rs) ------------------------------------------------------
def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)


def transpose(x: jnp.ndarray, axes: tuple[int, ...] | None = None):
    return jnp.transpose(x, axes)


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(x, idx, axis=0)


def scatter_rows(x: jnp.ndarray, idx: jnp.ndarray,
                 updates: jnp.ndarray) -> jnp.ndarray:
    return x.at[idx].set(updates)


# -- layer norms (cpu/layer_norm.rs) -----------------------------------------
def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


# -- conv / pooling (cpu/{conv2d,pooling}.rs) --------------------------------
def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: str = "SAME") -> jnp.ndarray:
    """x: [N, H, W, C_in]; w: [KH, KW, C_in, C_out]."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID")


def avg_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1), "VALID")
    return s / (window * window)


# -- losses / reductions (cpu/{loss,reductions}.rs) --------------------------
def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean token NLL; logits [N, V], targets [N] int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(
        logp, targets[:, None].astype(jnp.int32), axis=-1))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def reduce_sum(x, axis=None):
    return jnp.sum(x, axis=axis)


def reduce_max(x, axis=None):
    return jnp.max(x, axis=axis)


def reduce_mean(x, axis=None):
    return jnp.mean(x, axis=axis)


def cumsum(x, axis=-1):
    return jnp.cumsum(x, axis=axis)
