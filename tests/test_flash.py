"""Chunked online-softmax attention vs dense attention parity."""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bitnet_tpu.ops.attention import attention
from bitnet_tpu.ops.flash import flash_attention


def rand_qkv(rng, B=2, Tq=8, H=4, KV=2, D=16, S=64):
    q = jnp.asarray(rng.normal(size=(B, Tq, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, KV, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, KV, D)), jnp.float32)
    return q, k, v


class TestFlashParity:
    def test_prefill_shape(self, rng):
        q, k, v = rand_qkv(rng)
        qp = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (2, 1))
        vl = jnp.full((2,), 8, jnp.int32)
        dense = attention(q, k, v, qp, vl)
        flash = flash_attention(q, k, v, qp, vl, chunk=16)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)

    def test_decode_shape_mid_cache(self, rng):
        q, k, v = rand_qkv(rng, Tq=1)
        qp = jnp.full((2, 1), 37, jnp.int32)
        vl = jnp.full((2,), 38, jnp.int32)
        dense = attention(q, k, v, qp, vl)
        flash = flash_attention(q, k, v, qp, vl, chunk=16)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)

    def test_ragged_lengths(self, rng):
        q, k, v = rand_qkv(rng)
        qp = jnp.stack([jnp.arange(3, 11, dtype=jnp.int32),
                        jnp.arange(20, 28, dtype=jnp.int32)])
        vl = jnp.asarray([11, 28], jnp.int32)
        dense = attention(q, k, v, qp, vl)
        flash = flash_attention(q, k, v, qp, vl, chunk=16)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)

    def test_sliding_window(self, rng):
        q, k, v = rand_qkv(rng)
        qp = jnp.tile(jnp.arange(40, 48, dtype=jnp.int32)[None], (2, 1))
        vl = jnp.full((2,), 48, jnp.int32)
        dense = attention(q, k, v, qp, vl, window=12)
        flash = flash_attention(q, k, v, qp, vl, chunk=16, window=12)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)

    def test_unaligned_chunk(self, rng):
        """S not divisible by chunk — padding must not leak."""
        q, k, v = rand_qkv(rng, S=50)
        qp = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (2, 1))
        vl = jnp.full((2,), 50, jnp.int32)
        dense = attention(q, k, v, qp, vl)
        flash = flash_attention(q, k, v, qp, vl, chunk=16)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=2e-5, atol=2e-5)

    @settings(max_examples=10, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 3))
    def test_property_random_shapes(self, tq, seed):
        rng = np.random.default_rng(seed)
        q, k, v = rand_qkv(rng, B=1, Tq=tq, S=32)
        qp = jnp.asarray(rng.integers(0, 30, (1, tq)).astype(np.int32))
        vl = jnp.full((1,), 31, jnp.int32)
        dense = attention(q, k, v, qp, vl)
        flash = flash_attention(q, k, v, qp, vl, chunk=8)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                                   rtol=5e-5, atol=5e-5)
