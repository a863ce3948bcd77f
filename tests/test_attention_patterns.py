"""Attention patterns + windowed ring-buffer KV cache tests.

Strategy (SURVEY.md §4): the windowed cache must produce *identical* logits
to a full cache with a sliding-window mask — the ring buffer is a memory
layout, not a semantic change.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.engine.context import (
    ContextWindowConfig,
    EvictionPolicy,
    evict,
    importance_scores,
)
from bitnet_tpu.engine.windowed_cache import (
    allocate_windowed_cache,
    forward_windowed,
)
from bitnet_tpu.models import forward, load_model, logits
from bitnet_tpu.ops.attention import attention
from bitnet_tpu.ops.attention_patterns import (
    AttentionPattern,
    PatternKind,
    effective_kv_footprint,
    pattern_mask,
)


def np_mask(B, Tq, S):
    qp = np.tile(np.arange(Tq)[None, :], (B, 1))
    kp = np.tile(np.arange(S)[None, :], (B, 1))
    return qp, kp


class TestPatternMask:
    def test_causal(self):
        qp, kp = np_mask(1, 8, 8)
        m = np.asarray(pattern_mask(
            AttentionPattern(PatternKind.CAUSAL),
            jnp.asarray(qp), jnp.asarray(kp)))
        expected = np.tril(np.ones((8, 8), bool))
        assert (m[0] == expected).all()

    def test_sliding_window(self):
        qp, kp = np_mask(1, 10, 10)
        m = np.asarray(pattern_mask(
            AttentionPattern(PatternKind.SLIDING_WINDOW, window=3),
            jnp.asarray(qp), jnp.asarray(kp)))[0]
        for q in range(10):
            seen = set(np.nonzero(m[q])[0])
            assert seen == {k for k in range(10) if q - 3 < k <= q}

    def test_dilated(self):
        qp, kp = np_mask(1, 12, 12)
        m = np.asarray(pattern_mask(
            AttentionPattern(PatternKind.DILATED, window=3, rate=2),
            jnp.asarray(qp), jnp.asarray(kp)))[0]
        # query 10 with window 3, rate 2 sees distances {0, 2, 4}
        assert set(np.nonzero(m[10])[0]) == {10, 8, 6}

    def test_global_local(self):
        qp, kp = np_mask(1, 16, 16)
        m = np.asarray(pattern_mask(
            AttentionPattern(PatternKind.GLOBAL_LOCAL, window=2,
                             num_global=2),
            jnp.asarray(qp), jnp.asarray(kp)))[0]
        # distant query still sees global keys 0,1 plus local window
        assert set(np.nonzero(m[12])[0]) == {0, 1, 11, 12}

    def test_block_sparse_causal(self):
        qp, kp = np_mask(1, 16, 16)
        m = np.asarray(pattern_mask(
            AttentionPattern(PatternKind.BLOCK_SPARSE, block_size=4,
                             stride=2),
            jnp.asarray(qp), jnp.asarray(kp)))[0]
        # q=13 (block 3): blocks 3, 1 and block 0 → keys 12-13, 4-7, 0-3
        assert set(np.nonzero(m[13])[0]) == set(range(4)) | set(range(4, 8)) | {12, 13}

    def test_invalid_slots_masked(self):
        qp = jnp.asarray([[5]])
        kp = jnp.asarray([[-1, 3, -1, 5]])
        m = np.asarray(pattern_mask(AttentionPattern(PatternKind.CAUSAL),
                                    qp, kp))[0, 0]
        assert list(m) == [False, True, False, True]

    def test_footprint(self):
        assert effective_kv_footprint(
            AttentionPattern(PatternKind.SLIDING_WINDOW, window=128),
            4096) == 128
        assert effective_kv_footprint(
            AttentionPattern(PatternKind.CAUSAL), 4096) == 4096


class TestWindowedAttentionOp:
    def test_window_matches_masked_full(self, rng):
        """attention(window=w) == attention(extra_mask=sliding mask)."""
        B, T, H, KV, D, S = 2, 6, 4, 2, 8, 16
        q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, KV, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, KV, D)), jnp.float32)
        qp = jnp.tile(jnp.arange(6, 12, dtype=jnp.int32)[None], (B, 1))
        vl = jnp.full((B,), 12, jnp.int32)

        out_w = attention(q, k, v, qp, vl, window=4)
        kp = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1))
        mask = pattern_mask(
            AttentionPattern(PatternKind.SLIDING_WINDOW, window=4), qp, kp)
        # extra_mask path keeps the valid-length mask too
        out_m = attention(q, k, v, qp, vl, extra_mask=mask)
        np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_m),
                                   rtol=1e-6)


class TestWindowedKVCache:
    @pytest.fixture(scope="class")
    def model(self, mini_gguf_f32):
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        return cfg, params

    def test_ring_buffer_matches_full_cache_windowed(self, model):
        """Decode past the window: ring buffer == full cache + window mask."""
        cfg, params = model
        B, W, N = 1, 8, 14          # generate 14 tokens with an 8-window
        tokens = np.arange(2, 2 + N, dtype=np.int32) % cfg.vocab_size

        # --- full cache with window mask ---
        S = 32
        kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads,
                        cfg.head_dim), jnp.float32)
        vc = jnp.zeros_like(kc)
        full_logits = []
        for i in range(N):
            tok = jnp.asarray([[tokens[i]]], jnp.int32)
            pos = jnp.asarray([[i]], jnp.int32)
            h, kc, vc, _, _ = forward(
                cfg, params, tok, pos, kc, vc,
                jnp.asarray([i], jnp.int32), 1, "xla", window=W)
            full_logits.append(np.asarray(logits(cfg, params, h))[0, -1])

        # --- ring-buffer windowed cache ---
        wcache = allocate_windowed_cache(cfg, B, W, "f32")
        ring_logits = []
        for i in range(N):
            tok = jnp.asarray([[tokens[i]]], jnp.int32)
            pos = jnp.asarray([[i]], jnp.int32)
            h, wcache = forward_windowed(cfg, params, tok, pos, wcache)
            ring_logits.append(np.asarray(logits(cfg, params, h))[0, -1])

        for i, (a, b) in enumerate(zip(full_logits, ring_logits)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                       err_msg=f"step {i}")

    def test_padding_marker_drops_writes(self, model):
        cfg, params = model
        wcache = allocate_windowed_cache(cfg, 1, 8, "f32")
        tok = jnp.asarray([[3, 4]], jnp.int32)
        pos = jnp.asarray([[0, 99]], jnp.int32)   # second token is padding
        _, wcache = forward_windowed(cfg, params, tok, pos, wcache,
                                     num_real_tokens=1, pad_marker=99)
        assert int(wcache.positions[0, 0]) == 0
        assert (np.asarray(wcache.positions)[0, 1:] == -1).all()
        assert int(wcache.lengths[0]) == 1


class TestContextEviction:
    def test_keep_half(self):
        out = evict(list(range(100)),
                    ContextWindowConfig(50, EvictionPolicy.KEEP_HALF))
        assert out == list(range(75, 100))

    def test_keep_recent(self):
        out = evict(list(range(100)),
                    ContextWindowConfig(40, EvictionPolicy.KEEP_RECENT))
        assert out == list(range(60, 100))

    def test_head_and_tail(self):
        out = evict(list(range(100)),
                    ContextWindowConfig(30, EvictionPolicy.HEAD_AND_TAIL,
                                        head_keep=10))
        assert out == list(range(10)) + list(range(80, 100))

    def test_importance_pins_head_and_tail(self):
        toks = [7] * 50 + [123] + [7] * 49
        cfg = ContextWindowConfig(30, EvictionPolicy.IMPORTANCE,
                                  head_keep=4, protect_last=4)
        out = evict(toks, cfg)
        assert len(out) == 30
        assert out[:4] == toks[:4] and out[-4:] == toks[-4:]
        assert 123 in out            # the rare token survives

    def test_noop_within_budget(self):
        assert evict([1, 2, 3], ContextWindowConfig(10)) == [1, 2, 3]

    def test_importance_scores_rarity(self):
        s = importance_scores([5, 5, 5, 9])
        assert s[3] > s[1]           # rare beats repeated
