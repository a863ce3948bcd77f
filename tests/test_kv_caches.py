"""Prefix cache + paged KV cache tests.

Gate: paged execution must be bit-compatible (up to float tolerance) with
the dense cache; prefix-cache restore must reproduce full-prefill logits.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine.paged_cache import (
    PagePool,
    allocate_paged_cache,
    ensure_capacity,
    fork_slot,
    paged_forward,
    pages_needed,
    release_slot,
)
from bitnet_tpu.engine.prefix_cache import (
    PrefixCache,
    PrefixSnapshot,
    snapshot_from_cache,
)
from bitnet_tpu.models import forward, load_model, logits


def mk_snap(n, fill=0.5):
    k = np.full((2, n, 2, 4), fill, np.float32)
    return PrefixSnapshot(length=n, k=k, v=k.copy())


class TestPrefixCacheUnit:
    def test_lookup_longest_prefix(self):
        pc = PrefixCache(max_tokens=1000)
        pc.insert([1, 2], mk_snap(2))
        pc.insert([1, 2, 3, 4], mk_snap(4))
        m, snap = pc.lookup([1, 2, 3, 4, 5])
        assert m == 4 and snap.length == 4
        m, snap = pc.lookup([1, 2, 9])
        assert m == 2
        m, snap = pc.lookup([7])
        assert m == 0 and snap is None

    def test_lru_eviction_by_tokens(self):
        pc = PrefixCache(max_tokens=6)
        pc.insert([1, 2, 3], mk_snap(3))
        pc.insert([4, 5, 6], mk_snap(3))
        # touch the first so the second is LRU
        pc.lookup([1, 2, 3])
        pc.insert([7, 8], mk_snap(2))     # exceeds 6 → evict [4,5,6]
        assert pc.lookup([4, 5, 6])[0] == 0
        assert pc.lookup([1, 2, 3])[0] == 3
        assert pc.cached_tokens <= 6

    def test_oversized_insert_skipped(self):
        pc = PrefixCache(max_tokens=4)
        pc.insert([1, 2, 3, 4, 5], mk_snap(5))
        assert pc.cached_tokens == 0

    def test_stats(self):
        pc = PrefixCache()
        pc.lookup([1])
        pc.insert([1], mk_snap(1))
        pc.lookup([1])
        s = pc.stats()
        assert s["hits"] == 1 and s["misses"] == 1


class TestPrefixCacheEngine:
    @pytest.fixture(scope="class")
    def engine(self, mini_gguf_f32):
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        return InferenceEngine(
            cfg, params,
            EngineConfig(max_seq_len=64, kv_cache_dtype="f32",
                         compute_dtype="f32", prefix_cache_tokens=256))

    def test_hit_reproduces_full_prefill_logits(self, engine):
        prompt = [2, 7, 11, 13, 17, 19, 23, 29]
        lg_first = np.asarray(engine.prefill(prompt))      # miss: full run
        assert engine.prefix_cache.stats()["misses"] == 1
        lg_again = np.asarray(engine.prefill(prompt))      # hit: restore+1tok
        assert engine.prefix_cache.stats()["hits"] == 1
        assert any(r.startswith("prefix_restore") for r
                   in engine.kernel_recorder)
        np.testing.assert_allclose(lg_first, lg_again, rtol=1e-4, atol=1e-5)

    def test_extension_prompt_uses_prefix(self, engine):
        base = [3, 5, 8, 12]
        ext = base + [30, 31]
        engine.prefill(base)
        lg_ext = np.asarray(engine.prefill(ext))
        # fresh engine without prefix cache as golden
        golden_engine = InferenceEngine(
            engine.cfg, engine.params,
            EngineConfig(max_seq_len=64, kv_cache_dtype="f32",
                         compute_dtype="f32"))
        lg_gold = np.asarray(golden_engine.prefill(ext))
        np.testing.assert_allclose(lg_ext, lg_gold, rtol=1e-4, atol=1e-5)


class TestPagePool:
    def test_alloc_release(self):
        pool = PagePool(4)
        a = pool.alloc(3)
        assert pool.free_pages == 1
        pool.release(a)
        assert pool.free_pages == 4

    def test_exhaustion(self):
        pool = PagePool(2)
        pool.alloc(2)
        with pytest.raises(Exception):
            pool.alloc(1)

    def test_refcount_sharing(self):
        pool = PagePool(2)
        a = pool.alloc(1)
        pool.retain(a)
        pool.release(a)
        assert pool.free_pages == 1      # still held once
        pool.release(a)
        assert pool.free_pages == 2

    def test_pages_needed(self):
        assert pages_needed(0, 16) == 0
        assert pages_needed(1, 16) == 1
        assert pages_needed(16, 16) == 1
        assert pages_needed(17, 16) == 2


class TestPagedForward:
    @pytest.fixture(scope="class")
    def model(self, mini_gguf_f32):
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        return cfg, params

    def test_paged_matches_dense(self, model):
        """Prefill + decode through pages == dense cache, both sequences."""
        cfg, params = model
        B, T, page = 2, 6, 4
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)

        # dense golden
        S = 32
        kc = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads,
                        cfg.head_dim), jnp.float32)
        vc = jnp.zeros_like(kc)
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
        h_d, kc, vc, _, _ = forward(cfg, params, jnp.asarray(prompt), pos,
                                    kc, vc, jnp.zeros(B, jnp.int32), T)
        golden = [np.asarray(logits(cfg, params, h_d))[:, -1]]
        next_tok = jnp.argmax(logits(cfg, params, h_d)[:, -1], -1)
        for i in range(3):
            p = jnp.full((B, 1), T + i, jnp.int32)
            h_d, kc, vc, _, _ = forward(
                cfg, params, next_tok[:, None].astype(jnp.int32), p, kc, vc,
                jnp.full((B,), T + i, jnp.int32), 1)
            lg = logits(cfg, params, h_d)[:, -1]
            golden.append(np.asarray(lg))
            next_tok = jnp.argmax(lg, -1)

        # paged
        cache, pool = allocate_paged_cache(cfg, B, num_pages=16,
                                           page_size=page,
                                           max_blocks_per_seq=8, dtype="f32")
        for b in range(B):
            cache = ensure_capacity(cache, pool, b, T)
        h_p, cache = paged_forward(cfg, params, jnp.asarray(prompt), pos,
                                   cache, T)
        got = [np.asarray(logits(cfg, params, h_p))[:, -1]]
        next_tok = jnp.argmax(logits(cfg, params, h_p)[:, -1], -1)
        for i in range(3):
            for b in range(B):
                cache = ensure_capacity(cache, pool, b, T + i + 1)
            p = jnp.full((B, 1), T + i, jnp.int32)
            h_p, cache = paged_forward(
                cfg, params, next_tok[:, None].astype(jnp.int32), p, cache, 1)
            lg = logits(cfg, params, h_p)[:, -1]
            got.append(np.asarray(lg))
            next_tok = jnp.argmax(lg, -1)

        for i, (a, b) in enumerate(zip(golden, got)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                       err_msg=f"step {i}")

    def test_release_and_reuse(self, model):
        cfg, _ = model
        cache, pool = allocate_paged_cache(cfg, 2, num_pages=4, page_size=4,
                                           max_blocks_per_seq=2, dtype="f32")
        cache = ensure_capacity(cache, pool, 0, 8)
        assert pool.free_pages == 2
        cache = release_slot(cache, pool, 0)
        assert pool.free_pages == 4
        assert (np.asarray(cache.tables[0]) == -1).all()

    def test_fork_shares_pages(self, model):
        cfg, params = model
        cache, pool = allocate_paged_cache(cfg, 2, num_pages=8, page_size=4,
                                           max_blocks_per_seq=4, dtype="f32")
        cache = ensure_capacity(cache, pool, 0, 8)
        cache = dataclasses_replace_lengths(cache, 0, 8)
        cache = fork_slot(cache, pool, 0, 1)
        assert int(cache.lengths[1]) == 8
        tab0 = np.asarray(cache.tables[0, :2])
        tab1 = np.asarray(cache.tables[1, :2])
        assert (tab0 == tab1).all()
        # releasing the fork keeps the source's pages alive
        cache = release_slot(cache, pool, 1)
        assert pool.refcount(int(tab0[0])) == 1


def dataclasses_replace_lengths(cache, slot, n):
    import dataclasses

    return dataclasses.replace(
        cache, lengths=cache.lengths.at[slot].set(n))


class TestQuantizedCacheAccuracy:
    """Accuracy envelope for the int8/fp8 KV cache (VERDICT round-1 weak
    #10): per-position logits must stay >0.99 cosine vs the bf16 cache."""

    @pytest.mark.parametrize("dtype", ["int8", "fp8"])
    def test_cosine_vs_bf16_cache(self, mini_gguf_qk256, dtype):
        import numpy as np

        from bitnet_tpu.config import EngineConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        ids = [2, 7, 11, 13, 17, 19, 23, 29]

        def logits_with(kv):
            eng = InferenceEngine(cfg, params, EngineConfig(
                max_seq_len=64, kv_cache_dtype=kv, compute_dtype="f32"))
            return np.asarray(eng.eval_ids(ids), np.float64)

        ref = logits_with("bf16")
        got = logits_with(dtype)
        for t in range(len(ids)):
            cos = got[t] @ ref[t] / (np.linalg.norm(got[t])
                                     * np.linalg.norm(ref[t]) + 1e-30)
            assert cos > 0.99, (dtype, t, cos)

    def test_greedy_decode_envelope(self, mini_gguf_qk256):
        """int8 cache greedy decode: tokens may differ on a random model,
        but generation completes and the first token (prefill-dominated)
        matches."""
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        outs = {}
        for kv in ("bf16", "int8"):
            eng = InferenceEngine(cfg, params, EngineConfig(
                max_seq_len=64, kv_cache_dtype=kv, compute_dtype="f32"))
            outs[kv] = eng.generate([1, 7, 20], gen).token_ids
        assert len(outs["int8"]) >= 1
        assert outs["int8"][0] == outs["bf16"][0]


class TestQuantizedKVStacked:
    """int8/fp8 KV caches routed through the STACKED w2a8 decode loop
    (round-2: eligibility no longer excludes quantized caches — the
    generic fallback paid the per-layer weight-slice copies)."""

    @pytest.mark.parametrize("kv", ["int8", "fp8"])
    def test_quantized_close_to_f32_cache(self, mini_gguf_qk256, kv):
        import numpy as np

        from bitnet_tpu.config import EngineConfig
        from bitnet_tpu.engine import InferenceEngine

        ids = [1, 5, 9, 14, 3, 7, 20, 11]

        def logits(kv_dtype):
            eng = InferenceEngine.from_gguf(
                mini_gguf_qk256.path,
                EngineConfig(kernel_path="w2a8", max_seq_len=64,
                             compute_dtype="f32", kv_cache_dtype=kv_dtype))
            # drive the DECODE path (eval_ids would prefill): greedy steps
            out = eng.generate(ids[:3], __import__(
                "bitnet_tpu.config", fromlist=["GenerationConfig"]
            ).GenerationConfig(max_new_tokens=5, temperature=0.0))
            return out.token_ids

        ref = logits("f32")
        got = logits(kv)
        # accuracy envelope: quantized-cache greedy may diverge late but
        # must agree on a prefix (same seed/model; int8 is near-lossless)
        agree = sum(1 for a, b in zip(ref, got) if a == b)
        assert agree >= 3, (ref, got)

    def test_int8_rope_fused_matches_unfused(self, mini_gguf_qk256,
                                             monkeypatch):
        """The rope-fused int8 kernel (decode_attention_qkv_quant, the
        rows-mode default at B≤2) vs the unfused quant path: same rows,
        near-identical attention (the fused kernel keeps the new rows f32
        until the dot where the unfused wrapper rounds through bf16, so
        tokens may flip at exact ties — require strong prefix agreement)."""
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine

        def run(flag):
            monkeypatch.setenv("BITNET_ROPE_FUSED", flag)
            eng = InferenceEngine.from_gguf(
                mini_gguf_qk256.path,
                EngineConfig(kernel_path="w2a8", max_seq_len=64,
                             compute_dtype="f32", kv_cache_dtype="int8"))
            out = eng.generate([1, 5, 9, 14], GenerationConfig(
                max_new_tokens=6, greedy=True))
            return out.token_ids

        fused = run("1")
        unfused = run("0")
        assert len(fused) >= 1
        agree = sum(1 for a, b in zip(fused, unfused) if a == b)
        assert agree >= 4, (fused, unfused)

    def test_fp8_rope_fused_matches_unfused(self, mini_gguf_qk256,
                                            monkeypatch):
        """BITNET_FP8_KERNEL=1 routes fp8 caches onto the fused quant
        kernels (in-VMEM e4m3 quantize/dequant); tokens must agree with
        the default dequant-in-XLA path."""
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine

        def run(flag):
            monkeypatch.setenv("BITNET_FP8_KERNEL", flag)
            eng = InferenceEngine.from_gguf(
                mini_gguf_qk256.path,
                EngineConfig(kernel_path="w2a8", max_seq_len=64,
                             compute_dtype="f32", kv_cache_dtype="fp8"))
            out = eng.generate([1, 5, 9, 14], GenerationConfig(
                max_new_tokens=6, greedy=True))
            return out.token_ids

        fused = run("1")
        base = run("0")
        agree = sum(1 for a, b in zip(fused, base) if a == b)
        assert agree >= 4, (fused, base)


class TestStackedPrefill:
    def test_stacked_prefill_matches_default(self, mini_gguf_qk256,
                                             monkeypatch):
        """BITNET_STACKED_PREFILL=1 (scalar-prefetch stacked prefill
        matmuls) must reproduce the default prefill bit-for-bit: same
        quantize math, same block geometry, weights read from the stacks
        instead of per-layer scan-slice copies."""
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine

        def run(flag, kv="bf16"):
            monkeypatch.setenv("BITNET_STACKED_PREFILL", flag)
            eng = InferenceEngine.from_gguf(
                mini_gguf_qk256.path,
                EngineConfig(kernel_path="w2a8", max_seq_len=64,
                             compute_dtype="f32", kv_cache_dtype=kv))
            out = eng.generate([1, 5, 9, 14, 23, 2, 8], GenerationConfig(
                max_new_tokens=5, greedy=True))
            return out.token_ids

        assert run("1") == run("0")

    def test_stacked_prefill_matches_default_int8_kv(self, mini_gguf_qk256,
                                                     monkeypatch):
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine

        def run(flag):
            monkeypatch.setenv("BITNET_STACKED_PREFILL", flag)
            eng = InferenceEngine.from_gguf(
                mini_gguf_qk256.path,
                EngineConfig(kernel_path="w2a8", max_seq_len=64,
                             compute_dtype="f32", kv_cache_dtype="int8"))
            out = eng.generate([1, 5, 9, 14, 23], GenerationConfig(
                max_new_tokens=5, greedy=True))
            return out.token_ids

        assert run("1") == run("0")

