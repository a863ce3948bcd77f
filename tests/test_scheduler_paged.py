"""Paged-pool continuous batching: the scheduler backed by the shared page
pool (VERDICT round 1 #6 — ``kv_cache_optimized.rs`` integration parity).

Covers: HBM sized by live tokens (pool < B×S yet all requests complete),
token parity with the dense scheduler, shared-prefix page forking, page
release on completion, and eviction when the pool runs dry.
"""

import time

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine.stop import StopReason
from bitnet_tpu.models import load_model
from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
from bitnet_tpu.tokenizer import load_tokenizer

ECFG = EngineConfig(max_seq_len=64, compute_dtype="f32")


def collect(req, timeout=120):
    toks, reason = [], None
    deadline = time.time() + timeout
    while time.time() < deadline:
        tok, text, done, r = req.out.get(timeout=timeout)
        if tok is not None:
            toks.append(tok)
        if done:
            reason = r
            break
    return toks, reason


@pytest.fixture(scope="module")
def model(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    tok = load_tokenizer(mini_gguf_f32.path)
    return cfg, params, tok


def make_paged(model, **kw):
    cfg, params, tok = model
    kw.setdefault("num_slots", 2)
    kw.setdefault("page_size", 8)
    return ContinuousBatchingScheduler(cfg, params, tok, ECFG, paged=True,
                                       **kw)


class TestPagedScheduler:
    def test_matches_dense_scheduler_greedy(self, model):
        cfg, params, tok = model
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        dense = ContinuousBatchingScheduler(cfg, params, tok, ECFG,
                                            num_slots=2)
        paged = make_paged(model)
        try:
            t_d, _ = collect(dense.submit([1, 7, 20, 3], gen))
            t_p, _ = collect(paged.submit([1, 7, 20, 3], gen))
            assert t_p == t_d
        finally:
            dense.shutdown()
            paged.shutdown()

    def test_pool_smaller_than_BxS_all_complete(self, model):
        """HBM sized by live tokens: 2 slots × S=64 would need 16 pages;
        give the pool 8 and run 6 sequential short requests."""
        paged = make_paged(model, num_pages=8)
        try:
            gen = GenerationConfig(max_new_tokens=4, greedy=True)
            reqs = [paged.submit([1, i + 2, 9], gen) for i in range(6)]
            for r in reqs:
                toks, reason = collect(r)
                assert len(toks) >= 1
                assert reason is not None
            # all pages returned to the pool
            assert paged.pool.free_pages == 8
        finally:
            paged.shutdown()

    def test_prefix_fork(self, model):
        """Two requests sharing a ≥1-page prompt prefix fork pages."""
        paged = make_paged(model, num_pages=12)
        try:
            shared = [1, 5, 9, 13, 17, 21, 25, 29, 2]   # 9 toks, page=8
            gen = GenerationConfig(max_new_tokens=24, greedy=True)
            r1 = paged.submit(shared + [3], gen)
            # wait until r1 is admitted and decoding
            first = r1.out.get(timeout=120)
            r2 = paged.submit(shared + [7],
                              GenerationConfig(max_new_tokens=4,
                                               greedy=True))
            t2, _ = collect(r2)
            collect(r1)
            assert paged.stats.get("prefix_forked_pages", 0) >= 1
            # forked request's output matches a fresh run of the same
            # prompt (forked KV is bit-identical prefix state)
            fresh = make_paged(model, num_pages=12)
            try:
                t_ref, _ = collect(fresh.submit(
                    shared + [7], GenerationConfig(max_new_tokens=4,
                                                   greedy=True)))
            finally:
                fresh.shutdown()
            assert t2 == t_ref
            assert paged.pool.free_pages == 12
        finally:
            paged.shutdown()

    def test_eviction_when_pool_dry(self, model):
        """A generation that outgrows the pool is evicted CONTEXT_FULL."""
        paged = make_paged(model, num_slots=1, num_pages=2)  # 16 tokens max
        try:
            gen = GenerationConfig(max_new_tokens=60, greedy=True)
            req = paged.submit([1, 5, 9], gen)
            toks, reason = collect(req)
            assert reason == StopReason.CONTEXT_FULL
            assert 1 <= len(toks) < 60
            assert paged.pool.free_pages == 2
        finally:
            paged.shutdown()

    def test_requeue_when_admission_blocked(self, model):
        """A request that can't get pages waits and completes later."""
        paged = make_paged(model, num_slots=2, num_pages=3)
        try:
            g_long = GenerationConfig(max_new_tokens=10, greedy=True)
            r1 = paged.submit([1, 5, 9, 2, 6, 8, 3, 7], g_long)  # 2+ pages
            r2 = paged.submit([2, 4, 6, 8, 1, 3, 5, 7], g_long)  # must wait
            t1, _ = collect(r1)
            t2, _ = collect(r2)
            assert len(t1) >= 1 and len(t2) >= 1
            assert paged.pool.free_pages == 3
        finally:
            paged.shutdown()

    def test_sampled_parity_with_engine(self, model, mini_gguf_f32):
        """Per-slot key streams survive the paged decode path too."""
        from bitnet_tpu.engine import InferenceEngine

        paged = make_paged(model)
        try:
            gen = GenerationConfig(max_new_tokens=5, temperature=0.8,
                                   top_k=5, seed=42)
            toks, _ = collect(paged.submit([1, 7, 20, 3], gen))
            eng = InferenceEngine.from_gguf(mini_gguf_f32.path, ECFG)
            assert toks == eng.generate([1, 7, 20, 3], gen).token_ids
        finally:
            paged.shutdown()


class TestPagedMeshScheduler:
    """Paged pool + GSPMD mesh (VERDICT round 1 'paged+mesh combo').

    Pool sharded KV-heads-on-model / replicated-on-data; block tables
    sharded batch-on-data (parallel/sharding.allocate_sharded_paged_cache).
    """

    def test_paged_mesh_matches_dense_unsharded(self, model):
        from bitnet_tpu.parallel import make_mesh

        cfg, params, tok = model
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[1, 7, 20, 3], [3, 5, 8], [40, 41, 2, 6], [9, 10]]

        dense = ContinuousBatchingScheduler(cfg, params, tok, ECFG,
                                            num_slots=2)
        try:
            golden = [collect(dense.submit(p, gen))[0] for p in prompts]
        finally:
            dense.shutdown()

        mesh = make_mesh(dp=2, tp=2)
        paged = ContinuousBatchingScheduler(
            cfg, params, tok, ECFG, paged=True, page_size=8,
            num_slots=4, mesh=mesh)
        try:
            got = [collect(paged.submit(p, gen))[0] for p in prompts]
            # all pages released once every request completes
            assert paged.pool.free_pages == paged.pool.num_pages
        finally:
            paged.shutdown()
        assert got == golden, (got, golden)

    def test_paged_mesh_pool_smaller_than_BxS(self, model):
        """Sharded pool still sized by live tokens, not B×S."""
        from bitnet_tpu.parallel import make_mesh

        cfg, params, tok = model
        mesh = make_mesh(dp=2, tp=2)
        paged = ContinuousBatchingScheduler(
            cfg, params, tok, ECFG, paged=True, page_size=8,
            num_slots=4, num_pages=8, mesh=mesh)   # 4×64 would need 32
        try:
            gen = GenerationConfig(max_new_tokens=4, greedy=True)
            reqs = [paged.submit([1, i + 2, 9], gen) for i in range(6)]
            for r in reqs:
                toks, reason = collect(r)
                assert len(toks) >= 1 and reason is not None
            assert paged.pool.free_pages == 8
        finally:
            paged.shutdown()
