"""Pipelined (issue-ahead) scheduler mode: token parity vs the sync step.

Round-5 serving work: the per-dispatch fixed host cost through the dev
relay is ~250 ms vs ~2 ms/step device compute, so the scheduler gained a
``pipeline_depth > 1`` mode — device-resident decode state, up to depth
windows in flight, occupancy-epoch-guarded reads.  These tests pin the
contract: the emitted token streams are identical to the sync scheduler
(and therefore to ``InferenceEngine.generate``) for every device-side
sampling config, and the lifecycle machinery (cancel, timeout, hostside
fallback, pause/checkpoint) still works with windows in flight.
"""

import time

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine.stop import StopReason
from bitnet_tpu.errors import InferenceError
from bitnet_tpu.models import load_model
from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
from bitnet_tpu.tokenizer import load_tokenizer

ECFG = EngineConfig(max_seq_len=64, compute_dtype="f32")
PROMPT = [1, 7, 20, 3]


@pytest.fixture(scope="module")
def model(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    tok = load_tokenizer(mini_gguf_f32.path)
    return cfg, params, tok


@pytest.fixture(scope="module")
def pl_sched(model):
    cfg, params, tok = model
    s = ContinuousBatchingScheduler(
        cfg, params, tok, ECFG, num_slots=2,
        decode_steps_per_dispatch=2, pipeline_depth=3)
    yield s
    s.shutdown()


@pytest.fixture(scope="module")
def sync_sched(model):
    cfg, params, tok = model
    s = ContinuousBatchingScheduler(
        cfg, params, tok, ECFG, num_slots=2,
        decode_steps_per_dispatch=2)
    yield s
    s.shutdown()


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


PARITY_CONFIGS = [
    pytest.param(GenerationConfig(max_new_tokens=9, greedy=True),
                 id="greedy"),
    pytest.param(GenerationConfig(max_new_tokens=9, temperature=0.8,
                                  top_k=5, seed=42), id="top-k"),
    pytest.param(GenerationConfig(max_new_tokens=9, temperature=0.9,
                                  top_p=0.7, seed=7), id="top-p"),
    pytest.param(GenerationConfig(max_new_tokens=9, temperature=0.8,
                                  top_k=8, top_p=0.9, min_p=0.02,
                                  seed=11), id="combined"),
    pytest.param(GenerationConfig(max_new_tokens=9, temperature=0.8,
                                  typical_p=0.8, seed=13), id="typical-p"),
]


class TestParity:
    @pytest.mark.parametrize("gen", PARITY_CONFIGS)
    def test_matches_sync_scheduler(self, pl_sched, sync_sched, gen):
        a, ra = collect(pl_sched.submit(PROMPT, gen))
        b, rb = collect(sync_sched.submit(PROMPT, gen))
        assert a == b
        assert ra == rb

    def test_concurrent_staggered_requests(self, pl_sched, sync_sched):
        """More requests than slots, submitted in a burst: every stream
        must match the sync scheduler's stream for the same seed."""
        gens = [GenerationConfig(max_new_tokens=7, temperature=0.7,
                                 top_k=6, seed=100 + i) for i in range(5)]
        prompts = [[2 + i, 9, 14] for i in range(5)]
        a_reqs = [pl_sched.submit(p, g) for p, g in zip(prompts, gens)]
        a = [collect(r)[0] for r in a_reqs]
        b_reqs = [sync_sched.submit(p, g) for p, g in zip(prompts, gens)]
        b = [collect(r)[0] for r in b_reqs]
        assert a == b

    def test_mirostat_falls_back_and_completes(self, pl_sched, sync_sched):
        gen = GenerationConfig(max_new_tokens=6, mirostat=2, seed=5)
        a, _ = collect(pl_sched.submit(PROMPT, gen))
        b, _ = collect(sync_sched.submit(PROMPT, gen))
        assert a == b
        assert pl_sched.stats.get("pipeline_fallback_steps", 0) > 0

    def test_min_new_tokens_falls_back(self, pl_sched, sync_sched):
        gen = GenerationConfig(max_new_tokens=6, min_new_tokens=4,
                               greedy=True)
        a, _ = collect(pl_sched.submit(PROMPT, gen))
        b, _ = collect(sync_sched.submit(PROMPT, gen))
        assert a == b


class TestLifecycle:
    def test_cancel_with_windows_in_flight(self, pl_sched):
        req = pl_sched.submit(PROMPT, GenerationConfig(
            max_new_tokens=4096, temperature=0.9, seed=3))
        got_one = False
        deadline = time.time() + 120
        while time.time() < deadline:
            tok, _, done, _ = req.out.get(timeout=120)
            if tok is not None:
                got_one = True
                break
        assert got_one
        req.cancel()
        deadline = time.time() + 120
        reason = None
        while time.time() < deadline:
            tok, _, done, r = req.out.get(timeout=120)
            if done:
                reason = r
                break
        assert reason == StopReason.CANCELLED

    def test_pause_checkpoint_drains_inflight(self, model, tmp_path):
        cfg, params, tok = model
        s = ContinuousBatchingScheduler(
            cfg, params, tok, ECFG, num_slots=2,
            decode_steps_per_dispatch=2, pipeline_depth=3)
        try:
            req = s.submit(PROMPT, GenerationConfig(
                max_new_tokens=4096, greedy=True))
            # wait for some output so windows are in flight
            req.out.get(timeout=120)
            s.pause()
            assert not s._pl_inflight
            written = s.checkpoint_requests(str(tmp_path / "ckpt"))
            assert written
            s.unpause()
            req.cancel()
        finally:
            s.shutdown()

    def test_rejects_incompatible_modes(self, model):
        cfg, params, tok = model
        with pytest.raises(InferenceError):
            ContinuousBatchingScheduler(
                cfg, params, tok, ECFG, num_slots=2, paged=True,
                pipeline_depth=2, start_loop=False)
        with pytest.raises(InferenceError):
            ContinuousBatchingScheduler(
                cfg, params, tok, ECFG, num_slots=2, speculative_k=2,
                pipeline_depth=2, start_loop=False)
