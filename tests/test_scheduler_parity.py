"""Scheduler-vs-engine sampling parity + request-lifecycle tests.

VERDICT round 1 #4/#7: the pooled sampler must produce the same tokens as
``InferenceEngine.generate`` for every sampling configuration (the
reference's server and engine share one sampling stack,
``bitnet-server/src/batch_engine.rs``), and requests must be cancellable
with timeouts (``bitnet-inference/src/streaming.rs:499``,
``batch_engine.rs:17-103``).
"""

import time

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine.stop import StopReason
from bitnet_tpu.models import load_model
from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
from bitnet_tpu.tokenizer import load_tokenizer

ECFG = EngineConfig(max_seq_len=64, compute_dtype="f32")


@pytest.fixture(scope="module")
def sched(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    tok = load_tokenizer(mini_gguf_f32.path)
    s = ContinuousBatchingScheduler(cfg, params, tok, ECFG, num_slots=2)
    yield s
    s.shutdown()


@pytest.fixture(scope="module")
def engine(mini_gguf_f32):
    return InferenceEngine.from_gguf(mini_gguf_f32.path, ECFG)


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


PROMPT = [1, 7, 20, 3]

PARITY_CONFIGS = [
    pytest.param(GenerationConfig(max_new_tokens=6, greedy=True),
                 id="greedy"),
    pytest.param(GenerationConfig(max_new_tokens=6, greedy=True,
                                  repetition_penalty=3.0), id="rep-penalty"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.8,
                                  top_k=5, seed=42), id="top-k"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.9,
                                  top_p=0.7, seed=7), id="top-p"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.8,
                                  top_k=8, top_p=0.9, min_p=0.02,
                                  repetition_penalty=1.3, seed=11),
                 id="combined"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.8,
                                  typical_p=0.8, seed=13), id="typical-p"),
    pytest.param(GenerationConfig(max_new_tokens=6, mirostat=2, seed=5),
                 id="mirostat-v2"),
    pytest.param(GenerationConfig(max_new_tokens=6, greedy=True,
                                  frequency_penalty=0.8,
                                  presence_penalty=0.4),
                 id="freq-pres-greedy"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.8,
                                  top_k=8, frequency_penalty=1.2,
                                  presence_penalty=-0.5, seed=17),
                 id="freq-pres-sampled"),
    pytest.param(GenerationConfig(max_new_tokens=6, greedy=True,
                                  logit_bias=((23, 6.5),)),
                 id="logit-bias-greedy"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.9,
                                  top_k=4, seed=3,
                                  logit_bias=((5, -100.0), (9, 2.0))),
                 id="logit-bias-ban-sampled"),
]


class TestSamplingParity:
    @pytest.mark.parametrize("gen", PARITY_CONFIGS)
    def test_matches_engine(self, sched, engine, gen):
        toks, _ = collect(sched.submit(PROMPT, gen))
        expected = engine.generate(PROMPT, gen).token_ids
        assert toks == expected

    def test_repetition_penalty_actually_fires(self, sched, engine):
        """Regression for round-1: the pooled history was always empty so
        the penalty never applied.  The penalty must at minimum steer the
        first token away from a prompt-dominated argmax whenever the
        engine's does."""
        base = GenerationConfig(max_new_tokens=6, greedy=True)
        pen = GenerationConfig(max_new_tokens=6, greedy=True,
                               repetition_penalty=3.0)
        s_base, _ = collect(sched.submit(PROMPT, base))
        s_pen, _ = collect(sched.submit(PROMPT, pen))
        e_base = engine.generate(PROMPT, base).token_ids
        e_pen = engine.generate(PROMPT, pen).token_ids
        assert s_base == e_base
        assert s_pen == e_pen
        # if the engine's outputs differ, the scheduler's must too
        assert (s_base == s_pen) == (e_base == e_pen)

    def test_mixed_configs_in_one_batch(self, sched, engine):
        """Different sampling configs in concurrent slots don't bleed."""
        g1 = GenerationConfig(max_new_tokens=5, greedy=True)
        g2 = GenerationConfig(max_new_tokens=5, temperature=0.8, top_k=4,
                              seed=99)
        r1 = sched.submit(PROMPT, g1)
        r2 = sched.submit([2, 9, 30], g2)
        t1, _ = collect(r1)
        t2, _ = collect(r2)
        assert t1 == engine.generate(PROMPT, g1).token_ids
        assert t2 == engine.generate([2, 9, 30], g2).token_ids


class TestCancellation:
    def test_cancel_mid_generation(self, sched):
        gen = GenerationConfig(max_new_tokens=10_000, greedy=True,
                               # prevent natural stops
                               stop_token_ids=())
        req = sched.submit([1, 5, 9], gen)
        # wait for the first token so the slot is live
        tok, _, done, _ = req.out.get(timeout=120)
        assert not done
        req.cancel()
        deadline = time.time() + 30
        reason = None
        while time.time() < deadline:
            _, _, done, r = req.out.get(timeout=30)
            if done:
                reason = r
                break
        assert reason == StopReason.CANCELLED
        # slot frees: a fresh request completes
        nxt = sched.submit([1, 2, 3], GenerationConfig(max_new_tokens=2,
                                                       greedy=True))
        toks, r = collect(nxt)
        assert len(toks) >= 1

    def test_cancel_before_admission(self, sched):
        req = sched.submit([1, 5, 9], GenerationConfig(max_new_tokens=4))
        req.cancel()
        # may have been admitted already (races are fine) — but if the
        # cancel landed first, the reason must be CANCELLED and no slot
        # may keep decoding to max_new_tokens
        toks, reason = collect(req)
        assert reason in (StopReason.CANCELLED, StopReason.MAX_TOKENS,
                          StopReason.EOS, StopReason.STOP_TOKEN)

    def test_deadline_timeout(self, sched):
        req = sched.submit([1, 5, 9],
                           GenerationConfig(max_new_tokens=10_000,
                                            greedy=True),
                           timeout_s=0.5)
        toks, reason = collect(req, timeout=60)
        assert reason in (StopReason.TIMEOUT, StopReason.CONTEXT_FULL)

    def test_queue_timeout(self, mini_gguf_f32):
        """A request that outwaits its queue timeout is rejected."""
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(cfg, params, tok, ECFG, num_slots=1)
        try:
            # occupy the only slot
            long = s.submit([1, 5, 9], GenerationConfig(max_new_tokens=40,
                                                        greedy=True))
            _ = long.out.get(timeout=120)
            req = s.submit([2, 6], GenerationConfig(max_new_tokens=4),
                           queue_timeout_s=0.0)
            time.sleep(0.1)
            toks, reason = collect(req, timeout=60)
            assert reason == StopReason.TIMEOUT
            assert toks == []
        finally:
            s.shutdown()


class TestMultiStepDispatch:
    """decode_steps_per_dispatch > 1: K decode steps per device round
    trip (lax.scan) must be token-for-token identical to K=1."""

    def _run(self, mini_gguf_f32, k, gen, prompts):
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(
            cfg, params, tok, ECFG, num_slots=2,
            decode_steps_per_dispatch=k)
        try:
            outs = []
            for p in prompts:
                req = s.submit(p, gen)
                toks = []
                while True:
                    t, _, done, _ = req.out.get(timeout=120)
                    if t is not None:
                        toks.append(t)
                    if done:
                        break
                outs.append(toks)
            return outs
        finally:
            s.shutdown()

    def test_greedy_parity(self, mini_gguf_f32):
        gen = GenerationConfig(max_new_tokens=10, greedy=True)
        prompts = [[1, 7, 20, 3], [3, 5, 8]]
        assert self._run(mini_gguf_f32, 4, gen, prompts) == \
            self._run(mini_gguf_f32, 1, gen, prompts)

    def test_sampled_parity(self, mini_gguf_f32):
        gen = GenerationConfig(max_new_tokens=9, temperature=0.8,
                               top_k=5, repetition_penalty=1.2, seed=7)
        prompts = [[2, 9, 4]]
        assert self._run(mini_gguf_f32, 3, gen, prompts) == \
            self._run(mini_gguf_f32, 1, gen, prompts)

    def test_bias_and_penalties_parity(self, mini_gguf_f32):
        gen = GenerationConfig(max_new_tokens=8, temperature=0.8,
                               top_k=6, frequency_penalty=0.6,
                               presence_penalty=0.3, seed=19,
                               logit_bias=((4, -100.0), (11, 3.0)))
        prompts = [[2, 9, 4]]
        assert self._run(mini_gguf_f32, 4, gen, prompts) == \
            self._run(mini_gguf_f32, 1, gen, prompts)

    def test_stop_token_mid_window(self, mini_gguf_f32):
        """A stop token inside the K-window truncates exactly there."""
        gen1 = GenerationConfig(max_new_tokens=12, greedy=True)
        prompts = [[1, 7, 20, 3]]
        golden = self._run(mini_gguf_f32, 1, gen1, prompts)[0]
        assert len(golden) >= 3
        stop_at = golden[2]
        gen2 = GenerationConfig(max_new_tokens=12, greedy=True,
                                stop_token_ids=(stop_at,))
        got = self._run(mini_gguf_f32, 4, gen2, prompts)[0]
        ref = self._run(mini_gguf_f32, 1, gen2, prompts)[0]
        assert got == ref
        assert stop_at not in got


class TestMultiStepDispatchPaged:
    """decode_steps_per_dispatch > 1 on the PAGED pool: K in-scan
    paged_forward steps per dispatch (pages pre-grown for the whole
    window) must match K=1 token-for-token."""

    def _run(self, model, k, gen, prompts):
        cfg, params, _ = load_model(model.path, param_dtype=jnp.float32)
        tok = load_tokenizer(model.path)
        s = ContinuousBatchingScheduler(
            cfg, params, tok, ECFG, num_slots=2, paged=True,
            num_pages=24, page_size=8, decode_steps_per_dispatch=k)
        try:
            outs = []
            for p in prompts:
                req = s.submit(p, gen)
                toks = []
                while True:
                    t, _, done, _ = req.out.get(timeout=120)
                    if t is not None:
                        toks.append(t)
                    if done:
                        break
                outs.append(toks)
            return outs
        finally:
            s.shutdown()

    def test_greedy_parity(self, mini_gguf_f32):
        gen = GenerationConfig(max_new_tokens=10, greedy=True)
        prompts = [[1, 7, 20, 3], [3, 5, 8]]
        assert self._run(mini_gguf_f32, 4, gen, prompts) == \
            self._run(mini_gguf_f32, 1, gen, prompts)

    def test_sampled_parity(self, mini_gguf_f32):
        gen = GenerationConfig(max_new_tokens=9, temperature=0.8,
                               top_k=5, repetition_penalty=1.2, seed=7)
        prompts = [[2, 9, 4]]
        assert self._run(mini_gguf_f32, 3, gen, prompts) == \
            self._run(mini_gguf_f32, 1, gen, prompts)

    def test_window_crosses_page_boundary(self, mini_gguf_f32):
        """K window straddling a page boundary: pages for the whole
        window are pre-allocated, so tokens match K=1 exactly."""
        gen = GenerationConfig(max_new_tokens=14, greedy=True)
        prompts = [[1, 7, 20, 3, 9, 11]]   # prompt 6 + 14 tokens, page 8
        assert self._run(mini_gguf_f32, 5, gen, prompts) == \
            self._run(mini_gguf_f32, 1, gen, prompts)
