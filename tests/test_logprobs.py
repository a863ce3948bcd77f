"""Real per-token logprobs through engine, scheduler, server and compat.

The reference hardcodes ``logprob: None`` in its streaming surfaces
(bitnet-server/src/sse.rs:102, websocket.rs:26); here the value is
computed from the raw model distribution (OpenAI/llama.cpp convention).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine.sampling import logprob_entry
from bitnet_tpu.errors import ConfigError, InferenceError

ECFG = EngineConfig(max_seq_len=128, compute_dtype="f32")
PROMPT = [1, 7, 20, 3]


# ------------------------------------------------------------------ helper
class TestLogprobEntry:
    def test_log_softmax_exact(self):
        row = np.array([1.0, 2.0, 0.5, -3.0], np.float32)
        lse = math.log(sum(math.exp(x) for x in row))
        lp, top = logprob_entry(row, 1, 3)
        assert lp == pytest.approx(2.0 - lse, rel=1e-6)
        assert [i for i, _ in top] == [1, 0, 2]
        assert top[0][1] == pytest.approx(lp, rel=1e-6)

    def test_top_zero_and_oversize(self):
        row = np.array([0.0, 1.0], np.float32)
        lp, top = logprob_entry(row, 0, 0)
        assert top == []
        _, top = logprob_entry(row, 0, 10)       # n > vocab clamps
        assert len(top) == 2

    def test_probabilities_normalise(self):
        rng = np.random.default_rng(0)
        row = rng.normal(size=64).astype(np.float32)
        lp, top = logprob_entry(row, 5, 64)
        assert sum(math.exp(l) for _, l in top) == pytest.approx(1.0,
                                                                 abs=1e-5)


class TestConfig:
    def test_validation(self):
        GenerationConfig(logprobs=0)
        GenerationConfig(logprobs=32)
        with pytest.raises(ConfigError):
            GenerationConfig(logprobs=-1)
        with pytest.raises(ConfigError):
            GenerationConfig(logprobs=33)
        with pytest.raises(ConfigError):
            GenerationConfig(logprobs=1.5)


# ------------------------------------------------------------------ engine
@pytest.fixture(scope="module")
def engine(mini_gguf_f32):
    return InferenceEngine.from_gguf(mini_gguf_f32.path, ECFG)


class TestEngineLogprobs:
    def test_greedy_sampled_is_top1(self, engine):
        gen = GenerationConfig(max_new_tokens=6, greedy=True, logprobs=3)
        r = engine.generate(PROMPT, gen)
        assert r.logprobs is not None and len(r.logprobs) == len(r.token_ids)
        for e in r.logprobs:
            assert e["logprob"] <= 0.0
            assert len(e["top"]) == 3
            # greedy from the raw distribution → sampled == argmax == top-1
            assert e["top"][0][0] == e["token_id"]
            assert e["top"][0][1] == pytest.approx(e["logprob"])
            lps = [lp for _, lp in e["top"]]
            assert lps == sorted(lps, reverse=True)

    def test_off_by_default(self, engine):
        r = engine.generate(PROMPT, GenerationConfig(max_new_tokens=4,
                                                     greedy=True))
        assert r.logprobs is None

    def test_tokens_unchanged_by_logprobs(self, engine):
        """Requesting logprobs must not perturb sampling (it forces K=1
        but the per-step math is identical)."""
        a = engine.generate(PROMPT, GenerationConfig(
            max_new_tokens=8, temperature=0.9, seed=3)).token_ids
        b = engine.generate(PROMPT, GenerationConfig(
            max_new_tokens=8, temperature=0.9, seed=3, logprobs=0))
        assert a == b.token_ids
        assert len(b.logprobs) == len(b.token_ids)
        assert all(e["top"] == [] for e in b.logprobs)

    def test_stream_events_carry_logprobs(self, engine):
        gen = GenerationConfig(max_new_tokens=5, greedy=True, logprobs=2)
        for ev in engine.generate_stream(PROMPT, gen):
            assert ev.logprob is not None and ev.logprob <= 0.0
            assert len(ev.top_logprobs) == 2

    def test_batch_api_rejects(self, engine):
        with pytest.raises(InferenceError):
            engine.generate_batch([PROMPT], GenerationConfig(logprobs=1))


# --------------------------------------------------------------- scheduler
class TestSchedulerLogprobs:
    @pytest.fixture(scope="class")
    def sched(self, mini_gguf_f32):
        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(cfg, params, tok, ECFG, num_slots=2,
                                        decode_steps_per_dispatch=4)
        yield s
        s.shutdown()

    def collect(self, req, timeout=120):
        toks = []
        while True:
            tok, _text, done, r = req.out.get(timeout=timeout)
            if tok is not None:
                toks.append(tok)
            if done:
                return toks, r

    def test_engine_parity(self, sched, engine):
        gen = GenerationConfig(max_new_tokens=8, greedy=True, logprobs=2)
        want = engine.generate(PROMPT, gen)
        req = sched.submit(PROMPT, gen)
        got, _ = self.collect(req)
        assert got == want.token_ids
        assert len(req.logprobs) == len(got)
        for se, ee in zip(req.logprobs, want.logprobs):
            assert se["token_id"] == ee["token_id"]
            assert se["logprob"] == pytest.approx(ee["logprob"], abs=1e-4)
            assert [t["token_id"] for t in se["top"]] == \
                [i for i, _ in ee["top"]]
            assert se["top"][0]["token"] == \
                sched.tokenizer.token_to_piece(se["top"][0]["token_id"])

    def test_plain_slot_unaffected(self, sched):
        req = sched.submit(PROMPT, GenerationConfig(max_new_tokens=4,
                                                    greedy=True))
        toks, _ = self.collect(req)
        assert req.logprobs is None and len(toks) == 4


# ------------------------------------------------------------------ server
class TestServerHelpers:
    def test_resolve_logprobs(self):
        from bitnet_tpu.serve.server import _resolve_logprobs

        assert _resolve_logprobs({}) is None
        assert _resolve_logprobs({"logprobs": False}) is None
        assert _resolve_logprobs({"logprobs": True}) == 0
        assert _resolve_logprobs({"logprobs": True, "top_logprobs": 5}) == 5
        assert _resolve_logprobs({"logprobs": 3}) == 3

    def test_validate_body(self):
        from bitnet_tpu.serve.server import _validate_body

        base = {"prompt": "x"}
        assert _validate_body(dict(base, logprobs="yes")) is not None
        assert _validate_body(dict(base, logprobs=99)) is not None
        assert _validate_body(dict(base, top_logprobs=-2)) is not None
        assert _validate_body(dict(base, logprobs=True,
                                   top_logprobs=4)) is None
        assert _validate_body(dict(base, logprobs=5)) is None

    def test_openai_formatters(self):
        from bitnet_tpu.serve.server import _chat_logprobs, _openai_logprobs

        entries = [
            {"token_id": 7, "text": "he", "logprob": -0.1,
             "top": [{"token_id": 7, "token": "he", "logprob": -0.1},
                     {"token_id": 9, "token": "she", "logprob": -2.3}]},
            {"token_id": 2, "text": "y", "logprob": -0.5, "top": []},
        ]
        c = _openai_logprobs(entries)
        assert c["tokens"] == ["he", "y"]
        assert c["token_logprobs"] == [-0.1, -0.5]
        assert c["text_offset"] == [0, 2]
        assert c["top_logprobs"][0] == {"he": -0.1, "she": -2.3}
        ch = _chat_logprobs(entries)
        assert ch["content"][0]["token"] == "he"
        assert ch["content"][0]["top_logprobs"][1]["logprob"] == -2.3


# ------------------------------------------------------------------ compat
class TestCompatLogprobs:
    def test_create_completion_block(self, mini_gguf_f32):
        from bitnet_tpu.compat import Llama

        llm = Llama(mini_gguf_f32.path, n_ctx=128, seed=5, verbose=False)
        out = llm.create_completion("q", max_tokens=5, temperature=0.0,
                                    logprobs=2)
        blk = out["choices"][0]["logprobs"]
        assert blk is not None
        assert len(blk["tokens"]) == len(blk["token_logprobs"]) == \
            len(blk["top_logprobs"]) == len(blk["text_offset"])
        assert all(lp <= 0.0 for lp in blk["token_logprobs"])
        chat = llm.create_chat_completion(
            [{"role": "user", "content": "q"}], max_tokens=4,
            temperature=0.0, logprobs=True, top_logprobs=2)
        blk = chat["choices"][0]["logprobs"]
        assert blk is not None and len(blk["content"]) == 4
        assert len(blk["content"][0]["top_logprobs"]) == 2
        plain = llm.create_completion("q", max_tokens=3, temperature=0.0)
        assert plain["choices"][0]["logprobs"] is None


# ----------------------------------------------------------- embeddings
class TestSchedulerEmbeddings:
    def test_embed_ids_shape_and_determinism(self, mini_gguf_f32):
        import jax.numpy as jnp

        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(cfg, params, tok, ECFG,
                                        num_slots=1, start_loop=False)
        try:
            h = s.embed_ids([1, 7, 20, 3])
            assert h.shape == (4, cfg.hidden_size)
            assert np.isfinite(h).all()
            h2 = s.embed_ids([1, 7, 20, 3])
            np.testing.assert_allclose(h, h2, rtol=1e-5)
            # matches the engine's embedding path
            eng = InferenceEngine.from_gguf(mini_gguf_f32.path, ECFG)
            np.testing.assert_allclose(h, eng.embed_ids([1, 7, 20, 3]),
                                       rtol=1e-4, atol=1e-5)
            with pytest.raises(InferenceError):
                s.embed_ids([])
            with pytest.raises(InferenceError):
                s.embed_ids(list(range(ECFG.max_seq_len + 1)))
        finally:
            s.shutdown()


# -------------------------------------------------------- min_new_tokens
class TestMinNewTokens:
    """vLLM min_tokens semantics: EOS/stop triggers suppressed (and the
    EOS/stop logits banned) until N tokens are emitted."""

    def test_config_validation(self):
        GenerationConfig(max_new_tokens=8, min_new_tokens=8)
        with pytest.raises(ConfigError):
            GenerationConfig(max_new_tokens=4, min_new_tokens=5)
        with pytest.raises(ConfigError):
            GenerationConfig(min_new_tokens=-1)

    def test_stop_criteria_gating(self):
        from bitnet_tpu.engine.stop import StopCriteria, StopReason

        st = StopCriteria(max_new_tokens=10, eos_token_id=2,
                          stop_token_ids=frozenset({5}),
                          stop_sequences=("ab",), min_new_tokens=3)
        assert st.check(2, "x") is None          # EOS suppressed (1)
        assert st.check(5, "a") is None          # stop id suppressed (2)
        assert st.check(7, "b") is None          # 'ab' straddle suppressed (3)
        assert st.check(2, "y") == StopReason.EOS  # armed at 4

    def test_engine_forces_minimum(self, engine):
        """EOS-biased generation must still emit >= min tokens."""
        eos = engine.tokenizer.eos_token_id
        # bias every step hard toward EOS: without min the run stops at
        # once; with min it must push through N tokens first
        gen0 = GenerationConfig(max_new_tokens=12, greedy=True,
                                logit_bias=((eos, 1000.0),))
        r0 = engine.generate(PROMPT, gen0)
        assert len(r0.token_ids) == 0            # instant EOS
        from bitnet_tpu.engine.stop import StopReason

        gen = gen0.replace(min_new_tokens=5)
        r = engine.generate(PROMPT, gen)
        assert len(r.token_ids) >= 5
        assert eos not in r.token_ids[:5]
        assert r.stop_reason == StopReason.EOS   # fires right after min

    def test_scheduler_engine_parity(self, engine, mini_gguf_f32):
        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        eos = engine.tokenizer.eos_token_id
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        for gen in (
            GenerationConfig(max_new_tokens=10, greedy=True,
                             min_new_tokens=4,
                             logit_bias=((eos, 1000.0),)),
            GenerationConfig(max_new_tokens=10, temperature=0.9, seed=3,
                             min_new_tokens=6),
        ):
            want = engine.generate(PROMPT, gen)
            s = ContinuousBatchingScheduler(cfg, params, tok, ECFG,
                                            num_slots=2,
                                            decode_steps_per_dispatch=4)
            try:
                req = s.submit(PROMPT, gen)
                toks = []
                while True:
                    t, _x, done, r = req.out.get(timeout=120)
                    if t is not None:
                        toks.append(t)
                    if done:
                        break
                assert toks == want.token_ids, gen
                assert len(toks) >= gen.min_new_tokens
            finally:
                s.shutdown()
