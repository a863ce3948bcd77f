"""Session orchestration + NN op extras + tokenizer download gate tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine.session import (
    Session,
    SessionConfig,
    SessionState,
    StateTracker,
)
from bitnet_tpu.errors import InferenceError, TokenizerError
from bitnet_tpu.models import load_model
from bitnet_tpu.ops import nn_extras as nn
from bitnet_tpu.tokenizer.download import fetch_tokenizer, seed_cache


@pytest.fixture(scope="module")
def engine(mini_gguf_f32):
    from bitnet_tpu.tokenizer import load_tokenizer

    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    return InferenceEngine(
        cfg, params,
        EngineConfig(max_seq_len=128, kv_cache_dtype="f32",
                     compute_dtype="f32"),
        tokenizer=load_tokenizer(mini_gguf_f32.path))


class TestStateMachine:
    def test_legal_path(self):
        t = StateTracker()
        for s in (SessionState.PREFILLING, SessionState.DECODING,
                  SessionState.DONE, SessionState.PREFILLING):
            t.transition(s)
        assert len(t.history) == 5

    def test_illegal_transition(self):
        t = StateTracker()
        with pytest.raises(InferenceError, match="illegal"):
            t.transition(SessionState.DECODING)   # must prefill first

    def test_error_recovery(self):
        t = StateTracker()
        t.fail()
        assert t.state == SessionState.ERROR
        t.transition(SessionState.IDLE)


class TestSession:
    def test_multi_turn_chat(self, engine):
        s = Session(engine, SessionConfig(system_prompt="sys",
                                          template="chatml"))
        gen = GenerationConfig(max_new_tokens=4, greedy=True)
        r1 = s.send("hello", gen)
        assert s.state == SessionState.DONE
        r2 = s.send("again", gen)
        # history grew: system + 2 user + 2 assistant
        assert len(s.messages) == 5
        assert s.messages[0]["role"] == "system"
        assert isinstance(r1, str) and isinstance(r2, str)

    def test_reset(self, engine):
        s = Session(engine, SessionConfig(system_prompt="sys"))
        s.send("x", GenerationConfig(max_new_tokens=2, greedy=True))
        s.reset()
        assert len(s.messages) == 1
        assert s.state == SessionState.IDLE

    def test_history_eviction_budget(self, engine):
        s = Session(engine, SessionConfig(template="raw",
                                          max_history_tokens=32))
        # long message must be evicted down to the budget, not crash
        s.send("y" * 500, GenerationConfig(max_new_tokens=2, greedy=True))
        assert s.state == SessionState.DONE


class TestNNExtras:
    def test_layer_norm(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        g = jnp.ones(16)
        b = jnp.zeros(16)
        y = np.asarray(nn.layer_norm(x, g, b))
        np.testing.assert_allclose(y.mean(-1), 0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1, atol=1e-2)

    def test_conv_pool(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)), jnp.float32)
        y = nn.conv2d(x, w)
        assert y.shape == (1, 8, 8, 4)
        p = nn.max_pool2d(y)
        assert p.shape == (1, 4, 4, 4)
        a = nn.avg_pool2d(y)
        np.testing.assert_allclose(
            np.asarray(a)[0, 0, 0, 0],
            np.asarray(y)[0, :2, :2, 0].mean(), rtol=1e-5)

    def test_cross_entropy_matches_manual(self, rng):
        logits = jnp.asarray(rng.normal(size=(5, 11)), jnp.float32)
        targets = jnp.asarray(rng.integers(0, 11, 5))
        got = float(nn.cross_entropy(logits, targets))
        lg = np.asarray(logits, np.float64)
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = -np.mean(np.log(p[np.arange(5), np.asarray(targets)]))
        assert abs(got - want) < 1e-5

    def test_scatter_gather_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
        idx = jnp.asarray([4, 0, 2])
        rows = nn.gather_rows(x, idx)
        y = nn.scatter_rows(jnp.zeros_like(x), idx, rows)
        np.testing.assert_array_equal(np.asarray(y[4]), np.asarray(x[4]))
        np.testing.assert_array_equal(np.asarray(y[1]), 0)


class TestDownloadGate:
    def test_offline_raises_actionable(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BITNET_TOKENIZER_CACHE", str(tmp_path))
        monkeypatch.delenv("BITNET_ALLOW_DOWNLOADS", raising=False)
        with pytest.raises(TokenizerError, match="downloads are disabled"):
            fetch_tokenizer("org/model")

    def test_seed_cache_then_hit(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BITNET_TOKENIZER_CACHE", str(tmp_path / "c"))
        src = tmp_path / "tok.json"
        src.write_text("{}")
        seed_cache("org/model", str(src))
        assert os.path.exists(fetch_tokenizer("org/model"))
