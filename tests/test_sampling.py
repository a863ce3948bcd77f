"""Sampling transform tests (mirrors bitnet-logits / bitnet-sampling tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import GenerationConfig
from bitnet_tpu.engine import (
    MirostatState,
    SamplerChain,
    apply_min_p,
    apply_repetition_penalty,
    apply_temperature,
    apply_top_k,
    apply_top_p,
    apply_typical_p,
    argmax,
    softmax,
)

NEG = -1e29


def logits_row(vals):
    return jnp.asarray([vals], dtype=jnp.float32)


class TestTemperature:
    def test_divides(self):
        out = apply_temperature(logits_row([2.0, 4.0]), 2.0)
        np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0]])

    def test_zero_clamped(self):
        out = apply_temperature(logits_row([1.0, 2.0]), 0.0)
        assert np.isfinite(np.asarray(out)).all()


class TestTopK:
    def test_masks_all_but_k(self):
        out = np.asarray(apply_top_k(logits_row([1.0, 5.0, 3.0, 2.0]), 2))
        assert out[0, 1] == 5.0 and out[0, 2] == 3.0
        assert out[0, 0] < NEG and out[0, 3] < NEG

    def test_disabled(self):
        x = logits_row([1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(apply_top_k(x, 0)),
                                      np.asarray(x))

    def test_k_larger_than_vocab(self):
        x = logits_row([1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(apply_top_k(x, 10)),
                                      np.asarray(x))


class TestTopP:
    def test_keeps_nucleus(self):
        # probs ~ [0.64, 0.24, 0.09, 0.03]; p=0.7 keeps first two
        x = logits_row([4.0, 3.0, 2.0, 1.0])
        out = np.asarray(apply_top_p(x, 0.7))
        assert out[0, 0] == 4.0 and out[0, 1] == 3.0
        assert out[0, 2] < NEG and out[0, 3] < NEG

    def test_always_keeps_argmax(self):
        x = logits_row([10.0, 0.0, 0.0])
        out = np.asarray(apply_top_p(x, 0.01))
        assert out[0, 0] == 10.0

    def test_disabled(self):
        x = logits_row([1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(apply_top_p(x, 1.0)),
                                      np.asarray(x))


class TestMinP:
    def test_drops_below_threshold(self):
        x = logits_row([np.log(0.6), np.log(0.3), np.log(0.1)])
        out = np.asarray(apply_min_p(x, 0.25))  # min prob = 0.15
        assert out[0, 0] > NEG and out[0, 1] > NEG
        assert out[0, 2] < NEG


class TestTypicalP:
    def test_uniform_keeps_subset(self):
        x = logits_row([1.0, 1.0, 1.0, 1.0])
        out = np.asarray(apply_typical_p(x, 0.5))
        kept = (out[0] > NEG).sum()
        assert 1 <= kept < 4

    def test_disabled(self):
        x = logits_row([3.0, 1.0])
        np.testing.assert_array_equal(np.asarray(apply_typical_p(x, 1.0)),
                                      np.asarray(x))


class TestRepetitionPenalty:
    def test_penalizes_seen_tokens(self):
        x = logits_row([2.0, -2.0, 1.0])
        hist = jnp.asarray([[0, 1, -1, -1]], jnp.int32)
        out = np.asarray(apply_repetition_penalty(x, hist, 2.0))
        assert out[0, 0] == pytest.approx(1.0)    # positive divided
        assert out[0, 1] == pytest.approx(-4.0)   # negative multiplied
        assert out[0, 2] == pytest.approx(1.0)    # unseen unchanged

    def test_padding_ignored(self):
        x = logits_row([2.0, 2.0])
        hist = jnp.asarray([[-1, -1]], jnp.int32)
        out = np.asarray(apply_repetition_penalty(x, hist, 2.0))
        np.testing.assert_allclose(out, np.asarray(x))


class TestSamplerChain:
    def test_greedy_deterministic(self):
        cfg = GenerationConfig(greedy=True)
        chain = SamplerChain(cfg)
        x = logits_row([1.0, 5.0, 3.0])
        hist = jnp.full((1, 4), -1, jnp.int32)
        k = jax.random.PRNGKey(0)
        for _ in range(3):
            assert int(chain.sample(x, hist, k)[0]) == 1

    def test_temperature_zero_is_greedy(self):
        cfg = GenerationConfig(temperature=0.0)
        assert cfg.is_greedy

    def test_sampling_respects_topk1(self):
        cfg = GenerationConfig(temperature=1.0, top_k=1)
        chain = SamplerChain(cfg)
        x = logits_row([1.0, 5.0, 3.0])
        hist = jnp.full((1, 4), -1, jnp.int32)
        for s in range(5):
            tok = int(chain.sample(x, hist, jax.random.PRNGKey(s))[0])
            assert tok == 1

    def test_distribution_roughly_matches(self):
        cfg = GenerationConfig(temperature=1.0)
        chain = SamplerChain(cfg)
        x = logits_row([0.0, np.log(3.0)])  # P(1)=0.75
        hist = jnp.full((1, 4), -1, jnp.int32)
        key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, 400)
        toks = [int(chain.sample(x, hist, k)[0]) for k in keys[:400]]
        frac = np.mean(np.asarray(toks) == 1)
        assert 0.65 < frac < 0.85


class TestMirostat:
    def test_mu_adapts(self):
        cfg = GenerationConfig(mirostat=2, mirostat_tau=3.0)
        st = MirostatState.from_config(cfg)
        mu0 = st.mu
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(64), jnp.float32)
        for s in range(10):
            st.sample(x, jax.random.PRNGKey(s))
        assert st.mu != mu0
        assert np.isfinite(st.mu)

    def test_v1_runs(self):
        cfg = GenerationConfig(mirostat=1)
        st = MirostatState.from_config(cfg)
        x = jnp.asarray(np.linspace(3, -3, 128), jnp.float32)
        tok = st.sample(x, jax.random.PRNGKey(0))
        assert 0 <= tok < 128


class TestBasics:
    def test_softmax_normalizes(self):
        p = np.asarray(softmax(logits_row([1.0, 2.0, 3.0])))
        assert p.sum() == pytest.approx(1.0, abs=1e-6)

    def test_argmax(self):
        assert int(argmax(logits_row([1.0, 9.0, 3.0]))[0]) == 1
