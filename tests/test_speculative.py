"""Speculative decoding tests.

Gate: greedy speculative output must be IDENTICAL to plain greedy decode
(lossless acceptance), for both the n-gram and engine draft sources.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine.speculative import (
    AcceptanceStats,
    EngineDraft,
    NgramDraft,
    SpeculativeConfig,
    SpeculativeDecoder,
)
from bitnet_tpu.models import load_model


@pytest.fixture(scope="module")
def model(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    return cfg, params


def mk_engine(model):
    cfg, params = model
    return InferenceEngine(
        cfg, params,
        EngineConfig(max_seq_len=64, kv_cache_dtype="f32",
                     compute_dtype="f32"))


class TestNgramDraft:
    def test_repeating_pattern_found(self):
        d = NgramDraft(max_ngram=3)
        # ... 5 6 7 | 5 6 7 → suffix [5,6,7] matched earlier, proposes 5,6,7
        toks = [1, 5, 6, 7, 9, 5, 6, 7]
        assert d.propose(toks, 3)[0] == 9
        toks = [5, 6, 7, 9, 2, 5, 6, 7]
        assert d.propose(toks, 2) == [9, 2]

    def test_fallback_repeats_last(self):
        d = NgramDraft()
        assert d.propose([3, 1, 4], 3) == [4, 4, 4]

    def test_pads_short_continuation(self):
        d = NgramDraft(max_ngram=1)
        out = d.propose([7, 8, 7], 4)
        assert len(out) == 4 and out[0] == 8


class TestSpeculativeLossless:
    def test_ngram_matches_plain_greedy(self, model):
        plain = mk_engine(model)
        gen = GenerationConfig(max_new_tokens=16, greedy=True)
        prompt = [2, 7, 11, 13, 17]
        golden = plain.generate(prompt, gen).token_ids

        spec_eng = mk_engine(model)
        dec = SpeculativeDecoder(spec_eng,
                                 spec_cfg=SpeculativeConfig(num_draft_tokens=4))
        res = dec.generate(prompt, gen)
        assert res.token_ids == golden, (res.token_ids, golden)
        assert res.spec_stats["proposed"] > 0
        assert res.spec_stats["rounds"] > 0

    def test_engine_draft_matches_plain_greedy(self, model):
        """Draft == target model → 100% acceptance, identical output."""
        plain = mk_engine(model)
        gen = GenerationConfig(max_new_tokens=12, greedy=True)
        prompt = [3, 5, 8, 12, 30]
        golden = plain.generate(prompt, gen).token_ids

        target = mk_engine(model)
        draft = EngineDraft(mk_engine(model))
        dec = SpeculativeDecoder(target, draft=draft,
                                 spec_cfg=SpeculativeConfig(num_draft_tokens=3))
        res = dec.generate(prompt, gen)
        assert res.token_ids == golden, (res.token_ids, golden)
        # same model drafts perfectly → full acceptance
        assert res.spec_stats["acceptance_rate"] == 1.0, res.spec_stats

    def test_stop_sequence_respected(self, model):
        plain = mk_engine(model)
        gen = GenerationConfig(max_new_tokens=16, greedy=True)
        prompt = [2, 7, 11, 13, 17]
        golden = plain.generate(prompt, gen).token_ids
        stop_at = golden[5]

        spec_eng = mk_engine(model)
        dec = SpeculativeDecoder(spec_eng)
        gen2 = GenerationConfig(max_new_tokens=16, greedy=True,
                                stop_token_ids=(stop_at,))
        res = dec.generate(prompt, gen2)
        # stop tokens are NOT emitted — same contract as generate_stream
        cut = golden.index(stop_at)
        assert stop_at not in res.token_ids
        assert res.token_ids == golden[:cut]


class TestThresholdPolicy:
    def test_threshold_runs_and_counts(self, model):
        eng = mk_engine(model)
        dec = SpeculativeDecoder(
            eng, spec_cfg=SpeculativeConfig(num_draft_tokens=3,
                                            policy="threshold",
                                            accept_threshold=0.05))
        res = dec.generate([2, 7, 11], GenerationConfig(max_new_tokens=8,
                                                        greedy=True))
        assert len(res.token_ids) <= 8
        s = res.spec_stats
        assert s["proposed"] >= s["accepted"] >= 0


class TestStats:
    def test_acceptance_rate(self):
        s = AcceptanceStats(rounds=2, proposed=8, accepted=6)
        assert s.acceptance_rate == 0.75
        assert s.as_dict()["acceptance_rate"] == 0.75

    def test_bad_config(self):
        with pytest.raises(Exception):
            SpeculativeConfig(num_draft_tokens=0)
        with pytest.raises(Exception):
            SpeculativeConfig(policy="bogus")
