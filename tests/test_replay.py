"""Deterministic replay-from-receipt tests."""

import json

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.errors import InferenceError
from bitnet_tpu.models import load_model
from bitnet_tpu.verify.receipts import InferenceReceipt, generate_receipt
from bitnet_tpu.verify.replay import replay_receipt


@pytest.fixture(scope="module")
def engine(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    return InferenceEngine(
        cfg, params,
        EngineConfig(max_seq_len=64, kv_cache_dtype="f32",
                     compute_dtype="f32"))


class TestReplay:
    def test_greedy_replay_matches(self, engine):
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        engine.generate([2, 7, 11], gen)
        rec = generate_receipt(engine)
        assert rec.request is not None
        rep = replay_receipt(engine, rec)
        assert rep.matched, rep.as_dict()

    def test_seeded_sampling_replay_matches(self, engine):
        gen = GenerationConfig(max_new_tokens=6, temperature=0.9, seed=123)
        engine.generate([3, 5, 8], gen)
        rec = generate_receipt(engine)
        rep = replay_receipt(engine, rec)
        assert rep.matched, rep.as_dict()

    def test_divergence_detected(self, engine):
        gen = GenerationConfig(max_new_tokens=4, greedy=True)
        engine.generate([2, 7, 11], gen)
        rec = generate_receipt(engine)
        rec.request["output_ids"][1] = 9999   # tamper
        rep = replay_receipt(engine, rec)
        assert not rep.matched
        assert rep.first_divergence == 1

    def test_receipt_without_request_rejected(self, engine):
        rec = InferenceReceipt()
        with pytest.raises(InferenceError, match="no request"):
            replay_receipt(engine, rec)

    def test_nondeterministic_request_rejected(self, engine):
        rec = InferenceReceipt(request={
            "prompt_ids": [1], "output_ids": [2],
            "gen": {"seed": None, "greedy": False}})
        with pytest.raises(InferenceError, match="non-deterministic"):
            replay_receipt(engine, rec)

    def test_receipt_roundtrips_request(self, engine):
        gen = GenerationConfig(max_new_tokens=3, greedy=True)
        engine.generate([4, 6], gen)
        rec = generate_receipt(engine)
        rec2 = InferenceReceipt.from_json(rec.to_json())
        assert rec2.request == rec.request
