"""Engine batch API tests.

Gate: batched greedy generation must equal per-prompt single generation
(slot isolation — one sequence must never leak into another's attention).
"""

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.errors import InferenceError
from bitnet_tpu.models import load_model


@pytest.fixture(scope="module")
def model(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    return cfg, params


def mk_engine(model, batch=4):
    cfg, params = model
    return InferenceEngine(
        cfg, params,
        EngineConfig(max_seq_len=64, max_batch_size=batch,
                     kv_cache_dtype="f32", compute_dtype="f32"))


class TestBatchAPI:
    def test_batch_matches_single(self, model):
        gen = GenerationConfig(max_new_tokens=8, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        single = mk_engine(model, batch=1)
        golden = [single.generate(p, gen).token_ids for p in prompts]

        eng = mk_engine(model, batch=4)
        results = eng.generate_batch(prompts, gen)
        for i, (r, g) in enumerate(zip(results, golden)):
            assert r.token_ids == g, f"slot {i}: {r.token_ids} != {g}"
            assert r.prompt_tokens == len(prompts[i])

    def test_partial_batch(self, model):
        eng = mk_engine(model, batch=4)
        gen = GenerationConfig(max_new_tokens=4, greedy=True)
        results = eng.generate_batch([[2, 7], [3, 5, 8]], gen)
        assert len(results) == 2
        assert all(len(r.token_ids) <= 4 for r in results)

    def test_per_slot_stop_tokens(self, model):
        eng = mk_engine(model, batch=2)
        gen = GenerationConfig(max_new_tokens=8, greedy=True)
        base = eng.generate_batch([[2, 7, 11], [3, 5, 8]], gen)
        stop_tok = base[0].token_ids[2]
        gen2 = GenerationConfig(max_new_tokens=8, greedy=True,
                                stop_token_ids=(stop_tok,))
        res = eng.generate_batch([[2, 7, 11], [3, 5, 8]], gen2)
        # slot 0 stops early; slot 1 only stops if it also hits the token
        assert len(res[0].token_ids) <= 2
        if stop_tok not in base[1].token_ids:
            assert res[1].token_ids == base[1].token_ids

    def test_oversized_batch_rejected(self, model):
        eng = mk_engine(model, batch=2)
        with pytest.raises(InferenceError, match="max_batch_size"):
            eng.generate_batch([[1], [2], [3]])

    def test_empty_prompt_rejected(self, model):
        eng = mk_engine(model, batch=2)
        with pytest.raises(InferenceError, match="empty"):
            eng.generate_batch([[1], []])

    def test_empty_batch(self, model):
        eng = mk_engine(model, batch=2)
        assert eng.generate_batch([]) == []


class TestBatchW2A8:
    def test_w2a8_batch_matches_single(self, mini_gguf_qk256):
        """B=4 batched w2a8 (stacked loop + XLA attention) must equal the
        B=1 w2a8 decode (stacked loop + flash-decode kernel) token-for-
        token — slot isolation AND numerical agreement of the two
        attention paths inside the stacked decode."""
        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=8, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def mk(batch):
            return InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=batch,
                             kv_cache_dtype="f32", compute_dtype="f32",
                             kernel_path="w2a8"))

        single = mk(1)
        golden = [single.generate(p, gen).token_ids for p in prompts]
        results = mk(4).generate_batch(prompts, gen)
        for i, (r, g) in enumerate(zip(results, golden)):
            assert r.token_ids == g, f"slot {i}: {r.token_ids} != {g}"

    @pytest.mark.parametrize("B", [20, 48])
    def test_w2a8_big_batch_matches_single(self, mini_gguf_qk256, B):
        """Pools above the old one-M-block caps must equal B=1 decode
        token-for-token: B=20 (17-32, eligible since round 3) and B=48
        (33-64, eligible since the round-5 stacked_decode_max_m raise —
        before it, 48-slot pools silently fell to the generic per-layer
        path at 19x the device step time)."""
        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[(3 * i + 2) % 40 + 1, (7 * i) % 50 + 1]
                   for i in range(B)]

        def mk(batch):
            return InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=batch,
                             kv_cache_dtype="f32", compute_dtype="f32",
                             kernel_path="w2a8"))

        single = mk(1)
        golden = [single.generate(p, gen).token_ids for p in prompts]
        results = mk(B).generate_batch(prompts, gen)
        for i, (r, g) in enumerate(zip(results, golden)):
            assert r.token_ids == g, f"slot {i}: {r.token_ids} != {g}"
