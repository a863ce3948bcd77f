"""llama-cpp-python compat surface (bitnet_tpu.compat.llama) +
engine-level logit_bias / frequency / presence penalties.

Reference: crates/bitnet-py/src/llama_compat.py (drop-in Llama class),
crates/bitnet-py/tests/test_llama_compat.py.
"""

import numpy as np
import pytest

from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf


@pytest.fixture(scope="module")
def mini_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("compat") / "mini.gguf"
    generate_mini_gguf(str(p), MiniModelSpec(
        hidden_size=128, intermediate_size=256, quant="f32",
        max_seq_len=256))
    return str(p)


@pytest.fixture(scope="module")
def llama(mini_path):
    from bitnet_tpu.compat import Llama

    return Llama(mini_path, n_ctx=256, seed=7, verbose=False)


class TestSamplingTransforms:
    def test_logit_bias_shifts(self):
        import jax.numpy as jnp

        from bitnet_tpu.engine.sampling import NEG_INF, apply_logit_bias

        lg = jnp.zeros((1, 8), jnp.float32)
        out = apply_logit_bias(lg, ((2, 5.0), (3, -1.0)))
        assert float(out[0, 2]) == 5.0
        assert float(out[0, 3]) == -1.0
        assert float(out[0, 0]) == 0.0

    def test_logit_bias_hard_ban(self):
        import jax.numpy as jnp

        from bitnet_tpu.engine.sampling import NEG_INF, apply_logit_bias

        lg = jnp.full((1, 8), 10.0, jnp.float32)
        out = apply_logit_bias(lg, ((1, -100.0),))
        assert float(out[0, 1]) <= NEG_INF

    def test_logit_bias_oob_token_ignored(self):
        import jax.numpy as jnp

        from bitnet_tpu.engine.sampling import apply_logit_bias

        lg = jnp.zeros((1, 8), jnp.float32)
        out = apply_logit_bias(lg, ((100, 5.0),))
        assert np.allclose(np.asarray(out), 0.0)

    def test_presence_frequency(self):
        import jax.numpy as jnp

        from bitnet_tpu.engine.sampling import apply_presence_frequency

        lg = jnp.zeros((1, 8), jnp.float32)
        hist = jnp.asarray([[3, 3, 5, -1]], jnp.int32)
        out = apply_presence_frequency(lg, hist, 0.5, 1.0)
        # token 3 seen twice: -0.5*2 - 1.0 = -2.0
        assert float(out[0, 3]) == pytest.approx(-2.0)
        # token 5 seen once: -0.5 - 1.0 = -1.5
        assert float(out[0, 5]) == pytest.approx(-1.5)
        # unseen tokens untouched; padding (-1) ignored
        assert float(out[0, 0]) == 0.0

    def test_chain_greedy_respects_bias(self):
        import jax
        import jax.numpy as jnp

        from bitnet_tpu.config import GenerationConfig
        from bitnet_tpu.engine.sampling import SamplerChain

        cfg = GenerationConfig(greedy=True, logit_bias=((4, 100.0),))
        chain = SamplerChain(cfg)
        lg = jnp.zeros((1, 8), jnp.float32).at[0, 2].set(5.0)
        hist = jnp.full((1, 4), -1, jnp.int32)
        tok = chain.sample(lg, hist, jax.random.PRNGKey(0))
        assert int(tok[0]) == 4

    def test_config_accepts_dict_bias(self):
        from bitnet_tpu.config import GenerationConfig

        g = GenerationConfig(logit_bias={7: 1.5, 2: -0.5})
        assert g.logit_bias == ((2, -0.5), (7, 1.5))
        hash(g)  # stays hashable for the jit cache key


class TestEngineBias:
    def test_forced_token_via_bias(self, mini_path):
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine.engine import InferenceEngine

        eng = InferenceEngine.from_gguf(
            mini_path, EngineConfig(max_seq_len=256))
        forced = 17
        cfg = GenerationConfig(
            max_new_tokens=4, greedy=True,
            logit_bias=((forced, 10_000.0),))
        res = eng.generate([1, 2, 3], cfg)
        assert res.token_ids == [forced] * 4

    def test_banned_token_never_sampled(self, mini_path):
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine.engine import InferenceEngine

        eng = InferenceEngine.from_gguf(
            mini_path, EngineConfig(max_seq_len=256))
        base = eng.generate(
            [1, 2, 3], GenerationConfig(max_new_tokens=4, greedy=True))
        banned = base.token_ids[0]
        res = eng.generate([1, 2, 3], GenerationConfig(
            max_new_tokens=4, greedy=True,
            logit_bias=((banned, -100.0),)))
        assert banned not in res.token_ids


class TestLlamaClass:
    def test_tokenize_roundtrip(self, llama):
        toks = llama.tokenize("hello world", add_bos=False)
        assert toks and all(isinstance(t, int) for t in toks)
        text = llama.detokenize(toks).decode("utf-8")
        assert "hello" in text

    def test_properties(self, llama):
        assert llama.n_vocab > 0
        assert llama.n_ctx == 256
        assert llama.n_embd == 128

    def test_call_completion_format(self, llama):
        out = llama("hi", max_tokens=4, temperature=0.0)
        assert out["object"] == "text_completion"
        assert out["choices"][0]["finish_reason"] in ("length", "stop")
        assert out["usage"]["completion_tokens"] <= 4
        assert isinstance(out["choices"][0]["text"], str)

    def test_echo_prepends_prompt(self, llama):
        out = llama("abc", max_tokens=2, temperature=0.0, echo=True)
        assert out["choices"][0]["text"].startswith("abc")

    def test_deterministic_with_seed(self, llama):
        a = llama("det", max_tokens=4, temperature=0.8, seed=42)
        b = llama("det", max_tokens=4, temperature=0.8, seed=42)
        assert a["choices"][0]["text"] == b["choices"][0]["text"]

    def test_streaming_chunks(self, llama):
        chunks = list(llama("s", max_tokens=3, temperature=0.0, stream=True))
        assert chunks[-1]["choices"][0]["finish_reason"] in ("length", "stop")
        assert all(c["object"] == "text_completion" for c in chunks)
        text = "".join(c["choices"][0]["text"] for c in chunks)
        non_stream = llama("s", max_tokens=3, temperature=0.0)
        assert text == non_stream["choices"][0]["text"]

    def test_batch_prompts(self, llama):
        out = llama.create_completion(["a", "b"], max_tokens=2,
                                      temperature=0.0)
        assert len(out["choices"]) == 2
        assert [c["index"] for c in out["choices"]] == [0, 1]

    def test_token_prompt(self, llama):
        ids = llama.tokenize("x")
        out = llama.create_completion(ids, max_tokens=2, temperature=0.0)
        assert out["usage"]["prompt_tokens"] == len(ids)

    def test_chat_completion(self, llama):
        out = llama.create_chat_completion(
            [{"role": "user", "content": "hi"}], max_tokens=3,
            temperature=0.0)
        assert out["object"] == "chat.completion"
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert isinstance(msg["content"], str)

    def test_chat_stream(self, llama):
        chunks = list(llama.create_chat_completion(
            [{"role": "user", "content": "hi"}], max_tokens=2,
            temperature=0.0, stream=True))
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[-1]["choices"][0]["finish_reason"] is not None
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)

    def test_low_level_eval_sample(self, llama):
        llama.reset()
        toks = llama.tokenize("abc")
        assert llama.eval(toks) == 0
        t1 = llama.sample(temperature=0.0)
        assert 0 <= t1 < llama.n_vocab
        # greedy sample must equal the engine's greedy continuation
        from bitnet_tpu.config import GenerationConfig

        res = llama._engine.generate(
            toks, GenerationConfig(max_new_tokens=1, greedy=True))
        assert t1 == res.token_ids[0]

    def test_generate_iterator(self, llama):
        toks = llama.tokenize("xy")
        gen = llama.generate(toks, temperature=0.0, repeat_penalty=1.0)
        out = [next(gen) for _ in range(3)]
        assert len(out) == 3
        # matches engine greedy continuation token-for-token
        from bitnet_tpu.config import GenerationConfig

        res = llama._engine.generate(
            toks, GenerationConfig(max_new_tokens=3, greedy=True))
        assert out == res.token_ids

    def test_embeddings(self, llama):
        out = llama.create_embedding("hello")
        emb = out["data"][0]["embedding"]
        assert len(emb) == llama.n_embd
        assert out["usage"]["prompt_tokens"] > 0
        flat = llama.embed("hello")
        assert flat == emb

    def test_logit_bias_forces_token(self, llama):
        forced = 23
        out = llama("f", max_tokens=2, temperature=0.0,
                    logit_bias={forced: 10_000.0})
        llama.reset()
        toks = llama.tokenize("f")
        from bitnet_tpu.config import GenerationConfig

        res = llama._engine.generate(toks, GenerationConfig(
            max_new_tokens=2, greedy=True,
            logit_bias=((forced, 10_000.0),)))
        assert res.token_ids == [forced, forced]

    def test_save_load_state(self, llama):
        llama.reset()
        llama.eval(llama.tokenize("abc"))
        st = llama.save_state()
        n = llama._n_past
        llama.reset()
        assert llama._n_past == 0
        llama.load_state(st)
        assert llama._n_past == n

    def test_backend_helpers(self):
        from bitnet_tpu.compat import (LlamaCache, llama_backend_free,
                                       llama_backend_init)

        llama_backend_init()
        llama_backend_free()
        c = LlamaCache(16)
        c.data["k"] = 1
        import pickle

        c2 = pickle.loads(pickle.dumps(c))
        assert c2.data == {"k": 1}
