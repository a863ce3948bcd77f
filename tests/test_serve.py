"""Continuous-batching scheduler + HTTP server tests.

Mirrors the reference server test surface (bitnet-server routes, batch
engine) but against the real scheduler on CPU.
"""

import json
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine.stop import StopReason
from bitnet_tpu.models import load_model
from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
from bitnet_tpu.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def sched(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    tok = load_tokenizer(mini_gguf_f32.path)
    s = ContinuousBatchingScheduler(
        cfg, params, tok,
        EngineConfig(max_seq_len=64, compute_dtype="f32"),
        num_slots=2,
    )
    yield s
    s.shutdown()


def collect(sched, req, timeout=120):
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


class TestScheduler:
    def test_single_request(self, sched):
        req = sched.submit([1, 5, 9], GenerationConfig(max_new_tokens=4,
                                                       greedy=True))
        toks, reason = collect(sched, req)
        assert 1 <= len(toks) <= 4
        assert reason is not None

    def test_greedy_matches_engine(self, sched, mini_gguf_f32):
        """Continuous-batching greedy output == single-sequence engine."""
        from bitnet_tpu.engine import InferenceEngine

        gen = GenerationConfig(max_new_tokens=5, greedy=True)
        req = sched.submit([1, 7, 20], gen)
        toks, _ = collect(sched, req)

        eng = InferenceEngine.from_gguf(
            mini_gguf_f32.path, EngineConfig(max_seq_len=64,
                                             compute_dtype="f32"))
        expected = eng.generate([1, 7, 20], gen).token_ids
        assert toks == expected

    def test_concurrent_requests(self, sched):
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        reqs = [sched.submit([1, i + 2, 9], gen) for i in range(5)]
        results = [collect(sched, r) for r in reqs]
        for toks, reason in results:
            assert len(toks) >= 1
        # determinism under batching: same prompt → same output
        r_a = sched.submit([1, 3, 9], gen)
        r_b = sched.submit([1, 3, 9], gen)
        ta, _ = collect(sched, r_a)
        tb, _ = collect(sched, r_b)
        assert ta == tb

    def test_stats_progress(self, sched):
        before = sched.stats["completed"]
        req = sched.submit([1, 2], GenerationConfig(max_new_tokens=2,
                                                    greedy=True))
        collect(sched, req)
        assert sched.stats["completed"] > before
        assert sched.stats["tokens_generated"] > 0

    def test_empty_prompt_rejected(self, sched):
        req = sched.submit([], GenerationConfig(max_new_tokens=2))
        toks, reason = collect(sched, req)
        assert toks == []
        assert reason == StopReason.CONTEXT_FULL


class TestHTTPServer:
    @pytest.fixture()
    def client(self, sched, event_loop=None):
        aiohttp = pytest.importorskip("aiohttp")
        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        return BitNetServer(sched), aiohttp

    def test_routes(self, client):
        server, aiohttp = client
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.get("/health")
                assert (await r.json())["status"] == "ok"

                r = await c.get("/v1/models")
                body = await r.json()
                assert body["models"][0]["architecture"]
                # OpenAI wire shape coexists with the native one
                assert body["object"] == "list"
                assert body["data"][0]["object"] == "model"

                r = await c.post("/v1/inference", json={
                    "prompt": "ab", "max_new_tokens": 3, "greedy": True})
                body = await r.json()
                assert r.status == 200
                assert body["num_tokens"] >= 1
                assert "latency_s" in body

                r = await c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 3, "greedy": True})
                body = await r.json()
                assert body["choices"][0]["message"]["role"] == "assistant"
                assert body["usage"]["completion_tokens"] >= 1

                r = await c.get("/v1/stats")
                assert (await r.json())["requests"] >= 1

                r = await c.get("/metrics")
                text = await r.text()
                assert "bitnet_tokens_generated" in text

                # SSE stream
                r = await c.post("/v1/inference/stream", json={
                    "prompt": "ab", "max_new_tokens": 3, "greedy": True})
                raw = await r.text()
                events = [json.loads(l[6:]) for l in raw.splitlines()
                          if l.startswith("data: ")]
                assert events[-1].get("done") is True
                assert any("token" in e for e in events)

                # error paths
                r = await c.post("/v1/inference", data=b"not json")
                assert r.status == 400

        asyncio.new_event_loop().run_until_complete(run())

    def test_bias_and_penalty_fields(self, client):
        server, aiohttp = client
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                # OpenAI-style knobs accepted and effective: a huge bias
                # forces that token under greedy decoding
                r = await c.post("/v1/inference", json={
                    "prompt": "ab", "max_new_tokens": 3, "greedy": True,
                    "logit_bias": {"19": 10000.0},
                    "frequency_penalty": 0.1, "presence_penalty": 0.1})
                assert r.status == 200
                body = await r.json()
                assert body["tokens"] == [19, 19, 19]

                # 422 validation on malformed values
                r = await c.post("/v1/inference", json={
                    "prompt": "x", "frequency_penalty": 9.0})
                assert r.status == 422
                r = await c.post("/v1/inference", json={
                    "prompt": "x", "logit_bias": ["nope"]})
                assert r.status == 422
                r = await c.post("/v1/inference", json={
                    "prompt": "x", "logit_bias": {"abc": 1.0}})
                assert r.status == 422
                r = await c.post("/v1/inference", json={
                    "prompt": "x", "logit_bias": {"-3": 1.0}})
                assert r.status == 422

        asyncio.new_event_loop().run_until_complete(run())


class TestPreemptionRecovery:
    def test_checkpoint_resume_matches_uninterrupted(self, mini_gguf_f32,
                                                     tmp_path):
        """Kill the scheduler mid-request, checkpoint, resume in a FRESH
        scheduler — combined output equals an uninterrupted run."""
        import jax.numpy as jnp

        from bitnet_tpu.models import load_model
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32",
                            kv_cache_dtype="f32")
        gen = GenerationConfig(max_new_tokens=10, greedy=True)
        prompt = [2, 7, 11, 13]

        # golden uninterrupted run
        s0 = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=2)
        golden, _ = collect(s0, s0.submit(prompt, gen))
        s0.shutdown()

        # interrupted run: take 4 tokens then preempt
        s1 = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=2)
        req = s1.submit(prompt, gen)
        first = []
        while len(first) < 4:
            t, _text, done, _r = req.out.get(timeout=120)
            if t is not None:
                first.append(t)
            assert not done, "finished before preemption point"
        s1.shutdown()
        ckdir = str(tmp_path / "preempt")
        paths = s1.checkpoint_requests(ckdir)
        assert len(paths) == 1

        # fresh scheduler resumes
        s2 = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=2)
        restored = s2.resume_requests(ckdir)
        assert len(restored) == 1
        rest, reason = collect(s2, restored[0])
        s2.shutdown()
        # tokens already streamed before preemption may partially overlap
        # the checkpoint boundary: slot.out_ids collected 4 or 5 tokens
        # (the loop may emit one more between our reads and shutdown) —
        # reconstruct from the checkpoint's own record instead
        combined = first + rest
        # golden must END with the resumed part, and start with `first`
        assert combined[:4] == golden[:4]
        assert golden[-len(rest):] == rest, (golden, first, rest)


class TestMeshShardedScheduler:
    def test_sharded_scheduler_matches_single(self, mini_gguf_f32):
        """Continuous batching over a (dp=2, tp=2) mesh == unsharded."""
        import jax.numpy as jnp

        from bitnet_tpu.models import load_model
        from bitnet_tpu.parallel import make_mesh
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32",
                            kv_cache_dtype="f32")
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12], [40, 41], [9, 10, 12]]

        s0 = ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                         num_slots=4)
        golden = [collect(s0, s0.submit(p, gen))[0] for p in prompts]
        s0.shutdown()

        mesh = make_mesh(dp=2, tp=2)
        s1 = ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                         num_slots=4, mesh=mesh)
        got = [collect(s1, s1.submit(p, gen))[0] for p in prompts]
        s1.shutdown()
        assert got == golden, (got, golden)

    def test_bad_slot_divisibility(self, mini_gguf_f32):
        import jax.numpy as jnp

        from bitnet_tpu.errors import InferenceError
        from bitnet_tpu.models import load_model
        from bitnet_tpu.parallel import make_mesh
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        with pytest.raises(Exception, match="divisible"):
            ContinuousBatchingScheduler(
                cfg, params, load_tokenizer(mini_gguf_f32.path),
                EngineConfig(max_seq_len=64, compute_dtype="f32"),
                num_slots=3, mesh=make_mesh(dp=2, tp=2))


class TestEmbeddingsRoute:
    def test_embeddings(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.post("/v1/embeddings",
                                 json={"input": ["ab", "cd"]})
                assert r.status == 200
                body = await r.json()
                assert body["object"] == "list" and len(body["data"]) == 2
                dim = len(body["data"][0]["embedding"])
                assert dim == sched.cfg.hidden_size
                assert body["usage"]["prompt_tokens"] >= 2

                # token-array input
                r = await c.post("/v1/embeddings", json={"input": [1, 2, 3]})
                assert r.status == 200
                body = await r.json()
                assert len(body["data"]) == 1

                # bad input → 422
                r = await c.post("/v1/embeddings", json={"input": 7})
                assert r.status == 422

        asyncio.new_event_loop().run_until_complete(run())


class TestNChoices:
    def test_n_choices_chat(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 4, "temperature": 0.9, "seed": 11, "n": 3})
                assert r.status == 200
                body = await r.json()
                assert [ch["index"] for ch in body["choices"]] == [0, 1, 2]
                texts = [ch["message"]["content"]
                         for ch in body["choices"]]
                assert len(set(texts)) > 1     # per-choice seeds differ
                assert body["usage"]["completion_tokens"] >= 3

                r = await c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 2, "n": 99})
                assert r.status == 422

        asyncio.new_event_loop().run_until_complete(run())


class TestOpenAICompletions:
    def test_wire_formats(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                # OpenAI text_completion schema on /v1/completions
                r = await c.post("/v1/completions", json={
                    "prompt": "ab", "max_tokens": 3, "greedy": True,
                    "echo": True, "logprobs": 2})
                assert r.status == 200
                body = await r.json()
                assert body["object"] == "text_completion"
                ch = body["choices"][0]
                assert ch["text"].startswith("ab")      # echo
                assert ch["finish_reason"] in ("stop", "length")
                assert len(ch["logprobs"]["tokens"]) == 3
                assert body["usage"]["completion_tokens"] == 3

                # prompt array → one choice per prompt
                r = await c.post("/v1/completions", json={
                    "prompt": ["ab", "cd"], "max_tokens": 2,
                    "greedy": True})
                body = await r.json()
                assert [ch["index"] for ch in body["choices"]] == [0, 1]

                # streaming: text chunks then [DONE]
                r = await c.post("/v1/completions", json={
                    "prompt": "ab", "max_tokens": 3, "greedy": True,
                    "stream": True})
                raw = await r.text()
                lines = [l for l in raw.splitlines() if l.startswith("data: ")]
                assert lines[-1] == "data: [DONE]"
                chunks = [json.loads(l[6:]) for l in lines[:-1]]
                assert all(c0["object"] == "text_completion"
                           for c0 in chunks)
                assert chunks[-1]["choices"][0]["finish_reason"] in (
                    "stop", "length")
                assert "".join(c0["choices"][0]["text"]
                               for c0 in chunks[:-1])

                # chat streaming: role delta, content deltas, [DONE]
                r = await c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 3, "greedy": True, "stream": True})
                raw = await r.text()
                lines = [l for l in raw.splitlines() if l.startswith("data: ")]
                assert lines[-1] == "data: [DONE]"
                chunks = [json.loads(l[6:]) for l in lines[:-1]]
                assert chunks[0]["choices"][0]["delta"] == {
                    "role": "assistant"}
                assert any("content" in c0["choices"][0]["delta"]
                           for c0 in chunks[1:])
                assert chunks[-1]["choices"][0]["finish_reason"] in (
                    "stop", "length")

        asyncio.new_event_loop().run_until_complete(run())


class TestAdminCheckpointRoutes:
    def test_checkpoint_and_resume_over_http(self, mini_gguf_f32, tmp_path):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        s1 = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=2)
        server1 = BitNetServer(s1)
        ckdir = str(tmp_path / "ck")

        async def run1():
            app = server1.build_app()
            async with TestClient(TestServer(app)) as c:
                # a slow request to catch mid-flight
                slow = asyncio.ensure_future(c.post("/v1/inference", json={
                    "prompt": "abcd", "max_new_tokens": 40,
                    "greedy": True}))
                await asyncio.sleep(0.8)       # let it admit + decode some
                r = await c.post("/v1/admin/checkpoint",
                                 json={"directory": ckdir})
                assert r.status == 200
                body = await r.json()
                assert body["count"] >= 1
                # the paused loop resumed: the original request finishes
                resp = await slow
                assert resp.status == 200
                out = await resp.json()
                assert out["num_tokens"] == 40
                return out["text"]

        text1 = asyncio.new_event_loop().run_until_complete(run1())
        s1.shutdown()

        # fresh process-equivalent: new scheduler, resume over HTTP
        s2 = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=2)
        server2 = BitNetServer(s2)

        async def run2():
            app = server2.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.post("/v1/admin/resume",
                                 json={"directory": ckdir})
                assert r.status == 200
                body = await r.json()
                (res,) = body["resumed"]
                return res

        res = asyncio.new_event_loop().run_until_complete(run2())
        s2.shutdown()
        # checkpoint happened mid-generation: the resumed tail completes
        # the SAME deterministic greedy text
        assert res["num_tokens"] >= 1
        # reconstruct: snapshot text (tokens already emitted) + resumed
        import glob

        from bitnet_tpu.engine import checkpoint as ckpt

        (man,) = glob.glob(ckdir + "/*.req.json")
        state = ckpt.load(man[: -len(".req.json")])
        emitted = state.generated_ids
        full = "".join(tok.token_to_piece(t) for t in emitted) + res["text"]
        assert full == text1


class TestStreamLogprobs:
    def test_openai_chunks_carry_logprobs(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.post("/v1/chat/completions", json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 3, "greedy": True, "stream": True,
                    "logprobs": True, "top_logprobs": 2})
                raw = await r.text()
                chunks = [json.loads(l[6:]) for l in raw.splitlines()
                          if l.startswith("data: ") and l != "data: [DONE]"]
                content = [c0 for c0 in chunks
                           if c0["choices"][0].get("delta", {})
                           .get("content")]
                assert content, raw
                lp = content[0]["choices"][0]["logprobs"]
                assert lp["content"][0]["logprob"] <= 0.0
                assert len(lp["content"][0]["top_logprobs"]) == 2

                r = await c.post("/v1/completions", json={
                    "prompt": "ab", "max_tokens": 2, "greedy": True,
                    "stream": True, "logprobs": 1})
                raw = await r.text()
                chunks = [json.loads(l[6:]) for l in raw.splitlines()
                          if l.startswith("data: ") and l != "data: [DONE]"]
                with_text = [c0 for c0 in chunks
                             if c0["choices"][0].get("text")]
                assert with_text[0]["choices"][0]["logprobs"][
                    "token_logprobs"][0] <= 0.0

        asyncio.new_event_loop().run_until_complete(run())


class TestLlamaCppEndpoints:
    def test_tokenize_detokenize_props(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.post("/tokenize", json={"content": "ab",
                                                    "add_special": False})
                toks = (await r.json())["tokens"]
                assert toks and all(isinstance(t, int) for t in toks)

                r = await c.post("/detokenize", json={"tokens": toks})
                # the mini fixture's SPM-style vocab keeps the ▁ marker
                assert (await r.json())["content"].lstrip("▁ ") == "ab"

                r = await c.post("/detokenize", json={"tokens": "x"})
                assert r.status == 422

                r = await c.get("/props")
                body = await r.json()
                assert body["n_ctx"] == sched.S
                assert body["model"]["n_layer"] == sched.cfg.num_layers

                r = await c.get("/slots")
                slots = await r.json()
                assert len(slots) == sched.B
                assert all(s0["state"] in ("idle", "processing",
                                           "prefilling") for s0 in slots)

        asyncio.new_event_loop().run_until_complete(run())


class TestReviewFixes:
    """Regressions for the round-3 code-review findings."""

    def test_scheduler_grammar_dead_end_stops_cleanly(self, mini_gguf_f32):
        """A grammar that becomes unsatisfiable must stop the slot, not
        stream uniform garbage (engine grammar_dead_end parity)."""
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(
            cfg, params, tok,
            EngineConfig(max_seq_len=64, compute_dtype="f32"), num_slots=1)
        try:
            # private-use  exists in no vocab piece → dead end
            # immediately at the first sampled token (EOS illegal: the
            # grammar can't complete on empty output)
            req = s.submit([1, 5], GenerationConfig(
                max_new_tokens=8, greedy=True,
                grammar='root ::= [\\uE000]'))
            toks, reason = collect(s, req)
            assert toks == []
            assert reason == StopReason.EOS
        finally:
            s.shutdown()

    def test_pause_timeout_rolls_back(self, mini_gguf_f32):
        """A timed-out pause() must reset _pause_req — otherwise the
        loop quiesces forever and every later request hangs."""
        import pytest as _pytest

        from bitnet_tpu.errors import InferenceError

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(
            cfg, params, tok,
            EngineConfig(max_seq_len=64, compute_dtype="f32"),
            num_slots=1, start_loop=False)
        try:
            class _Busy:              # a loop that never hits the barrier
                def is_alive(self):
                    return True

            s._thread = _Busy()
            with _pytest.raises(InferenceError):
                s.pause(timeout=0.05)
            assert s._pause_req is False          # rolled back
        finally:
            s._thread = None
            s.shutdown()

    def test_pause_unpause_live(self, sched):
        """pause() on a live idle loop reaches the barrier; unpause
        resumes serving."""
        sched.pause(timeout=30)
        assert sched._paused_at_barrier
        sched.unpause()
        req = sched.submit([1, 2], GenerationConfig(max_new_tokens=2,
                                                    greedy=True))
        toks, _ = collect(sched, req)
        assert len(toks) >= 1

    def test_compat_endpoints_require_auth(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched, auth_token="sekrit")

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                for route, method, body in (
                        ("/tokenize", "post", {"content": "x"}),
                        ("/detokenize", "post", {"tokens": [1]}),
                        ("/props", "get", None)):
                    fn = getattr(c, method)
                    r = await (fn(route, json=body) if body is not None
                               else fn(route))
                    assert r.status == 401, route
                hdr = {"Authorization": "Bearer sekrit"}
                r = await c.get("/props", headers=hdr)
                assert r.status == 200

        asyncio.new_event_loop().run_until_complete(run())

    def test_malformed_tool_history_not_500(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)
        tools = [{"type": "function", "function": {
            "name": "f", "parameters": {"type": "object",
                                        "properties": {}}}}]

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r = await c.post("/v1/chat/completions", json={
                    "messages": [
                        {"role": "user", "content": "x"},
                        {"role": "assistant", "tool_calls": [
                            {"function": {"name": "f",
                                          "arguments": "{broken"}},
                            {"function": {}},          # no name
                            "not-a-dict",
                        ]},
                        {"role": "tool", "name": "f", "content": "r"},
                    ],
                    "max_tokens": 2, "greedy": True, "tools": tools})
                assert r.status == 200     # tolerated, not a 500

        asyncio.new_event_loop().run_until_complete(run())

    def test_stream_tools_emits_tool_call_chunks(self, mini_gguf_f32):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
        from bitnet_tpu.serve.server import BitNetServer
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            m = generate_mini_gguf(td + "/m.gguf",
                                   MiniModelSpec(quant="f32",
                                                 max_seq_len=1024))
            cfg, params, _ = load_model(m.path, param_dtype=jnp.float32)
            tok = load_tokenizer(m.path)
            s = ContinuousBatchingScheduler(
                cfg, params, tok,
                EngineConfig(max_seq_len=1024, compute_dtype="f32"),
                num_slots=1)
            server = BitNetServer(s)
            tools = [{"type": "function", "function": {
                "name": "f", "parameters": {
                    "type": "object", "properties": {
                        "q": {"type": "boolean"}},
                    "required": ["q"], "additionalProperties": False}}}]

            async def run():
                app = server.build_app()
                async with TestClient(TestServer(app)) as c:
                    r = await c.post("/v1/chat/completions", json={
                        "messages": [{"role": "user", "content": "go"}],
                        "max_tokens": 80, "greedy": True, "stream": True,
                        "tools": tools,
                        "tool_choice": {"type": "function",
                                        "function": {"name": "f"}}})
                    raw = await r.text()
                    lines = [l for l in raw.splitlines()
                             if l.startswith("data: ")]
                    assert lines[-1] == "data: [DONE]"
                    chunks = [json.loads(l[6:]) for l in lines[:-1]]
                    tc = [c0 for c0 in chunks
                          if c0["choices"][0]["delta"].get("tool_calls")]
                    assert tc, raw
                    call = tc[0]["choices"][0]["delta"]["tool_calls"][0]
                    assert call["function"]["name"] == "f"
                    assert chunks[-1]["choices"][0][
                        "finish_reason"] == "tool_calls"

            try:
                asyncio.new_event_loop().run_until_complete(run())
            finally:
                s.shutdown()

    def test_completions_usage_counts_prompt_once(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)

        async def run():
            app = server.build_app()
            async with TestClient(TestServer(app)) as c:
                r1 = await c.post("/v1/completions", json={
                    "prompt": "abc", "max_tokens": 2, "greedy": True})
                one = (await r1.json())["usage"]["prompt_tokens"]
                r4 = await c.post("/v1/completions", json={
                    "prompt": "abc", "max_tokens": 2, "greedy": True,
                    "n": 4})
                four = (await r4.json())["usage"]["prompt_tokens"]
                assert one == four       # prompt billed once, not ×n

                # stream with n>1 → honest 422
                r = await c.post("/v1/completions", json={
                    "prompt": "abc", "max_tokens": 2, "stream": True,
                    "n": 2})
                assert r.status == 422

        asyncio.new_event_loop().run_until_complete(run())


@pytest.mark.slow
class TestServerFuzz:
    """Random request bodies must map to clean HTTP statuses — never a
    500 (the pytest translation of the reference's server fuzz lanes)."""

    def test_no_500_on_random_bodies(self, sched):
        pytest.importorskip("aiohttp")
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(sched)
        app = server.build_app()

        scalar = st.one_of(st.none(), st.booleans(),
                           st.integers(-5, 70000), st.floats(-3, 3),
                           st.text(max_size=6))
        bodies = st.dictionaries(
            st.sampled_from([
                "prompt", "messages", "tokens", "max_new_tokens",
                "temperature", "top_k", "top_p", "logit_bias", "stop",
                "grammar", "json_schema", "response_format", "logprobs",
                "top_logprobs", "n", "tools", "tool_choice", "stream",
                "seed", "model", "input", "echo"]),
            st.one_of(scalar, st.lists(scalar, max_size=3),
                      st.dictionaries(st.text(max_size=4), scalar,
                                      max_size=3)),
            max_size=5)

        routes = ["/v1/inference", "/v1/completions",
                  "/v1/chat/completions", "/v1/embeddings", "/tokenize",
                  "/detokenize"]

        loop = asyncio.new_event_loop()

        async def setup():
            c = TestClient(TestServer(app))
            await c.__aenter__()
            return c

        client = loop.run_until_complete(setup())
        try:
            @settings(max_examples=150, deadline=None)
            @given(st.sampled_from(routes), bodies)
            def check(route, body):
                # keep generation cheap when a body happens to be valid
                body = dict(body)
                body.setdefault("max_new_tokens", 2)
                if not isinstance(body.get("max_new_tokens"), int) \
                        or not (1 <= body["max_new_tokens"] <= 8):
                    body["max_new_tokens"] = 2

                async def one():
                    r = await client.post(route, json=body)
                    await r.text()
                    return r.status

                try:
                    status = loop.run_until_complete(
                        asyncio.wait_for(one(), timeout=90))
                except asyncio.TimeoutError:
                    # slow valid generation under contention is fine —
                    # but a DEAD decode loop also looks like a hang, and
                    # that must fail (an earlier body may have crashed
                    # the scheduler thread)
                    assert sched._thread.is_alive(), (route, body)
                    return
                assert status != 500, (route, body)
                assert sched._thread.is_alive(), (route, body)

            check()
            # end-to-end liveness: the pool still serves after the storm
            async def probe():
                r = await client.post("/v1/inference", json={
                    "prompt": "ab", "max_new_tokens": 2, "greedy": True})
                return r.status

            assert loop.run_until_complete(
                asyncio.wait_for(probe(), timeout=120)) == 200
        finally:
            loop.run_until_complete(client.__aexit__(None, None, None))
            loop.close()


class TestPriorityPreemption:
    """vLLM-style recompute preemption: a higher-priority request evicts
    the lowest-priority running slot; the evicted request resumes with
    an IDENTICAL continuation (key stream, stop budget, history)."""

    @pytest.mark.parametrize("gen_kw", [
        {"greedy": True},
        {"temperature": 0.9, "seed": 21},
        {"temperature": 0.8, "seed": 4, "logprobs": 1,
         "grammar": 'root ::= [a-p]*'},
    ], ids=["greedy", "sampled", "grammar+logprobs"])
    def test_preempted_stream_is_identical(self, mini_gguf_f32, gen_kw):
        from bitnet_tpu.engine import InferenceEngine

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        low_gen = GenerationConfig(max_new_tokens=40, **gen_kw)
        hi_gen = GenerationConfig(max_new_tokens=3, greedy=True)

        eng = InferenceEngine.from_gguf(mini_gguf_f32.path, ecfg)
        want_low = eng.generate([1, 7, 20], low_gen)
        want_hi = eng.generate([2, 9], hi_gen).token_ids

        s = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=1)
        try:
            # deterministic handoff: let low emit a few tokens, then
            # QUIESCE the loop at a step boundary before submitting hi —
            # polling stats from outside raced against a warm jit cache
            # (low could finish all its tokens before hi was submitted,
            # so nothing was left to preempt; order-dependent flake,
            # VERDICT r3 weak #6).  pause() parks _step, so checking
            # "low still active" under pause cannot race.
            s.pause()
            low = s.submit([1, 7, 20], low_gen, priority=5)
            deadline = time.time() + 60
            while True:
                assert time.time() < deadline, s.stats
                s.unpause()
                time.sleep(0.005)
                s.pause()
                low_active = any(sl.active and sl.req is low
                                 for sl in s.slots)
                if s.stats.get("tokens_generated", 0) >= 3 and low_active:
                    break       # stay paused for the hi submit
                assert low_active or s.stats.get(
                    "tokens_generated", 0) < 3, "low finished before hi"
            hi = s.submit([2, 9], hi_gen, priority=0)
            s.unpause()
            hi_toks, _ = collect(s, hi)
            low_toks, low_reason = collect(s, low)
            assert hi_toks == want_hi
            assert low_toks == want_low.token_ids      # seamless resume
            assert low_reason == want_low.stop_reason
            assert s.stats.get("preempted", 0) >= 1
            if low_gen.logprobs is not None:
                assert len(low.logprobs) == len(low_toks)
                for se, ee in zip(low.logprobs, want_low.logprobs):
                    assert se["token_id"] == ee["token_id"]
                    assert se["logprob"] == pytest.approx(ee["logprob"],
                                                          abs=1e-3)
        finally:
            s.shutdown()

    def test_no_preemption_between_equal_priorities(self, mini_gguf_f32):
        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        s = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=1)
        try:
            a = s.submit([1, 7], GenerationConfig(max_new_tokens=10,
                                                  greedy=True), priority=1)
            time.sleep(0.3)
            b = s.submit([2, 9], GenerationConfig(max_new_tokens=2,
                                                  greedy=True), priority=1)
            collect(s, a)
            collect(s, b)
            assert s.stats.get("preempted", 0) == 0
        finally:
            s.shutdown()


class TestSchedulerSpeculative:
    """Serving-level speculative decoding: n-gram draft + one-forward
    greedy verify per slot inside the continuous-batching pool.  The
    reference's speculative.rs is engine-only; output must be
    token-identical to plain decoding."""

    def test_token_parity_and_acceptance(self, mini_gguf_f32):
        from bitnet_tpu.engine import InferenceEngine

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        eng = InferenceEngine.from_gguf(mini_gguf_f32.path, ecfg)
        gen = GenerationConfig(max_new_tokens=24, greedy=True)
        # a repetitive prompt gives the n-gram draft something to hit
        prompt = [1, 7, 20, 3, 1, 7, 20, 3, 1, 7]
        want = eng.generate(prompt, gen)

        s = ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                        num_slots=2, speculative_k=4)
        try:
            req = s.submit(prompt, gen)
            toks, reason = collect(s, req)
            assert toks == want.token_ids
            assert reason == want.stop_reason
            assert s.stats.get("spec_drafted", 0) > 0
            # greedy self-continuation on the repetitive fixture output
            # accepts most drafts (probe: 23/28, 30 tokens in 7 steps)
            assert s.stats.get("spec_accepted", 0) > 0
            assert s.stats["decode_steps"] < len(toks)
        finally:
            s.shutdown()

    def test_mixed_pool_spec_and_sampled(self, mini_gguf_f32):
        """Spec-eligible and sampled slots coexist: the sampled slot
        rides the normal dispatch and stays token-identical."""
        from bitnet_tpu.engine import InferenceEngine

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        eng = InferenceEngine.from_gguf(mini_gguf_f32.path, ecfg)
        g_greedy = GenerationConfig(max_new_tokens=12, greedy=True)
        g_sampled = GenerationConfig(max_new_tokens=12, temperature=0.9,
                                     seed=17)
        want_g = eng.generate([1, 7, 20, 1, 7], g_greedy).token_ids
        want_s = eng.generate([2, 9, 4], g_sampled).token_ids

        s = ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                        num_slots=2, speculative_k=3)
        try:
            a = s.submit([1, 7, 20, 1, 7], g_greedy)
            b = s.submit([2, 9, 4], g_sampled)
            ta, _ = collect(s, a)
            tb, _ = collect(s, b)
            assert ta == want_g
            assert tb == want_s
        finally:
            s.shutdown()

    def test_guards(self, mini_gguf_f32):
        import pytest as _pytest

        from bitnet_tpu.errors import InferenceError

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        with _pytest.raises(InferenceError):
            ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                        num_slots=1, paged=True,
                                        num_pages=8, speculative_k=2)

    def test_two_spec_slots_one_dispatch(self, mini_gguf_f32):
        """Both greedy slots verify in the SAME dispatch (batched spec)."""
        from bitnet_tpu.engine import InferenceEngine

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        ecfg = EngineConfig(max_seq_len=64, compute_dtype="f32")
        eng = InferenceEngine.from_gguf(mini_gguf_f32.path, ecfg)
        gen = GenerationConfig(max_new_tokens=16, greedy=True)
        pa, pb = [1, 7, 20, 3, 1, 7, 20, 3], [2, 9, 4, 2, 9, 4]
        want_a = eng.generate(pa, gen).token_ids
        want_b = eng.generate(pb, gen).token_ids

        s = ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                        num_slots=2, speculative_k=4)
        try:
            a = s.submit(pa, gen)
            b = s.submit(pb, gen)
            ta, _ = collect(s, a)
            tb, _ = collect(s, b)
            assert ta == want_a and tb == want_b
            # both slots advanced through shared verify dispatches:
            # strictly fewer dispatches than tokens generated
            assert s.stats["decode_steps"] < len(ta) + len(tb)
        finally:
            s.shutdown()
