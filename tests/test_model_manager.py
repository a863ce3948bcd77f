"""Model manager + rate limiter + multi-model server route tests."""

import asyncio
import time

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig
from bitnet_tpu.errors import InferenceError, ModelError
from bitnet_tpu.serve.model_manager import ModelManager, RateLimiter


@pytest.fixture(scope="module")
def manager(mini_gguf_f32):
    m = ModelManager(
        EngineConfig(max_seq_len=64, compute_dtype="f32"),
        num_slots=2, max_models=2)
    yield m
    m.shutdown()


class TestModelManager:
    def test_load_list_get_unload(self, manager, mini_gguf_f32):
        info = manager.load("m1", mini_gguf_f32.path)
        assert info["name"] == "m1"
        assert manager.default_name == "m1"
        assert len(manager.list()) == 1
        sched = manager.get()              # default
        assert sched is manager.get("m1")

        info2 = manager.load("m2", mini_gguf_f32.path, make_default=True)
        assert manager.default_name == "m2"
        with pytest.raises(InferenceError, match="max_models"):
            manager.load("m3", mini_gguf_f32.path)
        with pytest.raises(InferenceError, match="already"):
            manager.load("m2", mini_gguf_f32.path)

        manager.unload("m2")
        assert manager.default_name == "m1"   # falls back
        with pytest.raises(ModelError):
            manager.get("m2")
        manager.unload("m1")
        with pytest.raises(ModelError):
            manager.get()

    def test_generation_through_loaded_model(self, manager, mini_gguf_f32):
        from bitnet_tpu.config import GenerationConfig

        manager.load("gen", mini_gguf_f32.path)
        sched = manager.get("gen")
        req = sched.submit([1, 5, 9], GenerationConfig(max_new_tokens=3,
                                                       greedy=True))
        toks = []
        deadline = time.time() + 120
        while time.time() < deadline:
            tok, text, done, r = req.out.get(timeout=120)
            if tok is not None:
                toks.append(tok)
            if done:
                break
        assert 1 <= len(toks) <= 3
        manager.unload("gen")


class TestRateLimiter:
    def test_burst_then_limit(self):
        rl = RateLimiter(rate_per_s=0.0001, burst=3)
        assert all(rl.allow("1.2.3.4") for _ in range(3))
        assert not rl.allow("1.2.3.4")
        assert rl.allow("5.6.7.8")       # other clients unaffected

    def test_refill(self):
        rl = RateLimiter(rate_per_s=1000.0, burst=1)
        assert rl.allow("a")
        assert not rl.allow("a") or True  # may refill instantly at 1000/s
        time.sleep(0.01)
        assert rl.allow("a")

    def test_blocklist(self):
        rl = RateLimiter()
        rl.block("6.6.6.6")
        assert not rl.allow("6.6.6.6")
        rl.unblock("6.6.6.6")
        assert rl.allow("6.6.6.6")

    def test_cleanup(self):
        rl = RateLimiter()
        rl.allow("x")
        assert rl.cleanup(max_age_s=0.0) == 1


class TestServerRoutes:
    @pytest.fixture()
    def client(self, mini_gguf_f32, event_loop=None):
        pytest.importorskip("aiohttp")
        return mini_gguf_f32

    def test_model_routes(self, mini_gguf_f32):
        """Drive /v1/models load/get/unload through the aiohttp app."""
        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        mgr = ModelManager(EngineConfig(max_seq_len=64, compute_dtype="f32"),
                           num_slots=2)
        server = BitNetServer(manager=mgr)
        app = server.build_app()

        async def scenario():
            async with TestClient(TestServer(app)) as client:
                r = await client.post("/v1/models/load", json={
                    "name": "mini", "path": mini_gguf_f32.path})
                assert r.status == 200, await r.text()
                r = await client.get("/v1/models")
                data = await r.json()
                assert data["default"] == "mini"
                assert data["models"][0]["name"] == "mini"
                r = await client.get("/v1/models/mini")
                assert r.status == 200
                r = await client.post("/v1/inference", json={
                    "prompt": "hi", "max_new_tokens": 2, "greedy": True})
                assert r.status == 200, await r.text()
                body = await r.json()
                assert body["num_tokens"] >= 1
                # unknown model name → 404
                r = await client.post("/v1/inference", json={
                    "prompt": "hi", "model": "nope"})
                assert r.status == 404
                r = await client.delete("/v1/models/mini")
                assert r.status == 200
                r = await client.get("/v1/models/mini")
                assert r.status == 404

        asyncio.run(scenario())
        mgr.shutdown()

    def test_rate_limited_request(self, mini_gguf_f32):
        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        mgr = ModelManager(EngineConfig(max_seq_len=64, compute_dtype="f32"),
                           num_slots=2)
        mgr.load("mini", mini_gguf_f32.path)
        rl = RateLimiter(rate_per_s=0.0001, burst=1)
        server = BitNetServer(manager=mgr, rate_limiter=rl)
        app = server.build_app()

        async def scenario():
            async with TestClient(TestServer(app)) as client:
                r1 = await client.post("/v1/inference", json={
                    "prompt": "a", "max_new_tokens": 1, "greedy": True})
                assert r1.status == 200
                r2 = await client.post("/v1/inference", json={
                    "prompt": "a", "max_new_tokens": 1})
                assert r2.status == 429

        asyncio.run(scenario())
        mgr.shutdown()
