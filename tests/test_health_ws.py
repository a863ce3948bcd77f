"""Health monitor, /v1/devices, canary, and WebSocket streaming tests."""

import asyncio

import pytest

from bitnet_tpu.config import EngineConfig
from bitnet_tpu.serve.health import HealthMonitor
from bitnet_tpu.serve.model_manager import ModelManager


@pytest.fixture(scope="module")
def manager(mini_gguf_f32):
    m = ModelManager(EngineConfig(max_seq_len=64, compute_dtype="f32"),
                     num_slots=2)
    m.load("mini", mini_gguf_f32.path)
    yield m
    m.shutdown()


class TestHealthMonitor:
    def test_snapshot_healthy(self, manager):
        h = HealthMonitor(manager)
        snap = h.refresh()
        assert snap["healthy"] is True
        assert snap["device"]["platform"] == "cpu"
        assert snap["schedulers"][0]["model"] == "mini"
        assert snap["schedulers"][0]["thread_alive"]

    def test_canary_generates(self, manager):
        h = HealthMonitor(manager)
        res = h.canary()
        assert res["ok"], res
        assert res["tokens"] >= 1

    def test_canary_no_model(self):
        empty = ModelManager()
        h = HealthMonitor(empty)
        res = h.canary()
        assert not res["ok"]

    def test_background_loop(self, manager):
        h = HealthMonitor(manager, refresh_s=0.05)
        h.start()
        import time

        t0 = h.snapshot["checked_at"]
        time.sleep(0.2)
        h.stop()
        assert h.snapshot["checked_at"] > t0


class TestRoutes:
    def test_devices_canary_ws(self, manager):
        from aiohttp.test_utils import TestClient, TestServer

        from bitnet_tpu.serve.server import BitNetServer

        server = BitNetServer(manager=manager)
        app = server.build_app()

        async def scenario():
            async with TestClient(TestServer(app)) as client:
                r = await client.get("/v1/devices")
                assert r.status == 200
                data = await r.json()
                assert data["healthy"]

                r = await client.get("/v1/canary")
                assert r.status == 200
                assert (await r.json())["ok"]

                r = await client.get("/health")
                assert r.status == 200

                # WebSocket: send request, collect tokens until done
                ws = await client.ws_connect("/v1/ws")
                await ws.send_json({"prompt": "hi", "max_new_tokens": 3,
                                    "greedy": True})
                toks, done = [], False
                while not done:
                    msg = await ws.receive_json(timeout=120)
                    if "error" in msg:
                        raise AssertionError(msg)
                    if msg.get("done"):
                        done = True
                    elif "token" in msg:
                        toks.append(msg["token"])
                assert 1 <= len(toks) <= 3
                await ws.close()

        asyncio.run(scenario())
