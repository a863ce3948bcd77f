"""Failure detection & recovery tests (error_recovery.rs /
execution_router.rs parity): classification, retry backoff, degradation
levels, and health-gated model failover."""

import time

import jax.numpy as jnp
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.errors import ConfigError, InferenceError, SecurityError
from bitnet_tpu.serve.recovery import (
    DegradationLevel,
    ErrorClass,
    FailoverRouter,
    GracefulDegradation,
    RetryPolicy,
    classify_error,
)


class TestClassifier:
    def test_classes(self):
        assert classify_error(TimeoutError()) == ErrorClass.TRANSIENT
        assert classify_error(ConnectionError()) == ErrorClass.TRANSIENT
        assert classify_error(MemoryError()) == ErrorClass.RESOURCE
        assert classify_error(ConfigError("x")) == ErrorClass.PERMANENT
        assert classify_error(SecurityError("x")) == ErrorClass.PERMANENT
        assert classify_error(
            InferenceError("page pool exhausted")) == ErrorClass.RESOURCE
        assert classify_error(
            InferenceError("empty prompt")) == ErrorClass.PERMANENT
        assert classify_error(RuntimeError("rpc")) == ErrorClass.TRANSIENT


class TestRetry:
    def test_succeeds_after_transient(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise TimeoutError("busy")
            return "ok"

        pol = RetryPolicy(max_retries=3, base_delay_s=0.001)
        assert pol.run(flaky) == "ok"
        assert calls["n"] == 3

    def test_permanent_not_retried(self):
        calls = {"n": 0}

        def bad():
            calls["n"] += 1
            raise ConfigError("nope")

        with pytest.raises(ConfigError):
            RetryPolicy(max_retries=5, base_delay_s=0.001).run(bad)
        assert calls["n"] == 1

    def test_gives_up_after_max(self):
        def always():
            raise TimeoutError()

        t0 = time.time()
        with pytest.raises(TimeoutError):
            RetryPolicy(max_retries=2, base_delay_s=0.001).run(always)
        assert time.time() - t0 < 2.0

    def test_backoff_monotone_capped(self):
        pol = RetryPolicy(base_delay_s=0.1, max_delay_s=0.5,
                          multiplier=4.0, jitter=0.0)
        assert pol.delay(0) == pytest.approx(0.1)
        assert pol.delay(1) == pytest.approx(0.4)
        assert pol.delay(5) == pytest.approx(0.5)   # capped


class TestDegradation:
    def test_levels_and_caps(self):
        d = GracefulDegradation(reduced_at=4, minimal_at=16,
                                reduced_cap=100, minimal_cap=10)
        assert d.level(0, 4) == DegradationLevel.NORMAL
        assert d.level(16, 4) == DegradationLevel.REDUCED
        assert d.level(64, 4) == DegradationLevel.MINIMAL
        assert d.cap_tokens(DegradationLevel.NORMAL, 500) == 500
        assert d.cap_tokens(DegradationLevel.REDUCED, 500) == 100
        assert d.cap_tokens(DegradationLevel.MINIMAL, 500) == 10


class TestFailover:
    @pytest.fixture()
    def manager(self, mini_gguf_f32):
        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.model_manager import ModelManager
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        mm = ModelManager(EngineConfig(max_seq_len=64, compute_dtype="f32"),
                          max_models=3)
        s1 = ContinuousBatchingScheduler(cfg, params, tok,
                                         EngineConfig(max_seq_len=64,
                                                      compute_dtype="f32"),
                                         num_slots=1)
        s2 = ContinuousBatchingScheduler(cfg, params, tok,
                                         EngineConfig(max_seq_len=64,
                                                      compute_dtype="f32"),
                                         num_slots=1)
        mm.adopt("primary", s1, path=mini_gguf_f32.path)
        mm.adopt("backup", s2, path=mini_gguf_f32.path,
                 make_default=False)
        yield mm
        mm.shutdown()

    def test_routes_primary_when_healthy(self, manager):
        r = FailoverRouter(manager, fallback=["backup"])
        sched, name = r.route()
        assert name == "primary"
        assert r.routed_fallback == 0

    def test_fails_over_when_primary_dead(self, manager):
        r = FailoverRouter(manager, fallback=["backup"])
        manager.get("primary").shutdown()   # thread dies
        sched, name = r.route()
        assert name == "backup"
        assert r.routed_fallback == 1
        # and generation still works through the fallback
        req = sched.submit([1, 5, 9], GenerationConfig(max_new_tokens=2,
                                                       greedy=True))
        tok, _, done, _ = req.out.get(timeout=120)
        assert tok is not None or done

    def test_raises_when_nothing_healthy(self, manager):
        r = FailoverRouter(manager, fallback=["backup"])
        manager.get("primary").shutdown()
        manager.get("backup").shutdown()
        with pytest.raises(Exception):
            r.route()

    def test_unknown_model_falls_back(self, manager):
        r = FailoverRouter(manager, fallback=["backup"])
        sched, name = r.route("nonexistent")
        assert name == "backup"
