"""Checkpoint/resume, profiler, and device-probe tests.

Gate: interrupt a generation mid-stream, checkpoint, restore into a FRESH
engine, resume — the combined output must equal an uninterrupted run.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.device_probe import assert_real_hardware, probe_device
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine import checkpoint as ckpt
from bitnet_tpu.errors import ConfigError, InferenceError
from bitnet_tpu.models import load_model
from bitnet_tpu.obs.profiler import Profiler, device_memory_stats


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


class TestCheckpointResume:
    def test_resume_matches_uninterrupted(self, model, tmp_path):
        gen = GenerationConfig(max_new_tokens=12, greedy=True)
        prompt = [2, 7, 11, 13, 17]

        golden = mk_engine(model).generate(prompt, gen).token_ids

        # run the first 5 tokens, checkpoint, resume in a FRESH engine
        eng = mk_engine(model)
        first = []
        for ev in eng.generate_stream(prompt, gen):
            first.append(ev.token_id)
            if len(first) == 5:
                break
        state = ckpt.capture(eng, prompt, first)
        path = str(tmp_path / "gen")
        manifest = ckpt.save(state, path)
        # the interrupted token was yielded but not yet decoded, so its KV
        # row is absent; resume re-scores it (engine._relogit_last)
        assert manifest["kv_len"] == len(prompt) + len(first) - 1

        eng2 = mk_engine(model)
        restored = ckpt.load(path)
        res = ckpt.resume_generation(eng2, restored, gen)
        assert first + res.token_ids == golden, (
            first, res.token_ids, golden)

    def test_integrity_check(self, model, tmp_path):
        eng = mk_engine(model)
        eng.prefill([1, 2, 3])
        state = ckpt.capture(eng, [1, 2, 3], [])
        path = str(tmp_path / "c")
        ckpt.save(state, path)
        # corrupt one byte of the npz payload
        with open(path + ".json") as f:
            man = json.load(f)
        man["sha256"] = "0" * 64
        with open(path + ".json", "w") as f:
            json.dump(man, f)
        with pytest.raises(InferenceError, match="integrity"):
            ckpt.load(path)

    def test_shape_mismatch_rejected(self, model):
        eng = mk_engine(model)
        bad = ckpt.DecodeState(
            prompt_ids=[1], generated_ids=[], rng_key=None, kv_len=1,
            k=np.zeros((99, 1, 2, 4), np.float32),
            v=np.zeros((99, 1, 2, 4), np.float32))
        with pytest.raises(InferenceError, match="shape"):
            ckpt.restore(eng, bad)

    def test_diff_roundtrip(self, model, tmp_path):
        eng = mk_engine(model)
        gen = GenerationConfig(max_new_tokens=8, greedy=True)
        prompt = [3, 5, 8]
        toks = []
        base = None
        for ev in eng.generate_stream(prompt, gen):
            toks.append(ev.token_id)
            if len(toks) == 3:
                base = ckpt.capture(eng, prompt, list(toks))
        cur = ckpt.capture(eng, prompt, toks)
        dpath = str(tmp_path / "d")
        man = ckpt.save_diff(base, cur, dpath)
        assert man["rows"] == cur.kv_len - base.kv_len
        merged = ckpt.apply_diff(base, dpath)
        assert merged.generated_ids == cur.generated_ids
        np.testing.assert_array_equal(merged.k, cur.k)

    def test_diff_base_mismatch(self, model, tmp_path):
        eng = mk_engine(model)
        eng.prefill([1, 2, 3, 4])
        a = ckpt.capture(eng, [1, 2, 3, 4], [])
        eng.prefill([1, 2, 3, 4, 5, 6])
        b = ckpt.capture(eng, [1, 2, 3, 4], [5, 6])
        dpath = str(tmp_path / "d2")
        ckpt.save_diff(a, b, dpath)
        with pytest.raises(InferenceError, match="base_len"):
            ckpt.apply_diff(b, dpath)


class TestProfiler:
    def test_phases_and_summary(self):
        p = Profiler()
        with p.phase("prefill", tokens=8):
            pass
        with p.phase("decode"):
            pass
        with p.phase("decode"):
            pass
        s = p.summary()
        assert s["decode"]["count"] == 2
        assert s["prefill"]["count"] == 1
        assert s["prefill"]["total_ms"] >= 0

    def test_chrome_trace_export(self, tmp_path):
        p = Profiler()
        with p.phase("x"):
            pass
        p.instant("marker", note="hi")
        out = str(tmp_path / "trace.json")
        p.export_chrome_trace(out)
        with open(out) as f:
            data = json.load(f)
        assert len(data["traceEvents"]) == 2
        assert data["traceEvents"][0]["ph"] in ("X", "i")

    def test_disabled_is_noop(self):
        p = Profiler()
        p.enabled = False
        with p.phase("x"):
            pass
        assert p.summary() == {}

    def test_memory_stats_shape(self):
        s = device_memory_stats()
        assert "available" in s and "platform" in s


class TestDeviceProbe:
    def test_probe_cpu(self):
        p = probe_device()
        assert p.platform == "cpu"            # tests force CPU
        assert p.num_devices == 8             # virtual device count
        assert p.recommended_kernel_path == "xla"
        assert not p.is_tpu
        d = p.as_dict()
        assert d["host_os"] in ("linux", "darwin")

    def test_strict_hardware_gate(self):
        with pytest.raises(ConfigError, match="requires TPU"):
            assert_real_hardware()
