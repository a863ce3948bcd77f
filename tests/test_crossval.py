"""Crossval harness tests: per-token compare, divergence detection,
baselines recording, preflight/gate CLI."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.errors import InferenceError
from bitnet_tpu.models import load_model
from bitnet_tpu.verify.crossval import (
    COSINE_SIMILARITY_THRESHOLD,
    compare_per_token,
    cpp_reference_available,
    crossval_golden,
    record_baseline,
)


class TestComparePerToken:
    def test_identical_passes(self, rng):
        lg = rng.normal(size=(6, 32)).astype(np.float32)
        res = compare_per_token(lg, lg.copy())
        assert res.passed and res.min_cosine == 1.0
        assert res.first_divergence is None

    def test_divergence_position(self, rng):
        a = rng.normal(size=(6, 32)).astype(np.float32)
        b = a.copy()
        b[3] = -b[3]                       # cosine -1 at position 3
        res = compare_per_token(a, b)
        assert not res.passed
        assert res.first_divergence == 3
        assert res.cosines[3] < 0

    def test_shape_mismatch(self, rng):
        with pytest.raises(InferenceError, match="shape"):
            compare_per_token(np.zeros((2, 4), np.float32),
                              np.zeros((3, 4), np.float32))


class TestCrossvalGolden:
    @pytest.mark.parametrize("fix", ["mini_gguf_f32", "mini_gguf_qk256"])
    def test_engine_vs_golden(self, fix, request):
        m = request.getfixturevalue(fix)
        cfg, params, _ = load_model(m.path, param_dtype=jnp.float32)
        eng = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kv_cache_dtype="f32", compute_dtype="f32"))
        res = crossval_golden(eng, m, [2, 7, 11, 13, 17])
        assert res.passed, res.as_dict()
        assert res.min_cosine > COSINE_SIMILARITY_THRESHOLD
        assert len(res.cosines) == 5


class TestBaselines:
    def test_record_appends(self, tmp_path, rng):
        lg = rng.normal(size=(3, 8)).astype(np.float32)
        res = compare_per_token(lg, lg)
        p = str(tmp_path / "baselines.json")
        record_baseline(res, p, {"model": "x"})
        record_baseline(res, p)
        with open(p) as f:
            data = json.load(f)
        assert len(data["entries"]) == 2
        assert data["entries"][0]["model"] == "x"
        assert data["entries"][0]["passed"]


class TestCppGate:
    def test_unavailable_without_env(self, monkeypatch):
        monkeypatch.delenv("BITNET_CPP_DIR", raising=False)
        assert cpp_reference_available() is None

    def test_missing_binary(self, monkeypatch, tmp_path):
        monkeypatch.setenv("BITNET_CPP_DIR", str(tmp_path))
        assert cpp_reference_available() is None

    def test_found_binary(self, monkeypatch, tmp_path):
        (tmp_path / "bin").mkdir()
        (tmp_path / "bin" / "main").write_text("")
        monkeypatch.setenv("BITNET_CPP_DIR", str(tmp_path))
        assert cpp_reference_available() is not None


class TestPreflightGateCLI:
    def test_preflight(self, capsys):
        from bitnet_tpu.cli import main

        assert main(["preflight"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["device"]["platform"] == "cpu"
        assert "native_codec" in out

    def test_gate_passes_on_cpu(self, capsys):
        from bitnet_tpu.cli import main

        assert main(["gate"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["passed"]

    def test_gate_require_tpu_fails_on_cpu(self, capsys):
        from bitnet_tpu.cli import main

        assert main(["gate", "--require-tpu"]) == 1
        out = json.loads(capsys.readouterr().out)
        assert not out["checks"]["tpu"]
