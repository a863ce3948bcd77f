"""Model validation rules + fingerprint tests."""

import json

import numpy as np
import pytest

from bitnet_tpu.errors import ModelError
from bitnet_tpu.gguf.reader import GGUFReader
from bitnet_tpu.models.validation import (
    CorrectionAction,
    LNRules,
    check_layernorm,
    checkpoint_metadata,
    detect_rules,
    fingerprint_model,
    validate_model_lns,
)


class TestLNRules:
    def test_accept_unit_rms(self):
        w = np.ones(64, np.float32)
        action, rms, _ = check_layernorm("x", w, detect_rules("bitnet-b1.58"))
        assert action == CorrectionAction.ACCEPT
        assert abs(rms - 1.0) < 1e-6

    def test_warn_on_drift(self):
        w = np.full(64, 0.3, np.float32)
        action, rms, _ = check_layernorm("x", w, detect_rules("bitnet-b1.58"))
        assert action == CorrectionAction.WARN

    def test_reject_outside_envelope(self):
        w = np.full(64, 100.0, np.float32)
        action, _, _ = check_layernorm("x", w, LNRules(policy="warn"))
        assert action == CorrectionAction.REJECT

    def test_strict_raises(self):
        w = np.full(64, 100.0, np.float32)
        with pytest.raises(ModelError, match="RMS"):
            check_layernorm("x", w, LNRules(policy="strict"))

    def test_rescale(self):
        w = np.full(64, 50.0, np.float32)
        action, rms, fixed = check_layernorm("x", w,
                                             LNRules(policy="rescale"))
        assert action == CorrectionAction.RESCALE
        assert abs(np.sqrt(np.mean(fixed ** 2)) - 1.0) < 1e-5

    def test_nonfinite_raises(self):
        w = np.array([1.0, np.nan], np.float32)
        with pytest.raises(ModelError, match="non-finite"):
            check_layernorm("x", w, LNRules())

    def test_validate_whole_model(self, mini_gguf_f32):
        with GGUFReader(mini_gguf_f32.path) as r:
            report = validate_model_lns(r)
        assert report["checked"] > 0
        assert not report["rejected"], report


class TestFingerprint:
    def test_stable_and_sensitive(self, mini_gguf_f32, tmp_path):
        f1 = fingerprint_model(mini_gguf_f32.path)
        f2 = fingerprint_model(mini_gguf_f32.path)
        assert f1["fingerprint"] == f2["fingerprint"]

        # a different model must fingerprint differently
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

        other = str(tmp_path / "other.gguf")
        generate_mini_gguf(other, MiniModelSpec(quant="f32", seed=99))
        f3 = fingerprint_model(other)
        assert f3["fingerprint"] != f1["fingerprint"]

    def test_checkpoint_metadata(self, mini_gguf_f32):
        meta = checkpoint_metadata(mini_gguf_f32.path)
        assert meta["format"] == "gguf"
        assert meta["num_tensors"] > 0
        assert meta["size_bytes"] > 0


class TestNewCLICommands:
    def test_ln_check(self, mini_gguf_f32, capsys):
        from bitnet_tpu.cli import main

        assert main(["ln-check", "-m", mini_gguf_f32.path]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["checked"] > 0

    def test_fingerprint_cmd(self, mini_gguf_f32, capsys):
        from bitnet_tpu.cli import main

        assert main(["fingerprint", "-m", mini_gguf_f32.path]) == 0
        out = json.loads(capsys.readouterr().out)
        assert len(out["fingerprint"]) == 64

    def test_verify_receipt_cmd(self, mini_gguf_f32, tmp_path, capsys):
        import jax.numpy as jnp

        from bitnet_tpu.cli import main
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models import load_model
        from bitnet_tpu.verify.receipts import generate_receipt

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        eng = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kv_cache_dtype="f32", compute_dtype="f32"))
        eng.generate([1, 2, 3], GenerationConfig(max_new_tokens=2,
                                                 greedy=True))
        rec = generate_receipt(eng)
        p = str(tmp_path / "r.json")
        with open(p, "w") as f:
            f.write(rec.to_json())
        rc = main(["verify-receipt", p])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0, out
        assert out["valid"]
