"""SafeTensors tools + compat export_fixed + trace-diff CLI tests."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.errors import ModelError
from bitnet_tpu.tools.st_tools import inspect_safetensors, merge_safetensors
from bitnet_tpu.verify.compat import diagnose, export_fixed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def shards(tmp_path, rng):
    from safetensors.numpy import save_file

    a = {"model.embed_tokens.weight":
         rng.normal(size=(16, 8)).astype(np.float32)}
    b = {"model.norm.weight": rng.normal(size=(8,)).astype(np.float32),
         "lm_head.weight": rng.normal(size=(16, 8)).astype(np.float32)}
    pa, pb = str(tmp_path / "a.safetensors"), str(tmp_path / "b.safetensors")
    save_file(a, pa)
    save_file(b, pb)
    return pa, pb, tmp_path


class TestSTTools:
    def test_inspect(self, shards):
        pa, pb, _ = shards
        rep = inspect_safetensors(pa)
        assert rep["num_tensors"] == 1
        assert rep["tensors"][0]["name"] == "model.embed_tokens.weight"
        assert rep["tensors"][0]["shape"] == [16, 8]
        assert rep["by_dtype"]["F32"] == 1

    def test_inspect_missing(self):
        with pytest.raises(ModelError):
            inspect_safetensors("/nonexistent.safetensors")

    def test_merge(self, shards):
        pa, pb, tmp = shards
        out = str(tmp / "merged.safetensors")
        rep = merge_safetensors([pa, pb], out)
        assert rep["num_tensors"] == 3
        merged = inspect_safetensors(out)
        names = {t["name"] for t in merged["tensors"]}
        assert "lm_head.weight" in names and \
            "model.embed_tokens.weight" in names

    def test_merge_duplicate_rejected(self, shards):
        pa, _, tmp = shards
        with pytest.raises(ModelError, match="duplicate"):
            merge_safetensors([pa, pa], str(tmp / "x.safetensors"))

    def test_merge_from_index(self, shards):
        pa, pb, tmp = shards
        index = {"weight_map": {
            "model.embed_tokens.weight": "a.safetensors",
            "model.norm.weight": "b.safetensors",
            "lm_head.weight": "b.safetensors",
        }}
        idx = tmp / "model.safetensors.index.json"
        idx.write_text(json.dumps(index))
        rep = merge_safetensors(str(idx), str(tmp / "m.safetensors"))
        assert rep["num_shards"] == 2 and rep["num_tensors"] == 3


class TestCompatFix:
    def test_export_fixed_restores_metadata(self, tmp_path, rng):
        """Strip metadata from a valid GGUF, fix it, verify it loads."""
        from bitnet_tpu.gguf.reader import GGUFReader
        from bitnet_tpu.gguf.writer import GGUFWriter
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

        src = str(tmp_path / "ok.gguf")
        generate_mini_gguf(src, MiniModelSpec(quant="f32"))

        # write a stripped copy: tensors only, minimal metadata
        broken = str(tmp_path / "broken.gguf")
        with GGUFReader(src) as r:
            w = GGUFWriter()
            for k, v in r.metadata.items():
                if ".block_count" in k or ".embedding_length" in k or \
                        k == "general.architecture":
                    continue
                w.add_metadata(k, v)
            for info in r:
                w.add_quantized_tensor(
                    info.name, tuple(info.logical_shape), info.ggml_type,
                    bytes(r.tensor_bytes(info.name)))
            w.write(broken)

        rep0 = diagnose(broken)
        assert rep0["errors"]            # architecture missing

        fixed = str(tmp_path / "fixed.gguf")
        rep = export_fixed(broken, fixed)
        assert any("general.architecture" in a for a in rep["applied"])
        assert any("block_count" in a for a in rep["applied"])
        rep2 = diagnose(fixed)
        assert not rep2["errors"], rep2

    def test_export_fixed_noop_on_valid(self, mini_gguf_f32, tmp_path):
        out = str(tmp_path / "same.gguf")
        rep = export_fixed(mini_gguf_f32.path, out)
        assert rep["applied"] == []
        assert not diagnose(out)["errors"]


class TestTraceDiffCLI:
    def test_trace_diff_command(self, tmp_path):
        from bitnet_tpu.cli import main
        from bitnet_tpu.verify.trace import TraceSink

        a, b = TraceSink(), TraceSink()
        a.record("x", np.ones((4,)))
        b.record("x", np.ones((4,)))
        pa, pb = str(tmp_path / "a.json"), str(tmp_path / "b.json")
        a.dump(pa)
        b.dump(pb)
        assert main(["trace-diff", pa, pb]) == 0

        b2 = TraceSink()
        b2.record("x", np.full((4,), 99.0))
        b2.dump(pb)
        assert main(["trace-diff", pa, pb]) == 1


class TestSafeTensorsDirectLoad:
    """load_model dispatches SafeTensors / HF dirs via cached conversion
    (reference ModelLoader::load format dispatch, loader.rs:52-75)."""

    def _write_st_checkpoint(self, tmp_path, rng):
        import json

        from safetensors.numpy import save_file

        H, F, V, L, NH, NKV = 64, 128, 96, 2, 4, 2
        t = {}
        t["model.embed_tokens.weight"] = (
            rng.standard_normal((V, H)).astype(np.float32) * 0.05)
        for i in range(L):
            p = f"model.layers.{i}."
            t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
            t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
            for nm, shape in (("self_attn.q_proj", (H, H)),
                              ("self_attn.k_proj", (H // 2, H)),
                              ("self_attn.v_proj", (H // 2, H)),
                              ("self_attn.o_proj", (H, H)),
                              ("mlp.gate_proj", (F, H)),
                              ("mlp.up_proj", (F, H)),
                              ("mlp.down_proj", (H, F))):
                t[p + nm + ".weight"] = (
                    rng.standard_normal(shape).astype(np.float32) * 0.05)
        t["model.norm.weight"] = np.ones(H, np.float32)
        st = str(tmp_path / "model.safetensors")
        save_file(t, st)
        with open(tmp_path / "config.json", "w") as f:
            json.dump({"hidden_size": H, "intermediate_size": F,
                       "num_hidden_layers": L, "num_attention_heads": NH,
                       "num_key_value_heads": NKV, "vocab_size": V,
                       "max_position_embeddings": 128,
                       "rope_theta": 10000.0}, f)
        return st

    def test_load_safetensors_file(self, tmp_path, rng):
        import os

        from bitnet_tpu.models import load_model

        st = self._write_st_checkpoint(tmp_path, rng)
        cfg, params, report = load_model(st, param_dtype=jnp.float32)
        assert cfg.hidden_size == 64 and cfg.num_layers == 2
        assert report.path.endswith(".converted.gguf")
        assert os.path.exists(report.path)
        # cached: loading again reuses the sibling GGUF (same mtime)
        m1 = os.path.getmtime(report.path)
        load_model(st, param_dtype=jnp.float32)
        assert os.path.getmtime(report.path) == m1

    def test_load_hf_directory(self, tmp_path, rng):
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.config import EngineConfig, GenerationConfig

        self._write_st_checkpoint(tmp_path, rng)
        eng = InferenceEngine.from_gguf(
            str(tmp_path), EngineConfig(max_seq_len=32, compute_dtype="f32"))
        out = eng.generate([1, 5, 9], GenerationConfig(max_new_tokens=3,
                                                       greedy=True))
        assert len(out.token_ids) >= 1

    def test_missing_safetensors_dir(self, tmp_path):
        from bitnet_tpu.errors import ModelError
        from bitnet_tpu.models import load_model

        with pytest.raises((ModelError, Exception)):
            load_model(str(tmp_path / "empty_dir_nope"))
