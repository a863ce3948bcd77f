"""Receipts / trace / compat tests (reference: bitnet-receipts, bitnet-trace,
bitnet-compat test suites)."""

import numpy as np
import pytest

from bitnet_tpu.verify.compat import diagnose
from bitnet_tpu.verify.receipts import (
    InferenceReceipt,
    generate_receipt,
    validate_receipt,
)
from bitnet_tpu.verify.trace import TraceRecord, TraceSink, compare_records


class TestReceipts:
    def test_roundtrip_json(self):
        r = InferenceReceipt(kernels=["prefill_xla_T8"], backend="cpu")
        r2 = InferenceReceipt.from_json(r.to_json())
        assert r2.kernels == r.kernels
        assert r2.fingerprint() == r.fingerprint()

    def test_valid_receipt_passes(self):
        r = InferenceReceipt(kernels=["prefill_xla_T8", "decode_xla_x4"])
        assert validate_receipt(r) == []

    def test_mock_kernel_rejected_strict(self):
        r = InferenceReceipt(kernels=["mock_matmul"])
        errs = validate_receipt(r, strict=True)
        assert any("mock" in e for e in errs)

    def test_mock_compute_path_rejected(self):
        r = InferenceReceipt(compute_path="mock", kernels=["k"])
        assert any("real" in e for e in validate_receipt(r, strict=True))
        assert validate_receipt(r, strict=False) == []

    def test_empty_kernels_rejected(self):
        assert any("no kernels" in e
                   for e in validate_receipt(InferenceReceipt()))

    def test_parity_gate(self):
        r = InferenceReceipt(kernels=["k"], parity={"passed": False})
        assert any("parity" in e for e in validate_receipt(r))

    def test_engine_receipt(self, mini_gguf_f32):
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine

        eng = InferenceEngine.from_gguf(
            mini_gguf_f32.path, EngineConfig(max_seq_len=64,
                                             compute_dtype="f32"))
        eng.generate([1, 5, 9], GenerationConfig(max_new_tokens=2,
                                                 greedy=True))
        rec = generate_receipt(eng, metrics={"decode_tok_s": 1.0})
        assert rec.compute_path == "real"
        assert validate_receipt(rec) == []
        assert rec.model_info["num_layers"] == 2

    def test_mock_tokenizer_flagged(self, mini_gguf_f32):
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.tokenizer import MockTokenizer

        eng = InferenceEngine.from_gguf(
            mini_gguf_f32.path, EngineConfig(max_seq_len=64,
                                             compute_dtype="f32"),
            tokenizer=MockTokenizer())
        eng.generate("x", GenerationConfig(max_new_tokens=2, greedy=True))
        rec = generate_receipt(eng)
        assert rec.compute_path == "mock"
        assert validate_receipt(rec, strict=True) != []


class TestTrace:
    def test_record_rms(self):
        r = TraceRecord.of("x", np.asarray([3.0, 4.0]))
        assert r.rms == pytest.approx(np.sqrt(12.5))
        assert r.first == [3.0, 4.0]

    def test_dump_load_compare(self, tmp_path):
        s = TraceSink()
        s.record("a", np.ones(8))
        s.record("b", np.full(8, 2.0))
        p = str(tmp_path / "t.json")
        s.dump(p)
        s2 = TraceSink.load(p)
        assert compare_records(s.records, s2.records) == []

    def test_divergence_detected(self):
        a = [TraceRecord.of("x", np.ones(4))]
        b = [TraceRecord.of("x", np.full(4, 1.5))]
        diffs = compare_records(a, b)
        assert len(diffs) == 1 and "rms" in diffs[0]["error"]

    def test_missing_tensor(self):
        a = [TraceRecord.of("x", np.ones(4))]
        assert compare_records(a, [])[0]["error"] == "missing in other trace"


class TestCompat:
    def test_good_fixture_clean(self, mini_gguf_f32):
        rep = diagnose(mini_gguf_f32.path)
        assert rep["errors"] == []

    def test_garbage_file(self, tmp_path):
        p = tmp_path / "x.gguf"
        p.write_bytes(b"garbage")
        rep = diagnose(str(p))
        assert rep["errors"]

    def test_missing_arch(self, tmp_path):
        from bitnet_tpu.gguf.writer import GGUFWriter

        p = str(tmp_path / "noarch.gguf")
        w = GGUFWriter()
        w.write(p)
        rep = diagnose(p)
        assert any("general.architecture" in e for e in rep["errors"])


class TestST2GGUF:
    def test_convert_roundtrip(self, tmp_path):
        from safetensors.numpy import save_file

        from bitnet_tpu.gguf.reader import GGUFReader
        from bitnet_tpu.tools.st2gguf import convert_safetensors_to_gguf

        rng = np.random.default_rng(0)
        H, V, F = 16, 32, 24
        tensors = {
            "model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32),
            "model.norm.weight": np.ones(H, np.float32),
            "model.layers.0.input_layernorm.weight": np.ones(H, np.float32),
            "model.layers.0.post_attention_layernorm.weight": np.ones(H, np.float32),
            "model.layers.0.self_attn.q_proj.weight": rng.standard_normal((H, H)).astype(np.float32),
            "model.layers.0.self_attn.k_proj.weight": rng.standard_normal((H, H)).astype(np.float32),
            "model.layers.0.self_attn.v_proj.weight": rng.standard_normal((H, H)).astype(np.float32),
            "model.layers.0.self_attn.o_proj.weight": rng.standard_normal((H, H)).astype(np.float32),
            "model.layers.0.mlp.gate_proj.weight": rng.standard_normal((F, H)).astype(np.float32),
            "model.layers.0.mlp.up_proj.weight": rng.standard_normal((F, H)).astype(np.float32),
            "model.layers.0.mlp.down_proj.weight": rng.standard_normal((H, F)).astype(np.float32),
        }
        st = str(tmp_path / "model.safetensors")
        save_file(tensors, st)
        out = str(tmp_path / "model.gguf")
        summary = convert_safetensors_to_gguf(st, out, quant="f16")
        assert summary["layers"] == 1
        with GGUFReader(out) as r:
            assert "token_embd.weight" in r.tensors
            assert "blk.0.ffn_down.weight" in r.tensors
            # norms preserved in float (never quantized)
            assert r.tensors["output_norm.weight"].ggml_type.name == "F32"
            emb = r.tensor_data("token_embd.weight")
            np.testing.assert_allclose(
                np.asarray(emb, np.float32),
                tensors["model.embed_tokens.weight"], atol=1e-2)

    def test_convert_quantized(self, tmp_path):
        from safetensors.numpy import save_file

        from bitnet_tpu.gguf.constants import GGMLType
        from bitnet_tpu.gguf.reader import GGUFReader
        from bitnet_tpu.tools.st2gguf import convert_safetensors_to_gguf

        rng = np.random.default_rng(1)
        tensors = {
            "model.embed_tokens.weight": rng.standard_normal((8, 16)).astype(np.float32),
            "model.layers.0.self_attn.q_proj.weight":
                rng.standard_normal((16, 256)).astype(np.float32),
        }
        st = str(tmp_path / "m.safetensors")
        save_file(tensors, st)
        out = str(tmp_path / "m.gguf")
        convert_safetensors_to_gguf(st, out, quant="qk256")
        with GGUFReader(out) as r:
            assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.I2_S
            # embeddings are 2-D too → quantized under qk256 policy
