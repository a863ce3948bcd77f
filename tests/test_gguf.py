"""GGUF reader/writer tests.

Mirrors the reference's GGUF loader tests
(``crates/bitnet-models/src/formats/gguf/tests.rs``).
"""

import struct

import numpy as np
import pytest

from bitnet_tpu.errors import FormatError, SecurityError
from bitnet_tpu.gguf import (
    GGMLType,
    GGUFReader,
    GGUFWriter,
    check_magic,
    type_nbytes,
)
from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf


class TestWriterReaderRoundtrip:
    def test_metadata_roundtrip(self, tmp_path):
        p = str(tmp_path / "meta.gguf")
        w = GGUFWriter()
        w.add_metadata("general.architecture", "bitnet-25")
        w.add_metadata("test.u32", 42)
        w.add_metadata("test.i32", -7)
        w.add_metadata("test.f32", 1.5)
        w.add_metadata("test.bool", True)
        w.add_metadata("test.u64", 2**40)
        w.add_metadata("test.arr_int", [1, 2, 3])
        w.add_metadata("test.arr_str", ["a", "bc"])
        w.add_metadata("test.arr_f32", [0.5, 1.5])
        w.write(p)

        with GGUFReader(p) as r:
            assert r.version == 3
            assert r.metadata["general.architecture"] == "bitnet-25"
            assert r.metadata["test.u32"] == 42
            assert r.metadata["test.i32"] == -7
            assert r.metadata["test.f32"] == pytest.approx(1.5)
            assert r.metadata["test.bool"] is True
            assert r.metadata["test.u64"] == 2**40
            np.testing.assert_array_equal(r.metadata["test.arr_int"], [1, 2, 3])
            assert r.metadata["test.arr_str"] == ["a", "bc"]
            np.testing.assert_allclose(r.metadata["test.arr_f32"], [0.5, 1.5])

    def test_tensor_roundtrip_f32(self, tmp_path, rng):
        p = str(tmp_path / "t.gguf")
        a = rng.standard_normal((4, 8)).astype(np.float32)
        b = rng.standard_normal((3,)).astype(np.float32)
        w = GGUFWriter()
        w.add_tensor("a", a)
        w.add_tensor("b", b)
        w.write(p)

        with GGUFReader(p) as r:
            assert set(r.tensors) == {"a", "b"}
            info = r.tensors["a"]
            # GGUF stores innermost-first: (8, 4)
            assert info.shape == (8, 4)
            assert info.logical_shape == (4, 8)
            np.testing.assert_array_equal(r.tensor_data("a"), a)
            np.testing.assert_array_equal(r.tensor_data("b"), b)

    def test_tensor_f16(self, tmp_path, rng):
        p = str(tmp_path / "f16.gguf")
        a = rng.standard_normal((2, 16)).astype(np.float16)
        w = GGUFWriter()
        w.add_tensor("h", a)
        w.write(p)
        with GGUFReader(p) as r:
            assert r.tensors["h"].ggml_type == GGMLType.F16
            np.testing.assert_array_equal(r.tensor_data("h"), a)

    def test_alignment(self, tmp_path, rng):
        p = str(tmp_path / "a.gguf")
        w = GGUFWriter(alignment=64)
        w.add_metadata("general.alignment", 64)
        w.add_tensor("x", rng.standard_normal((5,)).astype(np.float32))
        w.add_tensor("y", rng.standard_normal((7,)).astype(np.float32))
        w.write(p)
        with GGUFReader(p) as r:
            assert r.alignment == 64
            assert r.data_start % 64 == 0
            assert r.tensors["y"].offset % 64 == 0

    def test_quantized_payload_passthrough(self, tmp_path):
        from bitnet_tpu.quant import quantize_qk256

        p = str(tmp_path / "q.gguf")
        vals = np.ones((2, 256), dtype=np.float32)
        payload = quantize_qk256(vals)
        w = GGUFWriter()
        w.add_quantized_tensor("w", (2, 256), GGMLType.I2_S, payload)
        w.write(p)
        with GGUFReader(p) as r:
            info = r.tensors["w"]
            assert info.ggml_type == GGMLType.I2_S
            assert bytes(r.tensor_bytes("w")[: len(payload)]) == payload


class TestFormatValidation:
    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.gguf"
        p.write_bytes(b"NOPE" + b"\x00" * 100)
        assert not check_magic(p)
        with pytest.raises(FormatError):
            GGUFReader(str(p))

    def test_truncated(self, tmp_path):
        p = tmp_path / "trunc.gguf"
        p.write_bytes(struct.pack("<I", 0x46554747) + struct.pack("<I", 3))
        with pytest.raises(FormatError):
            GGUFReader(str(p))

    def test_unsupported_version(self, tmp_path):
        p = tmp_path / "v9.gguf"
        p.write_bytes(
            struct.pack("<I", 0x46554747) + struct.pack("<I", 9)
            + struct.pack("<QQ", 0, 0)
        )
        with pytest.raises(FormatError):
            GGUFReader(str(p))

    def test_security_tensor_count(self, tmp_path):
        p = tmp_path / "bomb.gguf"
        p.write_bytes(
            struct.pack("<I", 0x46554747) + struct.pack("<I", 3)
            + struct.pack("<QQ", 2**40, 0)
        )
        with pytest.raises(SecurityError):
            GGUFReader(str(p))

    def test_empty_file(self, tmp_path):
        p = tmp_path / "empty.gguf"
        p.write_bytes(b"")
        assert not check_magic(p)
        with pytest.raises(FormatError):
            GGUFReader(str(p))

    def test_check_magic_ok(self, tmp_path):
        p = str(tmp_path / "ok.gguf")
        w = GGUFWriter()
        w.write(p)
        assert check_magic(p)


class TestTypeSizes:
    def test_i2s_nominal(self):
        # reference accounting: 8 B per 32-elem block (types.rs:729)
        assert type_nbytes(GGMLType.I2_S, 1024) == 256

    def test_iq2s(self):
        assert type_nbytes(GGMLType.IQ2_S, 256) == 82

    def test_f32(self):
        assert type_nbytes(GGMLType.F32, 10) == 40


class TestMiniFixture:
    def test_generate_and_parse(self, mini_gguf_f32):
        m = mini_gguf_f32
        with GGUFReader(m.path) as r:
            assert r.architecture == "bitnet-25"
            assert r.arch_key("embedding_length") == m.spec.hidden_size
            assert r.arch_key("block_count") == m.spec.num_layers
            assert "token_embd.weight" in r.tensors
            assert f"blk.{m.spec.num_layers-1}.ffn_down.weight" in r.tensors
            emb = r.tensor_data("token_embd.weight")
            assert emb.shape == (m.spec.vocab_size, m.spec.hidden_size)
            np.testing.assert_array_equal(emb, m.weights["token_embd.weight"])

    def test_tokenizer_metadata(self, mini_gguf_f32):
        with GGUFReader(mini_gguf_f32.path) as r:
            toks = r.metadata["tokenizer.ggml.tokens"]
            assert len(toks) == mini_gguf_f32.spec.vocab_size
            assert r.metadata["tokenizer.ggml.bos_token_id"] == 1

    def test_qk256_fixture_flavor(self, mini_gguf_qk256):
        from bitnet_tpu.quant import I2SFlavor, detect_i2s_flavor

        m = mini_gguf_qk256
        with GGUFReader(m.path) as r:
            info = r.tensors["blk.0.ffn_up.weight"]
            assert info.ggml_type == GGMLType.I2_S
            flavor = detect_i2s_flavor(info.nelems, info.nbytes)
            assert flavor == I2SFlavor.GGML_QK256_NO_SCALE

    def test_bitnet32_fixture_flavor(self, mini_gguf_bitnet32):
        from bitnet_tpu.quant import I2SFlavor, detect_i2s_flavor

        m = mini_gguf_bitnet32
        with GGUFReader(m.path) as r:
            info = r.tensors["blk.0.attn_q.weight"]
            flavor = detect_i2s_flavor(info.nelems, info.nbytes)
            assert flavor == I2SFlavor.BITNET32_F16

    def test_fixture_dequant_parity(self, mini_gguf_qk256):
        """Loader dequant must reproduce the fixture's reference weights."""
        from bitnet_tpu.quant import dequantize_qk256

        m = mini_gguf_qk256
        with GGUFReader(m.path) as r:
            name = "blk.0.attn_q.weight"
            info = r.tensors[name]
            out_dim, in_dim = info.logical_shape
            w = dequantize_qk256(r.tensor_bytes(name), out_dim, in_dim)
            np.testing.assert_array_equal(w, m.weights[name])
