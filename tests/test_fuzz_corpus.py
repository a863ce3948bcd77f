"""Adversarial parser corpus — the deterministic-pytest translation of the
reference's 63 cargo-fuzz targets (``fuzz/fuzz_targets/``: GGUF header
parse/roundtrip, quantization codecs, tokenizer encode/decode, sampling
no-panic).  Every input here must either parse cleanly or raise a typed
error from the bitnet_tpu taxonomy — never crash, hang, or allocate
unboundedly.
"""

import struct

import numpy as np
import pytest

from bitnet_tpu.errors import BitNetError
from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
from bitnet_tpu.gguf.reader import GGUFReader

# exceptions a hostile file may legitimately trigger (typed taxonomy plus
# the narrow decode/struct errors raised inside value parsing)
OK_ERRORS = (BitNetError, ValueError, struct.error, UnicodeDecodeError,
             OverflowError, EOFError, KeyError, IndexError)


def _try_parse(path):
    try:
        with GGUFReader(path) as r:
            # touch everything a loader would
            _ = dict(r.metadata)
            for info in r:
                r.tensor_bytes(info.name)
        return True
    except OK_ERRORS:
        return False


@pytest.fixture(scope="module")
def valid_bytes(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    p = str(d / "base.gguf")
    generate_mini_gguf(p, MiniModelSpec(quant="qk256"))
    with open(p, "rb") as f:
        return f.read()


class TestGGUFReaderHammering:
    def test_random_blobs(self, tmp_path):
        rng = np.random.default_rng(0)
        for i in range(100):
            blob = rng.integers(0, 256, size=rng.integers(0, 4096),
                                dtype=np.uint8).tobytes()
            p = tmp_path / f"blob{i}.gguf"
            p.write_bytes(blob)
            _try_parse(str(p))   # must not crash/hang

    def test_random_blobs_with_magic(self, tmp_path):
        rng = np.random.default_rng(1)
        for i in range(100):
            blob = b"GGUF" + rng.integers(
                0, 256, size=rng.integers(0, 2048), dtype=np.uint8).tobytes()
            p = tmp_path / f"magic{i}.gguf"
            p.write_bytes(blob)
            _try_parse(str(p))

    def test_bit_flip_mutants(self, valid_bytes, tmp_path):
        """200 single-byte corruptions of a valid file."""
        rng = np.random.default_rng(2)
        n = len(valid_bytes)
        parsed = 0
        for i in range(200):
            off = int(rng.integers(0, n))
            mutant = bytearray(valid_bytes)
            mutant[off] ^= int(rng.integers(1, 256))
            p = tmp_path / "mut.gguf"
            p.write_bytes(bytes(mutant))
            parsed += _try_parse(str(p))
        # most data-section flips still parse; header flips mostly reject —
        # the point is zero crashes either way
        assert 0 <= parsed <= 200

    def test_truncations(self, valid_bytes, tmp_path):
        """Truncate at 50 positions spanning header/KV/tensor-info/data."""
        n = len(valid_bytes)
        for cut in list(range(0, min(200, n), 7)) + [n // 2, n - 1]:
            p = tmp_path / "trunc.gguf"
            p.write_bytes(valid_bytes[:cut])
            _try_parse(str(p))

    def test_count_bombs(self, tmp_path):
        """Huge tensor/kv counts must be rejected BEFORE allocation."""
        for n_tensors, n_kv in ((2**40, 0), (0, 2**40), (2**63 - 1, 1)):
            blob = (b"GGUF" + struct.pack("<I", 3)
                    + struct.pack("<Q", n_tensors) + struct.pack("<Q", n_kv))
            p = tmp_path / "bomb.gguf"
            p.write_bytes(blob)
            assert not _try_parse(str(p))

    def test_string_length_bomb(self, tmp_path):
        blob = (b"GGUF" + struct.pack("<I", 3) + struct.pack("<Q", 0)
                + struct.pack("<Q", 1) + struct.pack("<Q", 2**50))
        p = tmp_path / "strbomb.gguf"
        p.write_bytes(blob)
        assert not _try_parse(str(p))

    def test_array_length_bomb(self, tmp_path):
        # one KV: key "k", type array(9) of u32(4), count 2^50
        blob = (b"GGUF" + struct.pack("<I", 3) + struct.pack("<Q", 0)
                + struct.pack("<Q", 1)
                + struct.pack("<Q", 1) + b"k"
                + struct.pack("<I", 9)
                + struct.pack("<I", 4) + struct.pack("<Q", 2**50))
        p = tmp_path / "arrbomb.gguf"
        p.write_bytes(blob)
        assert not _try_parse(str(p))


class TestDequantizerHammering:
    """Random payload bytes through every dequantizer: typed error or a
    finite-shaped result (fuzz_targets/quantization_* parity)."""

    def _payloads(self, seed, sizes=(0, 1, 7, 63, 64, 100, 1024)):
        rng = np.random.default_rng(seed)
        for s in sizes:
            yield rng.integers(0, 256, size=s, dtype=np.uint8).tobytes()

    def test_qk256(self):
        from bitnet_tpu.quant.qk256 import dequantize_qk256

        for pay in self._payloads(10):
            for rows, cols in ((1, 256), (4, 256), (2, 300)):
                try:
                    out = dequantize_qk256(pay, rows, cols)
                    assert out.shape == (rows, cols)
                    assert np.isfinite(out).all()
                except OK_ERRORS:
                    pass

    def test_bitnet32(self):
        from bitnet_tpu.quant.i2s import dequantize_bitnet32

        for pay in self._payloads(11):
            for n in (32, 64, 100):
                try:
                    out = dequantize_bitnet32(pay, n)
                    assert out.shape == (n,)
                    assert np.isfinite(out).all()
                except OK_ERRORS:
                    pass

    def test_iq2s(self):
        from bitnet_tpu.quant.qk256 import dequantize_iq2s

        for pay in self._payloads(12):
            for n in (256, 512):
                try:
                    out = dequantize_iq2s(pay, n)
                    assert out.shape == (n,)
                    assert np.isfinite(out).all()
                except OK_ERRORS:
                    pass

    def test_classic_quants(self):
        from bitnet_tpu.quant import ggml_classic as gc

        fns = [gc.dequantize_q8_0, gc.dequantize_q4_0, gc.dequantize_q4_1,
               gc.dequantize_q5_0, gc.dequantize_q5_1]
        for pay in self._payloads(13):
            for fn in fns:
                for n in (32, 96):
                    try:
                        out = fn(pay, n)
                        assert out.shape == (n,)
                    except OK_ERRORS:
                        pass

    def test_k_quants(self):
        from bitnet_tpu.quant import ggml_classic as gc

        for pay in self._payloads(14, sizes=(0, 100, 144, 210, 2048)):
            for fn in (gc.dequantize_q4_k, gc.dequantize_q6_k):
                for n in (256, 512):
                    try:
                        out = fn(pay, n)
                        assert out.shape == (n,)
                    except OK_ERRORS:
                        pass


class TestTokenizerHammering:
    def test_spm_random_bytes(self, tmp_path):
        from bitnet_tpu.tokenizer.spm import SPMTokenizer

        rng = np.random.default_rng(20)
        for i in range(50):
            p = tmp_path / "t.model"
            p.write_bytes(rng.integers(
                0, 256, size=rng.integers(0, 512), dtype=np.uint8).tobytes())
            try:
                tk = SPMTokenizer(str(p))
                tk.encode("hello", add_bos=False)
            except OK_ERRORS:
                pass

    def test_gguf_vocab_weird_inputs(self):
        from bitnet_tpu.tokenizer.gguf_vocab import GGUFTokenizer

        tk = GGUFTokenizer(tokens=["<unk>", "▁", "a", "b", "<0x41>"],
                           token_types=[2, 1, 1, 1, 6], unk_token_id=0)
        for text in ("", " ", "\x00", "🤖" * 10, "a" * 1000, "\n\t\r"):
            ids = tk.encode(text, add_bos=False)
            assert all(0 <= i < 5 for i in ids)
            tk.decode(ids)

    def test_decode_out_of_range_ids(self):
        from bitnet_tpu.tokenizer.gguf_vocab import GGUFTokenizer

        tk = GGUFTokenizer(tokens=["<unk>", "a"], token_types=[2, 1])
        try:
            tk.decode([0, 1, 99, -5])
        except OK_ERRORS:
            pass


class TestSamplingNoPanic:
    def test_degenerate_logits(self):
        import jax
        import jax.numpy as jnp

        from bitnet_tpu.config import GenerationConfig
        from bitnet_tpu.engine.sampling import SamplerChain

        key = jax.random.PRNGKey(0)
        rows = [
            jnp.full((1, 16), -jnp.inf).at[0, 3].set(0.0),
            jnp.zeros((1, 16)),
            jnp.full((1, 16), 1e30),
            jnp.asarray(np.r_[np.nan, np.zeros(15)][None]),
        ]
        chain = SamplerChain(GenerationConfig(temperature=0.8, top_k=4,
                                              top_p=0.9, min_p=0.05))
        for lg in rows:
            tok = int(chain.sample(lg.astype(jnp.float32),
                                   jnp.full((1, 4), -1, jnp.int32), key)[0])
            assert 0 <= tok < 16
