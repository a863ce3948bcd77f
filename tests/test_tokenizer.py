"""Tokenizer tests (reference: bitnet-tokenizers inline tests + fuzz)."""

import numpy as np
import pytest

from bitnet_tpu.gguf.reader import GGUFReader
from bitnet_tpu.tokenizer import (
    GGUFTokenizer,
    MockTokenizer,
    load_tokenizer,
)
from bitnet_tpu.tokenizer.gguf_vocab import SPM_SPACE


def make_spm_vocab():
    """Small SPM-style vocab with scores for merge testing."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    scores = [0.0, 0.0, 0.0]
    # byte pieces
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(6)
        scores.append(-100.0)
    # chars and merges
    pieces = [
        (SPM_SPACE, -1.0), ("h", -2.0), ("e", -2.0), ("l", -2.0),
        ("o", -2.0), ("he", -0.5), ("ll", -0.6), ("hell", -0.3),
        ("hello", -0.1), (SPM_SPACE + "hello", -0.05), ("w", -2.0),
        (SPM_SPACE + "w", -1.5),
    ]
    for p, s in pieces:
        tokens.append(p)
        types.append(1)
        scores.append(s)
    return GGUFTokenizer(tokens, scores, types, bos_token_id=1,
                         eos_token_id=2, unk_token_id=0)


class TestGGUFTokenizer:
    def test_spm_merging_prefers_high_score(self):
        tk = make_spm_vocab()
        ids = tk.encode("hello", add_bos=False)
        # should merge into [▁hello] (best score path)
        assert ids == [tk.token_to_id(SPM_SPACE + "hello")]

    def test_bos_added(self):
        tk = make_spm_vocab()
        ids = tk.encode("hello", add_bos=True)
        assert ids[0] == 1

    def test_byte_fallback(self):
        tk = make_spm_vocab()
        ids = tk.encode("h€llo", add_bos=False)  # € not in vocab → bytes
        assert all(0 <= i < tk.vocab_size() for i in ids)
        # decoding reconstructs the original text
        assert tk.decode(ids).lstrip() == "h€llo"

    def test_decode_skips_specials(self):
        tk = make_spm_vocab()
        ids = [1] + tk.encode("hello", add_bos=False) + [2]
        assert tk.decode(ids).strip() == "hello"

    def test_roundtrip_whitespace(self):
        tk = make_spm_vocab()
        ids = tk.encode("hello hello", add_bos=False)
        assert tk.decode(ids) == " hello hello" or \
            tk.decode(ids) == "hello hello"

    def test_empty(self):
        tk = make_spm_vocab()
        assert tk.encode("", add_bos=False) == []
        assert tk.decode([]) == ""

    def test_no_panic_on_garbage_ids(self):
        tk = make_spm_vocab()
        assert isinstance(tk.decode([99999, -5, 0]), str)


class TestFromGGUF:
    def test_load_from_fixture(self, mini_gguf_f32):
        with GGUFReader(mini_gguf_f32.path) as r:
            tk = GGUFTokenizer.from_gguf_metadata(r.metadata)
        assert tk.bos_token_id == 1
        assert tk.eos_token_id == 2
        assert tk.vocab_size() == mini_gguf_f32.spec.vocab_size

    def test_load_tokenizer_dispatcher(self, mini_gguf_f32):
        tk = load_tokenizer(mini_gguf_f32.path)
        assert not tk.is_mock

    def test_byte_tokens_roundtrip(self, mini_gguf_f32):
        tk = load_tokenizer(mini_gguf_f32.path)
        # fixture vocab is byte pieces <0x00>..; encode falls back to bytes
        ids = tk.encode("ab", add_bos=False)
        assert len(ids) >= 1


class TestMockTokenizer:
    def test_roundtrip(self):
        tk = MockTokenizer()
        ids = tk.encode("hello world", add_bos=True)
        assert ids[0] == tk.bos_token_id
        assert tk.decode(ids) == "hello world"

    def test_is_mock_flag(self):
        assert MockTokenizer().is_mock

    def test_utf8(self):
        tk = MockTokenizer()
        s = "héllo ∑ world"
        assert tk.decode(tk.encode(s, add_bos=False)) == s


class TestSPMBackend:
    """SentencePiece .model backend (no sentencepiece dependency —
    native ModelProto wire parsing, VERDICT round 1 #9)."""

    @staticmethod
    def _pieces():
        from bitnet_tpu.tokenizer.gguf_vocab import SPM_SPACE as W

        pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
        pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
        base = len(pieces)
        for i, (p, s) in enumerate([
            (W, -1.0), (W + "hello", -2.0), (W + "he", -4.0),
            (W + "h", -6.0),
            ("h", -10.0), ("e", -10.0), ("l", -10.0), ("o", -10.0),
            ("ll", -5.0), ("llo", -3.0), (W + "world", -2.5),
            (W + "w", -6.0), (W + "wo", -5.0), (W + "wor", -4.0),
            (W + "worl", -3.0),
            ("w", -10.0), ("r", -10.0), ("d", -10.0),
        ]):
            pieces.append((p, s, 1))
        return pieces, base

    def test_model_file_roundtrip(self, tmp_path):
        from bitnet_tpu.tokenizer.spm import SPMTokenizer, write_spm_model

        pieces, _ = self._pieces()
        path = str(tmp_path / "tokenizer.model")
        write_spm_model(path, pieces)
        tk = SPMTokenizer(path)
        assert len(tk.tokens) == len(pieces)
        assert tk.bos_token_id == 1 and tk.eos_token_id == 2
        ids = tk.encode("hello world", add_bos=True)
        assert ids[0] == 1
        text = tk.decode(ids[1:])
        assert text.strip() == "hello world"

    def test_merge_prefers_high_score(self, tmp_path):
        from bitnet_tpu.tokenizer.spm import SPMTokenizer, write_spm_model

        pieces, _ = self._pieces()
        path = str(tmp_path / "tokenizer.model")
        write_spm_model(path, pieces)
        tk = SPMTokenizer(path)
        ids = tk.encode("hello", add_bos=False)
        assert [tk.tokens[i] for i in ids] == ["▁hello"]

    def test_byte_fallback(self, tmp_path):
        from bitnet_tpu.tokenizer.spm import SPMTokenizer, write_spm_model

        pieces, _ = self._pieces()
        path = str(tmp_path / "tokenizer.model")
        write_spm_model(path, pieces)
        tk = SPMTokenizer(path)
        ids = tk.encode("héllo", add_bos=False)   # é not in vocab → bytes
        assert tk.decode(ids) .strip() == "héllo"

    def test_discovery_chain_finds_model_file(self, tmp_path):
        """A checkpoint directory shipping ONLY tokenizer.model loads."""
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
        from bitnet_tpu.tokenizer import load_tokenizer
        from bitnet_tpu.tokenizer.spm import SPMTokenizer, write_spm_model

        gguf = str(tmp_path / "model.gguf")
        spec = MiniModelSpec()
        generate_mini_gguf(gguf, spec)
        # strip the embedded vocab case by placing a sibling .model —
        # discovery must prefer it (strategy.rs order)
        pieces, _ = self._pieces()
        write_spm_model(str(tmp_path / "tokenizer.model"), pieces)
        tk = load_tokenizer(gguf)
        assert isinstance(tk, SPMTokenizer)

    def test_corrupt_model_falls_through(self, tmp_path):
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
        from bitnet_tpu.tokenizer import load_tokenizer
        from bitnet_tpu.tokenizer.gguf_vocab import GGUFTokenizer

        gguf = str(tmp_path / "model.gguf")
        generate_mini_gguf(gguf, MiniModelSpec())
        (tmp_path / "tokenizer.model").write_bytes(b"\xff\xff\xff\x07garbo")
        tk = load_tokenizer(gguf)      # falls through to embedded vocab
        assert isinstance(tk, GGUFTokenizer)
