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
