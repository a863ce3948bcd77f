"""Token-level grammar filtering: vocab trie + memoised masks.

A token is *admissible* in a grammar state iff its entire decoded piece
is consumable by the pushdown matcher.  Scanning the vocab piece-by-piece
is O(V·len); the trie walk instead prunes whole subtrees at the first
dead character, and masks are memoised by (stack-set) — grammar decoding
revisits a small number of states (inside a string, inside a number, …),
so steady-state cost is a dict hit.
"""

from __future__ import annotations

import numpy as np

from .gbnf import Grammar, GrammarMatcher, _advance


class _TrieNode:
    __slots__ = ("children", "ids")

    def __init__(self):
        self.children: dict[int, _TrieNode] = {}
        self.ids: list[int] = []


class TokenVocab:
    """The tokenizer's pieces as a codepoint trie (build once, share)."""

    def __init__(self, pieces: list[str], eos_token_id: int | None = None):
        self.size = len(pieces)
        self.eos_token_id = eos_token_id
        self.root = _TrieNode()
        for tid, piece in enumerate(pieces):
            if not piece or tid == eos_token_id:
                continue      # empty/control pieces never advance a grammar
            node = self.root
            for ch in piece:
                cp = ord(ch)
                nxt = node.children.get(cp)
                if nxt is None:
                    nxt = node.children[cp] = _TrieNode()
                node = nxt
            node.ids.append(tid)

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "TokenVocab":
        v = tokenizer.vocab_size
        if callable(v):          # Tokenizer trait method (reference
            v = v()              # lib.rs:83 convention) vs plain attribute
        pieces = [tokenizer.token_to_piece(i) or "" for i in range(v)]
        return cls(pieces, getattr(tokenizer, "eos_token_id", None))


class VocabMatcher:
    """Per-sequence constrained-decoding state over a shared vocab."""

    def __init__(self, grammar: Grammar, vocab: TokenVocab):
        self.vocab = vocab
        self.matcher = GrammarMatcher(grammar)
        self._mask_cache: dict[frozenset, np.ndarray] = {}

    # ------------------------------------------------------------------
    def allowed_mask(self) -> np.ndarray:
        """Boolean [V] mask of admissible next tokens (EOS included when
        the grammar can complete)."""
        stacks = self.matcher.stacks
        cached = self._mask_cache.get(stacks)
        if cached is not None:
            return cached
        mask = np.zeros(self.vocab.size, dtype=bool)
        rules = self.matcher.grammar.rules

        def walk(node: _TrieNode, st: frozenset) -> None:
            for tid in node.ids:
                mask[tid] = True
            for cp, child in node.children.items():
                nxt = _advance(rules, st, cp)
                if nxt:
                    walk(child, nxt)

        walk(self.vocab.root, stacks)
        eos = self.vocab.eos_token_id
        if eos is not None and self.matcher.can_complete:
            mask[eos] = True
        self._mask_cache[stacks] = mask
        return mask

    def accept(self, token_id: int) -> None:
        """Advance past a sampled token (no-op for EOS)."""
        if token_id == self.vocab.eos_token_id:
            return
        piece = self._piece(token_id)
        if piece and not self.matcher.feed_text(piece):
            # the caller sampled outside the mask (shouldn't happen) —
            # freeze the matcher dead so only EOS remains
            self.matcher.stacks = frozenset()

    def _piece(self, token_id: int) -> str:
        # reverse lookup through the trie is wasteful; walk once lazily
        if not hasattr(self, "_pieces"):
            pieces = [""] * self.vocab.size
            stack = [(self.vocab.root, "")]
            while stack:
                node, prefix = stack.pop()
                for tid in node.ids:
                    pieces[tid] = prefix
                for cp, child in node.children.items():
                    stack.append((child, prefix + chr(cp)))
            self._pieces = pieces
        return self._pieces[token_id]

    @property
    def exhausted(self) -> bool:
        """Only EOS is legal (grammar complete or dead-ended)."""
        return self.matcher.must_complete or not self.matcher.alive
