"""Prefix cache: trie of prompt-token prefixes → host KV snapshots.

Rebuild of the reference's prefix cache
(``bitnet-inference/src/prefix_cache.rs:1-20``): repeated prompts (system
prompts, chat history, few-shot preambles) skip prefill for their shared
prefix.  Snapshots live on the *host* (numpy) — HBM holds exactly one live
cache; restoring is one H2D transfer + ``dynamic_update_slice``, far
cheaper than re-running prefill through 30 ternary layers.

LRU eviction by total cached tokens; lookup walks the token trie to the
deepest node with a snapshot (longest usable prefix).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class PrefixSnapshot:
    """KV state for one prompt prefix (B=1 slice, host-resident)."""

    length: int
    k: np.ndarray                   # [L, length, KV, D]
    v: np.ndarray
    k_scale: np.ndarray | None = None   # [L, length, KV] (quantized caches)
    v_scale: np.ndarray | None = None
    last_used: float = 0.0

    @property
    def nbytes(self) -> int:
        n = self.k.nbytes + self.v.nbytes
        if self.k_scale is not None:
            n += self.k_scale.nbytes + self.v_scale.nbytes
        return n


class _Node:
    __slots__ = ("children", "snapshot")

    def __init__(self):
        self.children: dict[int, _Node] = {}
        self.snapshot: Optional[PrefixSnapshot] = None


class PrefixCache:
    """Token-trie prefix cache with LRU-by-tokens eviction."""

    def __init__(self, max_tokens: int = 16384):
        self.max_tokens = max_tokens
        self._root = _Node()
        self._total_tokens = 0
        self.hits = 0
        self.misses = 0

    # -- core ----------------------------------------------------------------
    def lookup(self, tokens: list[int]) -> tuple[int, PrefixSnapshot | None]:
        """Longest stored prefix of ``tokens`` → (match_len, snapshot).

        Returns (0, None) on a complete miss.  Touches the entry for LRU.
        """
        node = self._root
        best_len, best = 0, None
        for i, t in enumerate(tokens):
            node = node.children.get(t)
            if node is None:
                break
            if node.snapshot is not None:
                best_len, best = i + 1, node.snapshot
        if best is not None:
            best.last_used = time.monotonic()
            self.hits += 1
        else:
            self.misses += 1
        return best_len, best

    def insert(self, tokens: list[int], snapshot: PrefixSnapshot) -> None:
        if snapshot.length != len(tokens):
            raise ValueError(
                f"snapshot length {snapshot.length} != tokens {len(tokens)}")
        if snapshot.length > self.max_tokens:
            return                       # would evict everything; skip
        node = self._root
        for t in tokens:
            node = node.children.setdefault(t, _Node())
        if node.snapshot is None:
            self._total_tokens += snapshot.length
        snapshot.last_used = time.monotonic()
        node.snapshot = snapshot
        self._evict_if_needed()

    # -- eviction --------------------------------------------------------------
    def _walk(self, node: _Node, path: list[int], out: list):
        if node.snapshot is not None:
            out.append((list(path), node))
        for t, child in node.children.items():
            path.append(t)
            self._walk(child, path, out)
            path.pop()

    def _evict_if_needed(self) -> None:
        while self._total_tokens > self.max_tokens:
            entries: list = []
            self._walk(self._root, [], entries)
            if not entries:
                return
            path, node = min(entries, key=lambda e: e[1].snapshot.last_used)
            self._total_tokens -= node.snapshot.length
            node.snapshot = None
            self._prune(path)

    def _prune(self, path: list[int]) -> None:
        """Drop now-empty trie branches."""
        # walk down recording the chain, then trim leaf-ward empties
        chain = [(None, self._root)]
        node = self._root
        for t in path:
            node = node.children[t]
            chain.append((t, node))
        for i in range(len(chain) - 1, 0, -1):
            t, node = chain[i]
            if node.snapshot is None and not node.children:
                del chain[i - 1][1].children[t]
            else:
                break

    # -- stats ----------------------------------------------------------------
    @property
    def cached_tokens(self) -> int:
        return self._total_tokens

    def stats(self) -> dict:
        return {
            "hits": self.hits,
            "misses": self.misses,
            "cached_tokens": self._total_tokens,
            "max_tokens": self.max_tokens,
        }


def snapshot_from_cache(cache, length: int, slot: int = 0,
                        kv_heads: int | None = None) -> PrefixSnapshot:
    """Extract a host snapshot of ``cache`` (engine KVCache) for one slot.
    Snapshots are canonical [L, length, KV, D] even for flat-layout
    ([L, B, S, KV*D]) engine caches — pass ``kv_heads`` (cfg.num_kv_heads)
    when the cache may be flat."""
    from .cache import is_flat

    k = np.asarray(cache.k[:, slot, :length])
    v = np.asarray(cache.v[:, slot, :length])
    if is_flat(cache):
        KV = (kv_heads if kv_heads is not None
              else cache.k_scale.shape[3] if cache.k_scale is not None
              else 1)
        k = k.reshape(k.shape[0], length, KV, -1)
        v = v.reshape(v.shape[0], length, KV, -1)
    ks = vs = None
    if cache.k_scale is not None:
        ks = np.asarray(cache.k_scale[:, slot, :length])
        vs = np.asarray(cache.v_scale[:, slot, :length])
    return PrefixSnapshot(length=length, k=k, v=v, k_scale=ks, v_scale=vs)
