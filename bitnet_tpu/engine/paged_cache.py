"""Paged KV cache: a shared page pool + per-sequence block tables.

Rebuild of the reference's optimized/paged cache
(``bitnet-inference/src/kv_cache_optimized.rs:1-40``,
``bitnet-opencl/src/paged_attention.rs``) the TPU way: pages live in one
static ``[L, P, page, KV, D]`` pool in HBM; each sequence owns an ordered
block table mapping logical position ``p`` → pool page
``table[p // page]``.  Ragged batches share the pool, so HBM is sized by
*total* live tokens, not ``B × max_seq_len``; refcounted pages give O(1)
prefix forking (shared system prompts).

Execution model: the jitted step gathers each sequence's pages into a
dense ``[L, B, S_view, KV, D]`` view, runs the standard dense forward
(models.bitnet.forward — no model-code fork), then scatters the freshly
written rows back to the pool.  The gather adds one pass of HBM traffic
over the view — the same order as attention's own KV read.

A fused Pallas paged-attention kernel (block-table walk via
scalar-prefetch index maps) was evaluated and deliberately NOT built on
current XLA: the pool is a written buffer, and a pallas operand that is
a loop-carried buffer updated anywhere in the program gets a defensive
full copy per call (measured 3–8× decode regressions for the dense-cache
analogues — see docs/architecture.md "cache-aliasing rule").  The
XLA-side gather/scatter fuses; the kernel's copies would not.

The page allocator is host-side (allocation happens only at admission and
at page-boundary crossings — every ``page_size`` decode steps per slot).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..errors import InferenceError
from .cache import _DTYPES


class PagePool:
    """Host-side page allocator with refcounts (prefix sharing / CoW)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, -1, -1))
        self._refs = np.zeros(num_pages, np.int32)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int = 1) -> list[int]:
        if n > len(self._free):
            raise InferenceError(
                f"page pool exhausted: need {n}, have {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self._refs[p] = 1
        return out

    def retain(self, pages: list[int]) -> None:
        """Share pages with another sequence (prefix fork)."""
        for p in pages:
            if self._refs[p] <= 0:
                raise InferenceError(f"retain of free page {p}")
            self._refs[p] += 1

    def release(self, pages: list[int]) -> None:
        for p in pages:
            self._refs[p] -= 1
            if self._refs[p] == 0:
                self._free.append(p)
            elif self._refs[p] < 0:
                raise InferenceError(f"double free of page {p}")

    def refcount(self, page: int) -> int:
        return int(self._refs[page])


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "tables", "lengths"],
    meta_fields=["page_size"],
)
@dataclasses.dataclass
class PagedKVCache:
    """k/v: [L, P, page, KV, D] pool; tables: [B, NB] page ids (-1 empty);
    lengths: [B] valid tokens per sequence."""

    k: jnp.ndarray
    v: jnp.ndarray
    tables: jnp.ndarray
    lengths: jnp.ndarray
    page_size: int = 16

    @property
    def view_len(self) -> int:
        return self.tables.shape[1] * self.page_size

    @property
    def batch_size(self) -> int:
        return self.tables.shape[0]


def allocate_paged_cache(
    cfg: ModelConfig,
    batch_size: int,
    num_pages: int,
    page_size: int = 16,
    max_blocks_per_seq: int | None = None,
    dtype: str = "bf16",
) -> tuple[PagedKVCache, PagePool]:
    if max_blocks_per_seq is None:
        max_blocks_per_seq = num_pages
    L, KV, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    jdtype = _DTYPES[dtype]
    if dtype in ("int8", "fp8"):
        raise InferenceError("paged cache: quantized pages not yet supported")
    zeros = jnp.zeros((L, num_pages, page_size, KV, D), jdtype)
    cache = PagedKVCache(
        k=zeros,
        v=jnp.zeros_like(zeros),
        tables=jnp.full((batch_size, max_blocks_per_seq), -1, jnp.int32),
        lengths=jnp.zeros((batch_size,), jnp.int32),
        page_size=page_size,
    )
    return cache, PagePool(num_pages)


def assign_pages(cache: PagedKVCache, slot: int, pages: list[int],
                 start_block: int = 0) -> PagedKVCache:
    """Host-side: write page ids into one slot's block table."""
    tab = cache.tables.at[slot, start_block:start_block + len(pages)].set(
        jnp.asarray(pages, jnp.int32))
    return dataclasses.replace(cache, tables=tab)


def pages_needed(length: int, page_size: int) -> int:
    return -(-length // page_size)


def ensure_capacity(cache: PagedKVCache, pool: PagePool, slot: int,
                    new_length: int) -> PagedKVCache:
    """Allocate pages so ``slot`` can hold ``new_length`` tokens."""
    have = pages_needed(int(cache.lengths[slot]), cache.page_size)
    # count actually-assigned blocks (restored slots may differ from length)
    tab = np.asarray(cache.tables[slot])
    have = max(have, int((tab >= 0).sum()))
    need = pages_needed(new_length, cache.page_size)
    if need > cache.tables.shape[1]:
        raise InferenceError(
            f"sequence of {new_length} tokens exceeds block table "
            f"({cache.tables.shape[1]} × {cache.page_size})")
    if need > have:
        cache = assign_pages(cache, slot, pool.alloc(need - have), have)
    return cache


def release_slot(cache: PagedKVCache, pool: PagePool,
                 slot: int) -> PagedKVCache:
    """Free a finished sequence's pages and clear its table."""
    tab = np.asarray(cache.tables[slot])
    pool.release([int(p) for p in tab if p >= 0])
    return dataclasses.replace(
        cache,
        tables=cache.tables.at[slot].set(-1),
        lengths=cache.lengths.at[slot].set(0),
    )


def fork_slot(cache: PagedKVCache, pool: PagePool, src: int, dst: int,
              length: int | None = None) -> PagedKVCache:
    """Share ``src``'s pages with ``dst`` (copy-on-write prefix fork).

    ``dst`` must only *append* at positions ≥ its fork length; appends that
    land inside a shared page must copy it first (not yet automated — the
    scheduler forks on page boundaries to avoid it).
    """
    if length is None:
        length = int(cache.lengths[src])
    nb = pages_needed(length, cache.page_size)
    pages = [int(p) for p in np.asarray(cache.tables[src, :nb])]
    if any(p < 0 for p in pages):
        raise InferenceError("fork: source pages not assigned")
    if length % cache.page_size != 0:
        raise InferenceError("fork length must be a page-boundary multiple")
    pool.retain(pages)
    tab = cache.tables.at[dst, :nb].set(jnp.asarray(pages, jnp.int32))
    return dataclasses.replace(
        cache,
        tables=tab,
        lengths=cache.lengths.at[dst].set(length),
    )


# ---------------------------------------------------------------------------
# jitted forward over a gathered view
# ---------------------------------------------------------------------------
def paged_forward(
    cfg: ModelConfig,
    params,
    tokens: jnp.ndarray,       # [B, T]
    q_positions: jnp.ndarray,  # [B, T]; padding marked with pad_marker
    cache: PagedKVCache,
    num_real_tokens: jnp.ndarray | int | None = None,
    kernel_path: str = "xla",
    pad_marker: int | None = None,
):
    """Forward pass reading/writing the page pool.

    Returns (hidden [B, T, H], new_cache with lengths advanced).
    jit-safe: call under jax.jit with ``cache`` donated.
    """
    from ..models.bitnet import forward

    B, T = tokens.shape
    L = cache.k.shape[0]
    page, NB = cache.page_size, cache.tables.shape[1]
    S_view = NB * page
    if num_real_tokens is None:
        num_real_tokens = T

    # 1. gather each sequence's pages into a dense view [L, B, S_view, KV, D]
    safe_tables = jnp.maximum(cache.tables, 0)            # -1 → page 0 (masked)
    k_view = jnp.take(cache.k, safe_tables, axis=1)       # [L, B, NB, page, KV, D]
    v_view = jnp.take(cache.v, safe_tables, axis=1)
    k_view = k_view.reshape(L, B, S_view, *cache.k.shape[3:])
    v_view = v_view.reshape(L, B, S_view, *cache.v.shape[3:])

    # 2. standard dense forward over the view (writes at local positions)
    if pad_marker is not None:
        real = q_positions != pad_marker
        local = jnp.where(real, q_positions, S_view)      # OOB → drop
    else:
        local = q_positions
    h, k_view, v_view, _, _ = forward(
        cfg, params, tokens, q_positions, k_view, v_view, cache.lengths,
        num_real_tokens, kernel_path, write_slots=local)

    # 3. scatter the freshly written rows back into the pool
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]       # [B, 1]
    safe_local = jnp.minimum(local, S_view - 1)
    k_rows = k_view[:, b_idx, safe_local]                 # [L, B, T, KV, D]
    v_rows = v_view[:, b_idx, safe_local]
    page_idx = safe_local // page                         # [B, T]
    gpage = jnp.take_along_axis(cache.tables, page_idx, axis=1)  # [B, T]
    goff = safe_local % page
    # drop padding rows: OOB page id
    P = cache.k.shape[1]
    if pad_marker is not None:
        gpage = jnp.where(local < S_view, gpage, P)
    gpage = jnp.where(gpage < 0, P, gpage)
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None, None]  # [L, 1, 1]
    k_pool = cache.k.at[l_idx, gpage[None], goff[None]].set(
        k_rows, mode="drop")
    v_pool = cache.v.at[l_idx, gpage[None], goff[None]].set(
        v_rows, mode="drop")

    new_cache = dataclasses.replace(
        cache, k=k_pool, v=v_pool,
        lengths=cache.lengths + jnp.asarray(num_real_tokens, jnp.int32),
    )
    return h, new_cache
