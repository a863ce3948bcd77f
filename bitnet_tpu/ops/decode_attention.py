"""Fused single-token (decode) attention Pallas kernel (flash-decode).

Decode attention at T=1 is dominated not by FLOPs but by XLA op dispatch:
the unfused path (ops/attention.py) is ~12 separate fusions per layer —
two cache-sized einsums, mask build, select, max/exp/sum/div, casts — and
round-1 profiling measured ~37 µs/layer of fixed overhead at S≤1024 (the
cache *bytes* only cost ~3 µs).  This kernel collapses the whole thing
into ONE Pallas call per layer.

Design notes (hardware-validated on v5e):
- the cache rides in as a FREE reshape to [B, S, KV*D] so per-head slices
  are 128-aligned lane selections — a (1, S, KV, D) block would pad the
  KV=5 head axis onto 8 sublanes and stride every row;
- the sequence axis is CHUNKED over the grid with online-softmax
  accumulators in VMEM scratch (flash-decode), so Pallas double-buffers
  the K/V streams across grid steps even at B=1;
- the NEW token's k/v is folded into the accumulator init, so the
  KV-cache scatter stays off the critical path and the kernel reads the
  cache read-only (no full-block write-back).

Reference: the 6-backend attention kernel family
(``bitnet-kernels/src/cpu/attention.rs``, ``bitnet_kernels.cu``) — this is
the TPU translation of its fused SDPA decode path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# sequence-chunk width; ≤1024 runs as ONE grid step (see decode_attention)
DEFAULT_CHUNK = 1024



def _gqa_helpers(n_kv: int, G: int, D: int, chunk: int | None = None):
    """GQA block-diagonal helper trio shared by every decode kernel.

    Row i of the [H, ·] layout belongs to kv-head ``i // G``; masks stay
    [H, 1] row vectors (a full [H, KV*D] i1 mask trips a Mosaic relayout
    bug).  Must be called INSIDE the kernel body (traced iota).
    """
    HH = n_kv * G
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HH, 1), 0) // G

    def rowmask(h, dtype):
        return (row_head == h).astype(dtype)              # [H, 1]

    def head_bcast(s2d):
        """[KV, chunk] per-slot scales → [H, chunk] rows by head."""
        acc = None
        for h in range(n_kv):
            seg = (jnp.broadcast_to(s2d[h:h + 1, :], (HH, chunk))
                   * rowmask(h, s2d.dtype))
            acc = seg if acc is None else acc + seg
        return acc

    def select_rows(wide):
        """[H, KV*D] → [H, D]: each row keeps its own head's lane-block."""
        acc = None
        for h in range(n_kv):
            seg = wide[:, h * D:(h + 1) * D] * rowmask(h, wide.dtype)
            acc = seg if acc is None else acc + seg
        return acc

    return rowmask, head_bcast, select_rows


def _decode_attn_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                        out_ref, m_scr, d_scr, ctx_scr,
                        *, scale: float, n_kv: int, G: int, D: int,
                        chunk: int, n_chunks: int):
    b = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[b, 0]
    HH = n_kv * G

    # block-diagonal trick: row i belongs to head i//G, so only its
    # lane-block h*D:(h+1)*D is live.  ALL heads then ride ONE MXU dot per
    # chunk — the per-head small dots cost ~0.3-0.5 µs each in pipeline
    # overhead and dominated this kernel (~29 µs/layer measured).  Masks
    # stay [H, 1] row vectors (a full [H, KV*D] i1 mask trips a Mosaic
    # relayout bug).
    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    qf = q_ref[0].reshape(HH, D)                          # [H, D]
    q_wide = jnp.concatenate(
        [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)

    @pl.when(c == 0)
    def _():
        # accumulators start from the NEW token: m = s_new, denom = 1,
        # ctx = v_new (their e-weight is exp(0) = 1).  Slice the REFS per
        # head then broadcast — lane-slicing a sublane-broadcast value is
        # an invalid Mosaic layout.
        kn_sel = None
        vn_sel = None
        for h in range(n_kv):
            rm = rowmask(h, jnp.float32)
            kh = jnp.broadcast_to(
                kn_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32),
                (HH, D)) * rm
            vh = jnp.broadcast_to(
                vn_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32),
                (HH, D)) * rm
            kn_sel = kh if kn_sel is None else kn_sel + kh
            vn_sel = vh if vn_sel is None else vn_sel + vh
        s_new = jnp.sum(
            qf.astype(jnp.float32) * kn_sel,
            axis=1, keepdims=True) * scale                # [H, 1]
        m_scr[:] = s_new
        d_scr[:] = jnp.ones((HH, 1), jnp.float32)
        ctx_scr[:] = vn_sel

    base = c * chunk
    kc = k_ref[0]                                         # [chunk, KV*D]
    vc = v_ref[0]
    s = jax.lax.dot_general(
        q_wide, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [H, chunk]
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)
    s = jnp.where(idx < pos, s, NEG_INF)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new)                                # [H, chunk]
    m_scr[:] = m_new
    d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    # one PV dot over ALL heads; rows pick their own head's lane-block
    r = jax.lax.dot_general(
        e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, KV*D]
    ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[0] = (ctx_scr[:] / d_scr[:]).reshape(
            n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def decode_attention_stacked(
    l: jnp.ndarray,         # [] / [1] int32 layer index (traced)
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]      (post-RoPE)
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [L, B, S, KV, D]  FULL stack (PRE-write)
    v_cache: jnp.ndarray,   # [L, B, S, KV, D]
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
) -> jnp.ndarray:
    """:func:`decode_attention` over one layer of the FULL stacked cache,
    selected via a scalar-prefetch layer index — under ``lax.scan`` a
    per-layer cache slice feeding a pallas operand is a materialized HBM
    copy (same story as ternary_matmul_stacked)."""
    B, H, D = q.shape
    L, S, KV = k_cache.shape[0], k_cache.shape[2], k_cache.shape[3]
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(L, B, S, KV * D)    # free reshape
    vcv = v_cache.reshape(L, B, S, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    if chunk is None:
        chunk = min(DEFAULT_CHUNK, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    grid = (B, n_chunks)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, c, lr: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, G, D), lambda b, c, lr: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, KV * D), lambda b, c, lr: (b, 0, 0)),
            pl.BlockSpec((1, 1, KV * D), lambda b, c, lr: (b, 0, 0)),
            pl.BlockSpec((1, 1, chunk, KV * D),
                         lambda b, c, lr: (lr[0], b, c, 0)),
            pl.BlockSpec((1, 1, chunk, KV * D),
                         lambda b, c, lr: (lr[0], b, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, KV, G, D), lambda b, c, lr: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),
            pltpu.VMEM((KV * G, 1), jnp.float32),
            pltpu.VMEM((KV * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_attn_stacked_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          chunk=chunk, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)


def _decode_attn_stacked_kernel(l_ref, pos_ref, q_ref, kn_ref, vn_ref,
                                k_ref, v_ref, out_ref, m_scr, d_scr,
                                ctx_scr, *, scale: float, n_kv: int,
                                G: int, D: int, chunk: int, n_chunks: int):
    """Body identical to _decode_attn_kernel; cache refs carry a leading
    layer axis selected by the block index maps."""
    _decode_attn_kernel(pos_ref, q_ref, kn_ref, vn_ref,
                        k_ref.at[0], v_ref.at[0], out_ref,
                        m_scr, d_scr, ctx_scr, scale=scale, n_kv=n_kv,
                        G=G, D=D, chunk=chunk, n_chunks=n_chunks)


def _decode_attn_stacked_io_kernel(l_ref, pos_ref, q_ref, kn_ref, vn_ref,
                                   k_ref, v_ref, out_ref, ko_ref, vo_ref,
                                   m_scr, d_scr, ctx_scr, *, scale: float,
                                   n_kv: int, G: int, D: int, chunk: int,
                                   n_chunks: int):
    """Stacked-cache attention that ALSO owns the cache update: the
    aliased output blocks carry each chunk through unchanged and insert
    the new token's k/v row in the chunk containing ``pos``.

    EXPERIMENTAL, currently unused: the intent was to let the cache ride
    the decode scan as a carry with pure buffer donation (xs/ys threading
    materializes ~0.7 ms/step of per-layer slice/restack copies).  In
    practice XLA does NOT alias the scan carry through the aliased custom
    call either — measured 8.3 ms/token vs 2.29 for the xs/ys stacked
    loop on v5e — so _decode_stacked keeps xs/ys caches.  Kept (with the
    interpret-mode path tested) for re-evaluation on newer XLA."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    wpos = pos_ref[b, 1]                     # write slot (col 0 = mask len)
    base = c * chunk
    # masked select instead of a dynamic row store: Mosaic requires
    # sublane-dim store offsets to be provably 8-aligned; the row mask is
    # one VPU select over a block that must be written back anyway.
    # wpos outside this chunk (incl. >= S padding) selects no row.
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    sel = rows == (wpos - base)
    ko_ref[0, 0] = jnp.where(
        sel, jnp.broadcast_to(kn_ref[0], (chunk, kn_ref.shape[-1])),
        k_ref[0, 0]).astype(ko_ref.dtype)
    vo_ref[0, 0] = jnp.where(
        sel, jnp.broadcast_to(vn_ref[0], (chunk, vn_ref.shape[-1])),
        v_ref[0, 0]).astype(vo_ref.dtype)

    _decode_attn_kernel(pos_ref, q_ref, kn_ref, vn_ref,
                        k_ref.at[0], v_ref.at[0], out_ref,
                        m_scr, d_scr, ctx_scr, scale=scale, n_kv=n_kv,
                        G=G, D=D, chunk=chunk, n_chunks=n_chunks)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"),
                   donate_argnums=(4, 5))
def decode_attention_stacked_inplace(
    l: jnp.ndarray,         # [] / [1] int32 layer index (traced)
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]      (post-RoPE)
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [L, B, S, KV, D]  FULL stack (PRE-write)
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32 valid length (attention mask)
    write_pos: jnp.ndarray | None = None,   # [B] write slot (default pos)
    interpret: bool = False,
    chunk: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused attention + cache-row write over the FULL stacked cache.

    Returns (attn [B, H, D], k_cache, v_cache) with layer ``l``'s row at
    ``write_pos`` updated IN PLACE (aliased buffers — no cache copies).
    Writes drop when ``write_pos >= S`` (padding semantics)."""
    B, H, D = q.shape
    L, S, KV = k_cache.shape[0], k_cache.shape[2], k_cache.shape[3]
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(L, B, S, KV * D)
    vcv = v_cache.reshape(L, B, S, KV * D)
    if write_pos is None:
        write_pos = pos
    pos2 = jnp.stack(
        [pos.astype(jnp.int32), write_pos.astype(jnp.int32)], axis=1)

    if chunk is None:
        chunk = min(DEFAULT_CHUNK, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    cache_spec = pl.BlockSpec((1, 1, chunk, KV * D),
                              lambda b, c, lr: (lr[0], b, c, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((B, 2), lambda b, c, lr: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, G, D), lambda b, c, lr: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, KV * D), lambda b, c, lr: (b, 0, 0)),
            pl.BlockSpec((1, 1, KV * D), lambda b, c, lr: (b, 0, 0)),
            cache_spec,
            cache_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, KV, G, D), lambda b, c, lr: (b, 0, 0, 0)),
            cache_spec,
            cache_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),
            pltpu.VMEM((KV * G, 1), jnp.float32),
            pltpu.VMEM((KV * G, D), jnp.float32),
        ],
    )
    out, kc2, vc2 = pl.pallas_call(
        functools.partial(_decode_attn_stacked_io_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          chunk=chunk, n_chunks=n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
            jax.ShapeDtypeStruct(kcv.shape, dt),
            jax.ShapeDtypeStruct(vcv.shape, dt),
        ),
        grid_spec=gs,
        # operand indices INCLUDE the scalar-prefetch arg: caches are 5/6
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos2, qg, kn, vn, kcv, vcv)
    return (out.reshape(B, H, D),
            kc2.reshape(L, B, S, KV, D),
            vc2.reshape(L, B, S, KV, D))


def _decode_attn_qkv_kernel(pos_ref, qkv_ref, sin_ref, cos_ref, k_ref,
                            v_ref, out_ref, kr_ref, vr_ref,
                            m_scr, d_scr, ctx_scr, q_scr,
                            *, scale: float, n_kv: int, G: int, D: int,
                            chunk: int, n_chunks: int):
    """Rope-fused flash-decode: consumes the RAW fused q|k|v projection
    row, applies RoPE (LLaMA split layout) to q and k in-kernel, and
    emits attention + the roped k row + the v row for the cache scatter.

    Removes the per-layer XLA glue between the qkv matmul and attention
    (q/k/v slices+reshapes and two rope fusions — decode at B=1 is
    dispatch-bound, ~1.5-2 µs per XLA op).
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[b, 0]
    HH = n_kv * G
    half = D // 2

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    @pl.when(c == 0)
    def _():
        # qkv arrives pre-shaped [rows, D] — an in-kernel [1, R*D] →
        # [R, D] reshape is a lane→sublane relayout Mosaic executes
        # catastrophically slowly (~180 µs measured); XLA does it for ~1 µs
        rows = qkv_ref[0].astype(jnp.float32)
        cs = jnp.concatenate([cos_ref[:], cos_ref[:]], axis=1)  # [1, D]
        sn = jnp.concatenate([sin_ref[:], sin_ref[:]], axis=1)
        qk = rows[0:HH + n_kv]
        rot = jnp.concatenate([-qk[:, half:], qk[:, :half]], axis=1)
        qk = qk * cs + rot * sn                           # split-layout RoPE
        qf = qk[0:HH]                                     # [H, D] roped q
        k_row = qk[HH:HH + n_kv]                          # [KV, D] roped k
        v_row = rows[HH + n_kv:]
        q_scr[:] = qf
        kr_ref[0] = k_row.astype(kr_ref.dtype)
        vr_ref[0] = v_row.astype(vr_ref.dtype)
        # accumulators start from the NEW token (e-weight exp(0) = 1)
        kn_sel = None
        vn_sel = None
        for h in range(n_kv):
            rm = rowmask(h, jnp.float32)
            kh = jnp.broadcast_to(k_row[h:h + 1, :], (HH, D)) * rm
            vh = jnp.broadcast_to(v_row[h:h + 1, :], (HH, D)) * rm
            kn_sel = kh if kn_sel is None else kn_sel + kh
            vn_sel = vh if vn_sel is None else vn_sel + vh
        s_new = jnp.sum(qf * kn_sel, axis=1, keepdims=True) * scale
        m_scr[:] = s_new
        d_scr[:] = jnp.ones((HH, 1), jnp.float32)
        ctx_scr[:] = vn_sel

    base = c * chunk
    kc = k_ref[0]                                         # [chunk, KV*D]
    vc = v_ref[0]
    qf = q_scr[:].astype(kc.dtype)
    q_wide = jnp.concatenate(
        [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)
    s = jax.lax.dot_general(
        q_wide, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [H, chunk]
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)
    s = jnp.where(idx < pos, s, NEG_INF)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new)                                # [H, chunk]
    m_scr[:] = m_new
    d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    r = jax.lax.dot_general(
        e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, KV*D]
    ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[0] = (ctx_scr[:] / d_scr[:]).reshape(
            n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk",
                                    "n_kv"))
def decode_attention_qkv(
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2] rope row at the query position
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [B, S, KV, D] or pre-flat [B, S, KV*D]
    v_cache: jnp.ndarray,   # (PRE-write)
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rope-fused decode attention over the raw q|k|v row.

    Returns (attn [B, n_heads, D], k_roped [B, KV, D] in cache dtype,
    v_row [B, KV, D] in cache dtype) — the caller scatters the k/v rows
    into the cache at the write slot.

    A 3-D ``k_cache`` is the PRE-FLATTENED [B, S, KV*D] form (pass
    ``n_kv``): the rows-mode scan threads flat xs so this wrapper adds NO
    XLA reshape on the cache — the 5-D→3-D reshape here was what forced
    whole-cache relayout copies per decode step (profiled copy.44/45,
    ~625 µs each at S=4096).
    """
    B = qkv.shape[0]
    if k_cache.ndim == 4:
        S, KV, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
        kcv = k_cache.reshape(B, S, KV * D)
        vcv = v_cache.reshape(B, S, KV * D)
    else:
        S, KV = k_cache.shape[1], n_kv
        D = k_cache.shape[2] // KV
        kcv, vcv = k_cache, v_cache
    H = n_heads
    G = H // KV
    dt = k_cache.dtype
    qkv = qkv.reshape(B, H + 2 * KV, D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    if chunk is None:
        chunk = min(DEFAULT_CHUNK, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    grid = (B, n_chunks)
    out, kr, vr = pl.pallas_call(
        functools.partial(_decode_attn_qkv_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, chunk=chunk,
                          n_chunks=n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, D), dt),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H + 2 * KV, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running max
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running denom
            pltpu.VMEM((KV * G, D), jnp.float32),    # running context
            pltpu.VMEM((KV * G, D), jnp.float32),    # roped q
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qkv, sin_row, cos_row, kcv, vcv)
    return out.reshape(B, H, D), kr, vr


def _decode_attn_quant_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                              ks_ref, vs_ref, out_ref, m_scr, d_scr,
                              ctx_scr, *, scale: float, n_kv: int, G: int,
                              D: int, chunk: int, n_chunks: int):
    """Flash-decode over an int8 KV cache with per-vector scales,
    dequantized IN-KERNEL.

    The cache streams HBM→VMEM as int8 (half the bytes of bf16) and the
    scales arrive TRANSPOSED [KV, S] so the per-(slot, head) factors fold
    into the score/PV math without a Mosaic relayout:
      scores: (q · k_int8) * k_scale[slot, head]  — applied after the dot
      PV:     (e * v_scale[slot, head]) · v_int8  — folded into e
    The NEW token's k/v arrives as round-tripped bf16 rows (same numerics
    as the generic path that reads the written row back quantized).

    Matches the reference's quantized-cache intent
    (crates/bitnet-inference/src/kv_cache_optimized.rs:1-40) — there the
    win is RAM; here it is the HBM stream, which decode is bound by.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[b, 0]
    HH = n_kv * G

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    qf = q_ref[0].reshape(HH, D)                          # [H, D] bf16
    q_wide = jnp.concatenate(
        [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)

    @pl.when(c == 0)
    def _():
        kn_sel = None
        vn_sel = None
        for h in range(n_kv):
            rm = rowmask(h, jnp.float32)
            kh = jnp.broadcast_to(
                kn_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32),
                (HH, D)) * rm
            vh = jnp.broadcast_to(
                vn_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32),
                (HH, D)) * rm
            kn_sel = kh if kn_sel is None else kn_sel + kh
            vn_sel = vh if vn_sel is None else vn_sel + vh
        s_new = jnp.sum(
            qf.astype(jnp.float32) * kn_sel,
            axis=1, keepdims=True) * scale                # [H, 1]
        m_scr[:] = s_new
        d_scr[:] = jnp.ones((HH, 1), jnp.float32)
        ctx_scr[:] = vn_sel

    base = c * chunk
    kc = k_ref[0].astype(q_wide.dtype)                    # int8 → bf16
    vc = v_ref[0].astype(q_wide.dtype)
    s = jax.lax.dot_general(
        q_wide, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [H, chunk]
    s = s * head_bcast(ks_ref[0])                         # dequant scores
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)
    s = jnp.where(idx < pos, s, NEG_INF)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new)                                # [H, chunk]
    m_scr[:] = m_new
    d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    ev = (e * head_bcast(vs_ref[0])).astype(vc.dtype)     # dequant PV
    r = jax.lax.dot_general(
        ev, vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, KV*D]
    ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[0] = (ctx_scr[:] / d_scr[:]).reshape(
            n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def decode_attention_quant(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D] DEQUANTIZED (round-tripped) rows
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D] int8 (PRE-write)
    v_cache: jnp.ndarray,   # [B, S, KV, D] int8
    k_scale: jnp.ndarray,   # [B, S, KV] f32 per-vector scales
    v_scale: jnp.ndarray,   # [B, S, KV]
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
) -> jnp.ndarray:
    """:func:`decode_attention` over an int8 quantized cache; the dequant
    happens in VMEM so HBM only streams int8 + the tiny scale planes."""
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    act = jnp.bfloat16
    qg = q.astype(act).reshape(B, KV, G, D)
    kn = k_new.astype(act).reshape(B, 1, KV * D)
    vn = v_new.astype(act).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(B, S, KV * D)
    vcv = v_cache.reshape(B, S, KV * D)
    # transpose the scale planes to [B, KV, S]: per-head rows broadcast
    # on sublanes in-kernel (a [S, KV] block would need a relayout)
    kst = jnp.swapaxes(k_scale.astype(jnp.float32), 1, 2)
    vst = jnp.swapaxes(v_scale.astype(jnp.float32), 1, 2)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    if chunk is None:
        chunk = min(DEFAULT_CHUNK, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    grid = (B, n_chunks)
    out = pl.pallas_call(
        functools.partial(_decode_attn_quant_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          chunk=chunk, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV * D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV * D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, chunk), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, chunk), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running max
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running denom
            pltpu.VMEM((KV * G, D), jnp.float32),    # running context
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv, kst, vst)
    return out.reshape(B, H, D)


def _decode_attn_qkv_quant_kernel(pos_ref, qkv_ref, sin_ref, cos_ref,
                                  k_ref, v_ref, ks_ref, vs_ref,
                                  out_ref, kq_ref, vq_ref, kso_ref, vso_ref,
                                  m_scr, d_scr, ctx_scr, q_scr,
                                  *, scale: float, n_kv: int, G: int,
                                  D: int, chunk: int, n_chunks: int,
                                  qmax: float = 127.0, is_int: bool = True):
    """Rope-fused flash-decode over an int8 KV cache: ONE kernel applies
    RoPE to the raw q|k|v row, QUANTIZES the new k/v rows in-VMEM
    (per-vector absmax, same math as models/bitnet._quantize_kv), streams
    the cache as int8 with per-(slot, head) scale dequant folded into the
    score/PV math, and emits the int8 rows + scales for the post-scan
    cache scatter.

    Combines _decode_attn_qkv_kernel (rope fusion) with
    _decode_attn_quant_kernel (int8 stream): the quantized cache now rides
    the FASTEST decode path instead of falling back to the unfused one —
    half the HBM cache read of bf16 with none of the XLA glue.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    pos = pos_ref[b, 0]
    HH = n_kv * G
    half = D // 2

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    @pl.when(c == 0)
    def _():
        rows = qkv_ref[0].astype(jnp.float32)
        cs = jnp.concatenate([cos_ref[:], cos_ref[:]], axis=1)  # [1, D]
        sn = jnp.concatenate([sin_ref[:], sin_ref[:]], axis=1)
        qk = rows[0:HH + n_kv]
        rot = jnp.concatenate([-qk[:, half:], qk[:, :half]], axis=1)
        qk = qk * cs + rot * sn                           # split-layout RoPE
        qf = qk[0:HH]                                     # [H, D] roped q
        k_row = qk[HH:HH + n_kv]                          # [KV, D] roped k
        v_row = rows[HH + n_kv:]
        q_scr[:] = qf

        # per-vector absmax quantization (== _quantize_kv: round+clip for
        # int8, straight cast for fp8 e4m3 — the cast itself rounds)
        def quantize(row):
            am = jnp.max(jnp.abs(row), axis=1, keepdims=True)   # [KV, 1]
            s = jnp.maximum(am, 1e-8) / qmax
            qv = row / s
            if is_int:
                qv = jnp.clip(jnp.round(qv), -qmax, qmax)
            return qv, s

        kq, k_s = quantize(k_row)
        vq, v_s = quantize(v_row)
        kq8 = kq.astype(kq_ref.dtype)
        vq8 = vq.astype(vq_ref.dtype)
        kq_ref[0] = kq8
        vq_ref[0] = vq8
        kso_ref[0] = k_s
        vso_ref[0] = v_s
        # accumulators start from the ROUND-TRIPPED new token so numerics
        # match the generic path (which reads the written row back
        # quantized); e-weight exp(0) = 1
        k_rt = kq8.astype(jnp.float32) * k_s
        v_rt = vq8.astype(jnp.float32) * v_s
        kn_sel = None
        vn_sel = None
        for h in range(n_kv):
            rm = rowmask(h, jnp.float32)
            kh = jnp.broadcast_to(k_rt[h:h + 1, :], (HH, D)) * rm
            vh = jnp.broadcast_to(v_rt[h:h + 1, :], (HH, D)) * rm
            kn_sel = kh if kn_sel is None else kn_sel + kh
            vn_sel = vh if vn_sel is None else vn_sel + vh
        s_new = jnp.sum(qf * kn_sel, axis=1, keepdims=True) * scale
        m_scr[:] = s_new
        d_scr[:] = jnp.ones((HH, 1), jnp.float32)
        ctx_scr[:] = vn_sel

    base = c * chunk
    kc = k_ref[0].astype(jnp.bfloat16)                    # int8 → bf16
    vc = v_ref[0].astype(jnp.bfloat16)
    qf = q_scr[:].astype(jnp.bfloat16)
    q_wide = jnp.concatenate(
        [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)
    s = jax.lax.dot_general(
        q_wide, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [H, chunk]
    s = s * head_bcast(ks_ref[0])                         # dequant scores
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)
    s = jnp.where(idx < pos, s, NEG_INF)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new)                                # [H, chunk]
    m_scr[:] = m_new
    d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    ev = (e * head_bcast(vs_ref[0])).astype(vc.dtype)     # dequant PV
    r = jax.lax.dot_general(
        ev, vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, KV*D]
    ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[0] = (ctx_scr[:] / d_scr[:]).reshape(
            n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk",
                                    "n_kv"))
def decode_attention_qkv_quant(
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2] rope row at the query position
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [B, S, KV, D] int8 or pre-flat [B, S, KV*D]
    v_cache: jnp.ndarray,   # (PRE-write)
    k_scale: jnp.ndarray,   # [B, S, KV] f32 per-vector scales
    v_scale: jnp.ndarray,   # [B, S, KV]
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rope-fused decode attention over the raw q|k|v row with an int8
    quantized cache; rope, row quantization, and cache dequant all happen
    in VMEM.  Returns (attn [B, n_heads, D], k_q [B, KV, D] int8,
    v_q [B, KV, D] int8, k_s [B, KV] f32, v_s [B, KV] f32) — the caller
    scatters the rows + scales into the cache at the write slot.

    3-D caches are the pre-flattened rows-mode form (see
    :func:`decode_attention_qkv`); pass ``n_kv``.
    """
    B = qkv.shape[0]
    if k_cache.ndim == 4:
        S, KV, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
        kcv = k_cache.reshape(B, S, KV * D)
        vcv = v_cache.reshape(B, S, KV * D)
    else:
        S, KV = k_cache.shape[1], n_kv
        D = k_cache.shape[2] // KV
        kcv, vcv = k_cache, v_cache
    H = n_heads
    G = H // KV
    dt = k_cache.dtype
    qkv = qkv.reshape(B, H + 2 * KV, D)
    # transposed scale planes: per-head rows broadcast on sublanes
    kst = jnp.swapaxes(k_scale.astype(jnp.float32), 1, 2)   # [B, KV, S]
    vst = jnp.swapaxes(v_scale.astype(jnp.float32), 1, 2)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    if chunk is None:
        chunk = min(DEFAULT_CHUNK, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    grid = (B, n_chunks)
    is_int = dt == jnp.int8
    out, kq, vq, ks_o, vs_o = pl.pallas_call(
        functools.partial(_decode_attn_qkv_quant_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          chunk=chunk, n_chunks=n_chunks,
                          qmax=127.0 if is_int else 448.0, is_int=is_int),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H + 2 * KV, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, chunk), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, chunk), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, 1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, 1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running max
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running denom
            pltpu.VMEM((KV * G, D), jnp.float32),    # running context
            pltpu.VMEM((KV * G, D), jnp.float32),    # roped q
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qkv, sin_row, cos_row, kcv, vcv, kst, vst)
    return (out.reshape(B, H, D), kq, vq,
            ks_o.reshape(B, KV), vs_o.reshape(B, KV))


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def decode_attention(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]      (post-RoPE)
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D]   (PRE-write: new row not needed)
    v_cache: jnp.ndarray,   # [B, S, KV, D]
    pos: jnp.ndarray,       # [B] int32: #valid cache slots / query position
    interpret: bool = False,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Fused causal GQA attention for one decode step.

    Equivalent to ``attention(q[:,None], cache_after_write, ...)[:, 0]``
    with slot ``pos`` holding the new token.  Returns [B, n_heads, D].
    """
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(B, S, KV * D)       # free reshape (row-major)
    vcv = v_cache.reshape(B, S, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    if chunk is None:
        # whole-S single grid step up to 1024: the K/V stream is small
        # enough (≤2.6 MB) that per-grid-step DMA setup dominates
        # double-buffering gains (v5e sweep: 4.8 µs/layer @1024 vs 6.0
        # @256); larger caches chunk at 1024 to overlap the streams
        chunk = min(DEFAULT_CHUNK, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    grid = (B, n_chunks)
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, chunk=chunk,
                          n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV * D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KV * D), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, KV * D), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KV, G, D), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running max
            pltpu.VMEM((KV * G, 1), jnp.float32),    # running denom
            pltpu.VMEM((KV * G, D), jnp.float32),    # running context
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)


def _decode_attn_batched_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref,
                                v_ref, out_ref, *scr, scale: float,
                                n_kv: int, G: int, D: int, B: int,
                                chunk: int, n_chunks: int):
    """Flash-decode with the WHOLE batch in one program per sequence
    chunk.

    The per-b grid of :func:`decode_attention` pays the kernel's fixed
    cost (mask builds, head selects, pipeline bubbles) B times per layer
    — at B=8 that lost to XLA einsum attention (5.48 vs 2.99 ms/token,
    v5e rows-mode).  Here the grid is (n_chunks,) and an unrolled
    per-b body shares one program: the fixed cost amortizes over the
    batch while each b still streams only its own cache rows.  Per-b
    online-softmax accumulators live in per-b scratch (a [B*H, 1] layout
    would need 8-aligned sublane slices; H=20 rows is not).
    """
    c = pl.program_id(0)
    HH = n_kv * G

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    base = c * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)

    for b in range(B):
        m_scr, d_scr, ctx_scr = scr[3 * b], scr[3 * b + 1], scr[3 * b + 2]
        pos = pos_ref[b, 0]
        qf = q_ref[b].reshape(HH, D)                      # [H, D]
        q_wide = jnp.concatenate(
            [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)

        @pl.when(c == 0)
        def _(b=b, m_scr=m_scr, d_scr=d_scr, ctx_scr=ctx_scr, qf=qf):
            kn_sel = None
            vn_sel = None
            for h in range(n_kv):
                rm = rowmask(h, jnp.float32)
                kh = jnp.broadcast_to(
                    kn_ref[b, :, h * D:(h + 1) * D].astype(jnp.float32),
                    (HH, D)) * rm
                vh = jnp.broadcast_to(
                    vn_ref[b, :, h * D:(h + 1) * D].astype(jnp.float32),
                    (HH, D)) * rm
                kn_sel = kh if kn_sel is None else kn_sel + kh
                vn_sel = vh if vn_sel is None else vn_sel + vh
            s_new = jnp.sum(
                qf.astype(jnp.float32) * kn_sel,
                axis=1, keepdims=True) * scale            # [H, 1]
            m_scr[:] = s_new
            d_scr[:] = jnp.ones((HH, 1), jnp.float32)
            ctx_scr[:] = vn_sel

        kc = k_ref[b]                                     # [chunk, KV*D]
        vc = v_ref[b]
        s = jax.lax.dot_general(
            q_wide, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [H, chunk]
        s = jnp.where(idx < pos, s, NEG_INF)

        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s - m_new)                            # [H, chunk]
        m_scr[:] = m_new
        d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        r = jax.lax.dot_general(
            e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [H, KV*D]
        ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

        @pl.when(c == n_chunks - 1)
        def _(b=b, d_scr=d_scr, ctx_scr=ctx_scr):
            out_ref[b] = (ctx_scr[:] / d_scr[:]).reshape(
                n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def decode_attention_batched(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]      (post-RoPE)
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D]   (PRE-write)
    v_cache: jnp.ndarray,   # [B, S, KV, D]
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
) -> jnp.ndarray:
    """:func:`decode_attention` semantics with ALL batch rows per grid
    step — the fused-kernel path for batched decode (B>2), where the
    per-b grid's fixed cost made the kernel lose to XLA einsum.  Also
    reads the PRE-write cache (new token folded in-kernel), so rows-mode
    callers skip the post-write slice copy XLA attention needs."""
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(B, S, KV * D)
    vcv = v_cache.reshape(B, S, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    if chunk is None:
        # VMEM budget: 2 caches x 2 double-buffers x B x chunk x KV*D
        # bytes — cap B*chunk at ~2048 rows (~10.5 MB at KV*D=640 bf16),
        # rounded DOWN to a power of two so the divisibility halving
        # below terminates at a useful width for any B (a 682-row seed
        # at B=3 would collapse to chunk=2 against S=1024)
        chunk = max(128, 1 << ((2048 // B).bit_length() - 1))
    chunk = min(chunk, S, DEFAULT_CHUNK)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    out = pl.pallas_call(
        functools.partial(_decode_attn_batched_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          B=B, chunk=chunk, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, KV, G, D), lambda c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, KV * D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, KV * D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, KV, G, D), lambda c: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            s for _ in range(B)
            for s in (pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)


def _decode_attn_quant_batched_kernel(pos_ref, q_ref, kn_ref, vn_ref,
                                      k_ref, v_ref, ks_ref, vs_ref,
                                      out_ref, *scr, scale: float,
                                      n_kv: int, G: int, D: int, B: int,
                                      chunk: int, n_chunks: int):
    """Whole-batch flash-decode over an int8 KV cache: the per-b loop of
    _decode_attn_batched_kernel with _decode_attn_quant_kernel's
    in-VMEM scale dequant — the cache streams as int8 (half the bytes)
    for EVERY batch size, not just the B≤2 fused path."""
    c = pl.program_id(0)
    HH = n_kv * G

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    base = c * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)

    for b in range(B):
        m_scr, d_scr, ctx_scr = scr[3 * b], scr[3 * b + 1], scr[3 * b + 2]
        pos = pos_ref[b, 0]
        qf = q_ref[b].reshape(HH, D)                      # [H, D] bf16
        q_wide = jnp.concatenate(
            [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)

        @pl.when(c == 0)
        def _(b=b, m_scr=m_scr, d_scr=d_scr, ctx_scr=ctx_scr, qf=qf):
            kn_sel = None
            vn_sel = None
            for h in range(n_kv):
                rm = rowmask(h, jnp.float32)
                kh = jnp.broadcast_to(
                    kn_ref[b, :, h * D:(h + 1) * D].astype(jnp.float32),
                    (HH, D)) * rm
                vh = jnp.broadcast_to(
                    vn_ref[b, :, h * D:(h + 1) * D].astype(jnp.float32),
                    (HH, D)) * rm
                kn_sel = kh if kn_sel is None else kn_sel + kh
                vn_sel = vh if vn_sel is None else vn_sel + vh
            s_new = jnp.sum(
                qf.astype(jnp.float32) * kn_sel,
                axis=1, keepdims=True) * scale
            m_scr[:] = s_new
            d_scr[:] = jnp.ones((HH, 1), jnp.float32)
            ctx_scr[:] = vn_sel

        kc = k_ref[b].astype(jnp.bfloat16)                # int8 → bf16
        vc = v_ref[b].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_wide.astype(jnp.bfloat16), kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [H, chunk]
        s = s * head_bcast(ks_ref[b])                     # dequant scores
        s = jnp.where(idx < pos, s, NEG_INF)

        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s - m_new)                            # [H, chunk]
        m_scr[:] = m_new
        d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        ev = (e * head_bcast(vs_ref[b])).astype(vc.dtype)
        r = jax.lax.dot_general(
            ev, vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [H, KV*D]
        ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

        @pl.when(c == n_chunks - 1)
        def _(b=b, d_scr=d_scr, ctx_scr=ctx_scr):
            out_ref[b] = (ctx_scr[:] / d_scr[:]).reshape(
                n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def decode_attention_quant_batched(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D] ROUND-TRIPPED through the cache dtype
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D] int8 (PRE-write)
    v_cache: jnp.ndarray,   # [B, S, KV, D] int8
    k_scale: jnp.ndarray,   # [B, S, KV] f32 per-vector scales
    v_scale: jnp.ndarray,   # [B, S, KV]
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
) -> jnp.ndarray:
    """:func:`decode_attention_quant` semantics with ALL batch rows per
    grid step — quantized-KV decode for batched pools (B>2), where the
    generic path dequantizes the whole cache slice in XLA first."""
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    qg = q.astype(jnp.bfloat16).reshape(B, KV, G, D)
    kn = k_new.astype(jnp.bfloat16).reshape(B, 1, KV * D)
    vn = v_new.astype(jnp.bfloat16).reshape(B, 1, KV * D)
    kcv = k_cache.reshape(B, S, KV * D)
    vcv = v_cache.reshape(B, S, KV * D)
    kst = jnp.swapaxes(k_scale.astype(jnp.float32), 1, 2)   # [B, KV, S]
    vst = jnp.swapaxes(v_scale.astype(jnp.float32), 1, 2)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    if chunk is None:
        # int8 cache blocks are half the bytes of bf16 — same row budget,
        # power-of-two for the same divisibility reason as the bf16 twin
        chunk = max(128, 1 << ((2048 // B).bit_length() - 1))
    chunk = min(chunk, S, DEFAULT_CHUNK)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    out = pl.pallas_call(
        functools.partial(_decode_attn_quant_batched_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          B=B, chunk=chunk, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, KV, G, D), lambda c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, KV * D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, KV * D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, chunk), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, chunk), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, KV, G, D), lambda c: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            s for _ in range(B)
            for s in (pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv, kst, vst)
    return out.reshape(B, H, D)


def _decode_attn_qkv_batched_kernel(pos_ref, qkv_ref, sin_ref, cos_ref,
                                    k_ref, v_ref, out_ref, kr_ref, vr_ref,
                                    *scr, scale: float, n_kv: int, G: int,
                                    D: int, B: int, chunk: int,
                                    n_chunks: int):
    """Rope-fused flash-decode with the WHOLE batch per grid step: the
    per-b preamble (split-layout RoPE on the raw q|k|v row + accumulator
    init from the new token) runs unrolled at c==0, and every chunk step
    advances all B online-softmax states.  Extends the B≤2 rope-fused
    path's full fusion win (no q/k/v slicing, no XLA rope pair, no
    post-write cache copy) to batched pools."""
    c = pl.program_id(0)
    HH = n_kv * G
    half = D // 2

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    base = c * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)

    for b in range(B):
        m_scr, d_scr, ctx_scr, q_scr = (
            scr[4 * b], scr[4 * b + 1], scr[4 * b + 2], scr[4 * b + 3])
        pos = pos_ref[b, 0]

        @pl.when(c == 0)
        def _(b=b, m_scr=m_scr, d_scr=d_scr, ctx_scr=ctx_scr, q_scr=q_scr):
            rows = qkv_ref[b].astype(jnp.float32)
            cs = jnp.concatenate(
                [cos_ref[b:b + 1], cos_ref[b:b + 1]], axis=1)   # [1, D]
            sn = jnp.concatenate(
                [sin_ref[b:b + 1], sin_ref[b:b + 1]], axis=1)
            qk = rows[0:HH + n_kv]
            rot = jnp.concatenate([-qk[:, half:], qk[:, :half]], axis=1)
            qk = qk * cs + rot * sn                       # split-layout RoPE
            qf = qk[0:HH]                                 # [H, D] roped q
            k_row = qk[HH:HH + n_kv]                      # [KV, D] roped k
            v_row = rows[HH + n_kv:]
            q_scr[:] = qf
            kr_ref[b] = k_row.astype(kr_ref.dtype)
            vr_ref[b] = v_row.astype(vr_ref.dtype)
            kn_sel = None
            vn_sel = None
            for h in range(n_kv):
                rm = rowmask(h, jnp.float32)
                kh = jnp.broadcast_to(k_row[h:h + 1, :], (HH, D)) * rm
                vh = jnp.broadcast_to(v_row[h:h + 1, :], (HH, D)) * rm
                kn_sel = kh if kn_sel is None else kn_sel + kh
                vn_sel = vh if vn_sel is None else vn_sel + vh
            s_new = jnp.sum(qf * kn_sel, axis=1, keepdims=True) * scale
            m_scr[:] = s_new
            d_scr[:] = jnp.ones((HH, 1), jnp.float32)
            ctx_scr[:] = vn_sel

        kc = k_ref[b]                                     # [chunk, KV*D]
        vc = v_ref[b]
        qf = q_scr[:].astype(kc.dtype)
        q_wide = jnp.concatenate(
            [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)
        s = jax.lax.dot_general(
            q_wide, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [H, chunk]
        s = jnp.where(idx < pos, s, NEG_INF)

        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s - m_new)                            # [H, chunk]
        m_scr[:] = m_new
        d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        r = jax.lax.dot_general(
            e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [H, KV*D]
        ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

        @pl.when(c == n_chunks - 1)
        def _(b=b, d_scr=d_scr, ctx_scr=ctx_scr):
            out_ref[b] = (ctx_scr[:] / d_scr[:]).reshape(
                n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk"))
def decode_attention_qkv_batched(
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2] rope row at the query position
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [B, S, KV, D] (PRE-write)
    v_cache: jnp.ndarray,   # [B, S, KV, D]
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`decode_attention_qkv` semantics (rope in-kernel, returns
    the roped k/v rows for the post-scan scatter) with ALL batch rows per
    grid step — the rope-fused path for batched pools."""
    B = qkv.shape[0]
    S, KV, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
    H = n_heads
    G = H // KV
    dt = k_cache.dtype
    qkv = qkv.reshape(B, H + 2 * KV, D)
    kcv = k_cache.reshape(B, S, KV * D)
    vcv = v_cache.reshape(B, S, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    if chunk is None:
        chunk = max(128, 1 << ((2048 // B).bit_length() - 1))
    chunk = min(chunk, S, DEFAULT_CHUNK)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    out, kr, vr = pl.pallas_call(
        functools.partial(_decode_attn_qkv_batched_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          B=B, chunk=chunk, n_chunks=n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, D), dt),
        ),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, H + 2 * KV, D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, KV, G, D), lambda c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            s for _ in range(B)
            for s in (pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, D), jnp.float32),
                      pltpu.VMEM((KV * G, D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qkv, sin_row, cos_row, kcv, vcv)
    return out.reshape(B, H, D), kr, vr


def _decode_attn_qkv_quant_batched_kernel(
        pos_ref, qkv_ref, sin_ref, cos_ref, k_ref, v_ref, ks_ref, vs_ref,
        out_ref, kq_ref, vq_ref, kso_ref, vso_ref, *scr, scale: float,
        n_kv: int, G: int, D: int, B: int, chunk: int, n_chunks: int,
        qmax: float, is_int: bool):
    """Whole-batch rope-fused flash-decode over a quantized KV cache —
    the batched twin of _decode_attn_qkv_quant_kernel: per-b RoPE + row
    quantization at c==0, int8/fp8 cache stream with in-VMEM scale
    dequant every chunk, one program per chunk for the whole pool."""
    c = pl.program_id(0)
    HH = n_kv * G
    half = D // 2

    rowmask, head_bcast, select_rows = _gqa_helpers(n_kv, G, D, chunk)

    base = c * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)

    for b in range(B):
        m_scr, d_scr, ctx_scr, q_scr = (
            scr[4 * b], scr[4 * b + 1], scr[4 * b + 2], scr[4 * b + 3])
        pos = pos_ref[b, 0]

        @pl.when(c == 0)
        def _(b=b, m_scr=m_scr, d_scr=d_scr, ctx_scr=ctx_scr, q_scr=q_scr):
            rows = qkv_ref[b].astype(jnp.float32)
            cs = jnp.concatenate(
                [cos_ref[b:b + 1], cos_ref[b:b + 1]], axis=1)
            sn = jnp.concatenate(
                [sin_ref[b:b + 1], sin_ref[b:b + 1]], axis=1)
            qk = rows[0:HH + n_kv]
            rot = jnp.concatenate([-qk[:, half:], qk[:, :half]], axis=1)
            qk = qk * cs + rot * sn
            qf = qk[0:HH]
            k_row = qk[HH:HH + n_kv]
            v_row = rows[HH + n_kv:]
            q_scr[:] = qf

            def quantize(row):
                am = jnp.max(jnp.abs(row), axis=1, keepdims=True)
                s = jnp.maximum(am, 1e-8) / qmax
                qv = row / s
                if is_int:
                    qv = jnp.clip(jnp.round(qv), -qmax, qmax)
                return qv, s

            kq, k_s = quantize(k_row)
            vq, v_s = quantize(v_row)
            kq8 = kq.astype(kq_ref.dtype)
            vq8 = vq.astype(vq_ref.dtype)
            kq_ref[b] = kq8
            vq_ref[b] = vq8
            kso_ref[b] = k_s
            vso_ref[b] = v_s
            k_rt = kq8.astype(jnp.float32) * k_s
            v_rt = vq8.astype(jnp.float32) * v_s
            kn_sel = None
            vn_sel = None
            for h in range(n_kv):
                rm = rowmask(h, jnp.float32)
                kh = jnp.broadcast_to(k_rt[h:h + 1, :], (HH, D)) * rm
                vh = jnp.broadcast_to(v_rt[h:h + 1, :], (HH, D)) * rm
                kn_sel = kh if kn_sel is None else kn_sel + kh
                vn_sel = vh if vn_sel is None else vn_sel + vh
            s_new = jnp.sum(qf * kn_sel, axis=1, keepdims=True) * scale
            m_scr[:] = s_new
            d_scr[:] = jnp.ones((HH, 1), jnp.float32)
            ctx_scr[:] = vn_sel

        kc = k_ref[b].astype(jnp.bfloat16)
        vc = v_ref[b].astype(jnp.bfloat16)
        qf = q_scr[:].astype(jnp.bfloat16)
        q_wide = jnp.concatenate(
            [qf * rowmask(h, qf.dtype) for h in range(n_kv)], axis=1)
        s = jax.lax.dot_general(
            q_wide, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s * head_bcast(ks_ref[b])
        s = jnp.where(idx < pos, s, NEG_INF)

        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s - m_new)
        m_scr[:] = m_new
        d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        ev = (e * head_bcast(vs_ref[b])).astype(vc.dtype)
        r = jax.lax.dot_general(
            ev, vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctx_scr[:] = ctx_scr[:] * alpha + select_rows(r)

        @pl.when(c == n_chunks - 1)
        def _(b=b, d_scr=d_scr, ctx_scr=ctx_scr):
            out_ref[b] = (ctx_scr[:] / d_scr[:]).reshape(
                n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk"))
def decode_attention_qkv_quant_batched(
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2]
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [B, S, KV, D] int8/fp8 (PRE-write)
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,   # [B, S, KV] f32
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`decode_attention_qkv_quant` semantics with ALL batch rows
    per grid step — rope fusion + in-VMEM row quantization + quantized
    cache stream for batched pools."""
    B = qkv.shape[0]
    S, KV, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
    H = n_heads
    G = H // KV
    dt = k_cache.dtype
    qkv = qkv.reshape(B, H + 2 * KV, D)
    kcv = k_cache.reshape(B, S, KV * D)
    vcv = v_cache.reshape(B, S, KV * D)
    kst = jnp.swapaxes(k_scale.astype(jnp.float32), 1, 2)
    vst = jnp.swapaxes(v_scale.astype(jnp.float32), 1, 2)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    if chunk is None:
        chunk = max(128, 1 << ((2048 // B).bit_length() - 1))
    chunk = min(chunk, S, DEFAULT_CHUNK)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    is_int = dt == jnp.int8
    out, kq, vq, ks_o, vs_o = pl.pallas_call(
        functools.partial(_decode_attn_qkv_quant_batched_kernel,
                          scale=float(D) ** -0.5, n_kv=KV, G=G, D=D,
                          B=B, chunk=chunk, n_chunks=n_chunks,
                          qmax=127.0 if is_int else 448.0, is_int=is_int),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, 1), jnp.float32),
        ),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, H + 2 * KV, D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, half), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, chunk, KV * D), lambda c: (0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, chunk), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, chunk), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, KV, G, D), lambda c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, D), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, 1), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, 1), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            s for _ in range(B)
            for s in (pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, D), jnp.float32),
                      pltpu.VMEM((KV * G, D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qkv, sin_row, cos_row, kcv, vcv, kst, vst)
    return (out.reshape(B, H, D), kq, vq,
            ks_o.reshape(B, KV), vs_o.reshape(B, KV))
