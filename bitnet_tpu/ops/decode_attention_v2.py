"""Batched flash-decode v2 — whole-batch kernels with O(1)-ish per-b VPU
work per chunk.

Round-3 measured the v1 whole-batch kernels LOSING to XLA einsum at B=8
(4.8-5.9 vs 2.99 ms/step) despite reading the PRE-write cache (no copy)
and, for int8, half the bytes.  The loss is instruction count, not
bandwidth: v1 rebuilt the block-diagonal q_wide EVERY chunk per b
(~11 vector ops on [H, KV*D]), ran the GQA lane-select per chunk per b
(~9 ops), and expanded the int8 scale planes with a 5-way
broadcast-mask-add per chunk per b (~14 ops) — ≈35 VPU ops × B × chunks
× layers of [20, ·] tiles that Mosaic issues serially.

v2 restructures the body so the per-chunk per-b work is:
  1 MXU dot (scores) + mask/select + online-softmax (6 ops)
  + 1 MXU dot (PV) + 1 wide accumulator update
and everything else happens ONCE per layer (not per chunk):
  - the block-diagonal q_wide lives in VMEM scratch, built at c==0;
  - the context accumulates WIDE ([H, KV*D] — garbage in the
    wrong-head lane blocks is discarded by ONE final select);
  - the new-token fold uses lane-broadcasts of the flat k/v rows
    against q_wide (2 ops) instead of per-head select loops;
  - int8/fp8 scale planes ride transposed ([KV, S] — tiny VMEM blocks)
    and expand to per-row [H, chunk] planes with ONE MXU dot each,
    replacing the v1 5-way broadcast-mask-add loop (post-dot f32
    dequant, v1-exact numerics).

Reference behavior being replaced: the reference's batched serving path
is request-level batching over a CPU/CUDA attention kernel
(crates/bitnet-server/src/batch_engine.rs:17-164,
crates/bitnet-kernels/src/cpu/attention.rs) — this is the TPU-native
equivalent: one fused kernel per layer for the whole decode pool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_CHUNK = 1024


def _expand_rows(s_t: jnp.ndarray, G: int) -> jnp.ndarray:
    """[KV, chunk] per-(head, slot) scales → [H, chunk] per-row scales
    (row i ← head i // G) as ONE MXU dot with a 0/1 row map.

    The transposed [KV, S] storage keeps the VMEM blocks tiny (a
    [chunk, KV] block would pad KV=5 → 128 lanes, 25x the bytes — it
    OOM'd scoped vmem at B=8 chunk=512); the dot replaces the v1
    per-head broadcast-mask-add loop (~14 VPU ops per chunk per b)."""
    KV = s_t.shape[0]
    HH = KV * G
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HH, KV), 0) // G
    col = jax.lax.broadcasted_iota(jnp.int32, (HH, KV), 1)
    rowmap = (row_head == col).astype(jnp.float32)
    return jax.lax.dot_general(
        rowmap, s_t.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _build_q_wide(qf: jnp.ndarray, n_kv: int, G: int, D: int) -> jnp.ndarray:
    """[H, D] → block-diagonal [H, KV*D]: row i keeps its own head's
    lane block (head i // G), zero elsewhere.  Runs once per layer."""
    HH = n_kv * G
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HH, 1), 0) // G
    return jnp.concatenate(
        [qf * (row_head == h).astype(qf.dtype) for h in range(n_kv)],
        axis=1)


def _select_own_lanes(wide: jnp.ndarray, n_kv: int, G: int,
                      D: int) -> jnp.ndarray:
    """[H, KV*D] → [H, D]: row i keeps lane block i // G.  Once per layer."""
    HH = n_kv * G
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HH, 1), 0) // G
    acc = None
    for h in range(n_kv):
        seg = wide[:, h * D:(h + 1) * D] * (row_head == h).astype(wide.dtype)
        acc = seg if acc is None else acc + seg
    return acc


def _v2_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, out_ref,
               *scr, scale: float, n_kv: int, G: int, D: int, B: int,
               chunk: int, n_chunks: int, quant: bool,
               chunk_axis: int = 0):
    """Whole-batch flash-decode body; ``quant`` adds the in-VMEM scale
    fold (k_ref/v_ref int8 + trailing ks/vs operands).  ``chunk_axis``
    names the grid axis that sweeps the S chunks — the batch-grouped
    wrappers put a batch-group axis in front of it (chunks iterate
    innermost, so the per-group online-softmax scratch re-initializes at
    c == 0 of each group)."""
    if quant:
        ks_ref, vs_ref = scr[0], scr[1]
        scr = scr[2:]
    c = pl.program_id(chunk_axis)
    HH = n_kv * G
    KVD = n_kv * D

    idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)
    if quant:
        # load the tiny scale blocks ONCE as values and index per b —
        # ref-slicing a stacked [1, B, KV, chunk] block trips Mosaic's
        # sublane-alignment check (KV = 5)
        ks_all = ks_ref[...]
        vs_all = vs_ref[...]
        if ks_all.ndim == 4:
            ks_all = ks_all[0]
            vs_all = vs_all[0]

    for b in range(B):
        qw_scr, m_scr, d_scr, ctxw_scr = (
            scr[4 * b], scr[4 * b + 1], scr[4 * b + 2], scr[4 * b + 3])
        pos = pos_ref[b, 0]

        @pl.when(c == 0)
        def _(b=b, qw_scr=qw_scr, m_scr=m_scr, d_scr=d_scr,
              ctxw_scr=ctxw_scr):
            qf = q_ref[b].reshape(HH, D).astype(jnp.float32)
            qw = _build_q_wide(qf, n_kv, G, D)
            qw_scr[:] = qw.astype(qw_scr.dtype)
            # new-token fold via the flat rows: q_wide already isolates
            # each row's own head lanes, so a lane-broadcast + row-sum
            # IS the per-head dot (no select loops)
            kn_b = jnp.broadcast_to(kn_ref[b].astype(jnp.float32),
                                    (HH, KVD))
            vn_b = jnp.broadcast_to(vn_ref[b].astype(jnp.float32),
                                    (HH, KVD))
            m_scr[:] = jnp.sum(qw * kn_b, axis=1, keepdims=True) * scale
            d_scr[:] = jnp.ones((HH, 1), jnp.float32)
            ctxw_scr[:] = vn_b

        # chunks entirely past this slot's valid length contribute
        # nothing (e == 0 exactly) — skip their compute; mixed-length
        # serving pools skip most work for short slots
        @pl.when(c * chunk < pos)
        def _(b=b, qw_scr=qw_scr, m_scr=m_scr, d_scr=d_scr,
              ctxw_scr=ctxw_scr, pos=pos):
            if quant:
                kc = k_ref[b].astype(jnp.bfloat16)
                vc = v_ref[b].astype(jnp.bfloat16)
            else:
                kc = k_ref[b]
                vc = v_ref[b]
            qw = qw_scr[:].astype(kc.dtype)
            s = jax.lax.dot_general(
                qw, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [H, chunk]
            if quant:
                # post-dot f32 dequant (v1-exact numerics): the tiny
                # transposed [KV, chunk] scale blocks expand to [H,
                # chunk] per-row planes with ONE MXU dot each
                s = s * _expand_rows(ks_all[b], G)
            s = jnp.where(idx < pos, s, NEG_INF)

            m_old = m_scr[:]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            e = jnp.exp(s - m_new)
            m_scr[:] = m_new
            d_scr[:] = (d_scr[:] * alpha
                        + jnp.sum(e, axis=-1, keepdims=True))
            if quant:
                e = e * _expand_rows(vs_all[b], G)
            r = jax.lax.dot_general(
                e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [H, KV*D]
            # WIDE accumulate: wrong-head lane blocks carry garbage that
            # the single final select discards — no per-chunk GQA select
            ctxw_scr[:] = ctxw_scr[:] * alpha + r

        @pl.when(c == n_chunks - 1)
        def _(b=b, d_scr=d_scr, ctxw_scr=ctxw_scr):
            ctx = _select_own_lanes(ctxw_scr[:], n_kv, G, D)
            out_ref[b] = (ctx / d_scr[:]).reshape(
                n_kv, G, D).astype(out_ref.dtype)


def _v2p_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, out_ref,
                qw_scr, m_scr, d_scr, ctxw_scr, *quant_refs,
                scale: float, n_kv: int, G: int, D: int,
                chunk: int, n_chunks: int, quant: bool):
    """v2 body on a PER-B grid (B, n_chunks): same low instruction count,
    but 8x the grid steps with 1/8th-size blocks — Mosaic's revolving
    buffers overlap the cache stream with compute much deeper (the
    whole-batch grid has only n_chunks steps to pipeline across).
    Scratch is ONE set reused across b (b-major iteration order)."""
    if quant:
        ks_ref, vs_ref = quant_refs
    b = pl.program_id(0)
    c = pl.program_id(1)
    HH = n_kv * G
    KVD = n_kv * D
    pos = pos_ref[b, 0]

    idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)

    @pl.when(c == 0)
    def _():
        qf = q_ref[0].reshape(HH, D).astype(jnp.float32)
        qw_scr[:] = _build_q_wide(qf, n_kv, G, D)
        kn_b = jnp.broadcast_to(kn_ref[0].astype(jnp.float32), (HH, KVD))
        vn_b = jnp.broadcast_to(vn_ref[0].astype(jnp.float32), (HH, KVD))
        m_scr[:] = jnp.sum(qw_scr[:] * kn_b, axis=1, keepdims=True) * scale
        d_scr[:] = jnp.ones((HH, 1), jnp.float32)
        ctxw_scr[:] = vn_b

    @pl.when(c * chunk < pos)
    def _():
        if quant:
            kc = k_ref[0].astype(jnp.bfloat16)
            vc = v_ref[0].astype(jnp.bfloat16)
        else:
            kc = k_ref[0]
            vc = v_ref[0]
        qw = qw_scr[:].astype(kc.dtype)
        s = jax.lax.dot_general(
            qw, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [H, chunk]
        if quant:
            s = s * _expand_rows(ks_ref[0], G)
        s = jnp.where(idx < pos, s, NEG_INF)

        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s - m_new)
        m_scr[:] = m_new
        d_scr[:] = d_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        if quant:
            e = e * _expand_rows(vs_ref[0], G)
        r = jax.lax.dot_general(
            e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctxw_scr[:] = ctxw_scr[:] * alpha + r

    @pl.when(c == n_chunks - 1)
    def _():
        ctx = _select_own_lanes(ctxw_scr[:], n_kv, G, D)
        out_ref[0] = (ctx / d_scr[:]).reshape(
            n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def decode_attention_perb_v2(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D] (PRE-write)
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
) -> jnp.ndarray:
    """v2 body on the per-b grid — dense bf16 cache."""
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
        chunk = min(512, S)
    chunk = min(chunk, S)
    while S % chunk:
        chunk //= 2
    n_chunks = S // chunk

    out = pl.pallas_call(
        functools.partial(_v2p_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, chunk=chunk,
                          n_chunks=n_chunks, quant=False),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid=(B, n_chunks),
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
            pltpu.VMEM((KV * G, KV * D), jnp.float32),   # q_wide
            pltpu.VMEM((KV * G, 1), jnp.float32),        # m
            pltpu.VMEM((KV * G, 1), jnp.float32),        # d
            pltpu.VMEM((KV * G, KV * D), jnp.float32),   # ctx wide
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)


def _v2_qkv_kernel(pos_ref, qkv_ref, sin_ref, cos_ref, k_ref, v_ref,
                   *rest, scale: float,
                   n_kv: int, G: int, D: int, B: int, chunk: int,
                   n_chunks: int, quant: bool, qmax: float, is_int: bool):
    """Rope-fused whole-batch flash-decode with the v2 body: RoPE + (for
    quantized caches) in-VMEM row quantization at c==0, then the
    low-instruction-count chunk loop.  Emits attention + the (quantized)
    k/v rows (+ scales) for the post-scan cache scatter.

    Ref order is pallas_call's: remaining INPUTS (quant: ks, vs), then
    outputs (out, kq, vq [, kso, vso]), then scratch."""
    if quant:
        (ks_ref, vs_ref, out_ref, kq_ref, vq_ref, kso_ref,
         vso_ref) = rest[:7]
        scr = rest[7:]
    else:
        out_ref, kq_ref, vq_ref = rest[:3]
        scr = rest[3:]
    c = pl.program_id(0)
    HH = n_kv * G
    KVD = n_kv * D
    half = D // 2

    idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (HH, chunk), 1)
    if quant:
        # value-load the tiny scale blocks once (ref-slicing a stacked
        # [1, B, KV, chunk] block trips Mosaic sublane alignment, KV=5)
        ks_all = ks_ref[...]
        vs_all = vs_ref[...]
        if ks_all.ndim == 4:
            ks_all = ks_all[0]
            vs_all = vs_all[0]

    for b in range(B):
        qw_scr, m_scr, d_scr, ctxw_scr = (
            scr[4 * b], scr[4 * b + 1], scr[4 * b + 2], scr[4 * b + 3])
        pos = pos_ref[b, 0]

        @pl.when(c == 0)
        def _(b=b, qw_scr=qw_scr, m_scr=m_scr, d_scr=d_scr,
              ctxw_scr=ctxw_scr):
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
            qw_scr[:] = _build_q_wide(qf, n_kv, G, D).astype(qw_scr.dtype)

            if quant:
                # per-vector absmax quantization (== _quantize_kv); the
                # accumulators init from the ROUND-TRIPPED rows so the
                # numerics match reading the written row back quantized
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
                k_row = kq8.astype(jnp.float32) * k_s
                v_row = vq8.astype(jnp.float32) * v_s
            else:
                kq_ref[b] = k_row.astype(kq_ref.dtype)
                vq_ref[b] = v_row.astype(vq_ref.dtype)
            # wide-layout new-token fold: q_wide zeroes the wrong-head
            # lane blocks, so one lane-concat + row-sum IS the per-head
            # dot; ctx's wrong-lane garbage dies in the final select
            kn_wide = jnp.concatenate(
                [jnp.broadcast_to(k_row[h:h + 1, :], (HH, D))
                 for h in range(n_kv)], axis=1)
            vn_wide = jnp.concatenate(
                [jnp.broadcast_to(v_row[h:h + 1, :], (HH, D))
                 for h in range(n_kv)], axis=1)
            m_scr[:] = jnp.sum(
                qw_scr[:].astype(jnp.float32) * kn_wide,
                axis=1, keepdims=True) * scale
            d_scr[:] = jnp.ones((HH, 1), jnp.float32)
            ctxw_scr[:] = vn_wide

        @pl.when(c * chunk < pos)
        def _(b=b, qw_scr=qw_scr, m_scr=m_scr, d_scr=d_scr,
              ctxw_scr=ctxw_scr, pos=pos):
            if quant:
                kc = k_ref[b].astype(jnp.bfloat16)
                vc = v_ref[b].astype(jnp.bfloat16)
            else:
                kc = k_ref[b]
                vc = v_ref[b]
            qw = qw_scr[:].astype(kc.dtype)
            s = jax.lax.dot_general(
                qw, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [H, chunk]
            if quant:
                s = s * _expand_rows(ks_all[b], G)
            s = jnp.where(idx < pos, s, NEG_INF)

            m_old = m_scr[:]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            e = jnp.exp(s - m_new)
            m_scr[:] = m_new
            d_scr[:] = (d_scr[:] * alpha
                        + jnp.sum(e, axis=-1, keepdims=True))
            if quant:
                e = e * _expand_rows(vs_all[b], G)
            r = jax.lax.dot_general(
                e.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ctxw_scr[:] = ctxw_scr[:] * alpha + r

        @pl.when(c == n_chunks - 1)
        def _(b=b, d_scr=d_scr, ctxw_scr=ctxw_scr):
            ctx = _select_own_lanes(ctxw_scr[:], n_kv, G, D)
            out_ref[b] = (ctx / d_scr[:]).reshape(
                n_kv, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk",
                                    "n_kv"))
def decode_attention_qkv_batched_v2(
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
    """Rope-fused whole-batch flash-decode (v2 body), dense bf16 cache.
    Returns (attn [B, n_heads, D], k_roped [B, KV, D], v_row [B, KV, D])
    in cache dtype for the caller's post-scan scatter."""
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

    chunk = _pick_chunk(chunk, S, B, dt.itemsize)
    n_chunks = S // chunk

    out, kr, vr = pl.pallas_call(
        functools.partial(_v2_qkv_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=B, chunk=chunk,
                          n_chunks=n_chunks, quant=False, qmax=0.0,
                          is_int=False),
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
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qkv, sin_row, cos_row, kcv, vcv)
    return out.reshape(B, H, D), kr, vr


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk",
                                    "n_kv"))
def decode_attention_qkv_quant_batched_v2(
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2]
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [B, S, KV, D] int8/fp8 or flat [B, S, KV*D]
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,   # [B, S, KV] f32 per-vector scales
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rope-fused whole-batch flash-decode over a quantized cache (v2
    body): rope, row quantization, scale lane-expand and dequant fold all
    in VMEM; the cache streams at 1 byte/elem.  Returns (attn, k_q, v_q,
    k_s [B, KV], v_s [B, KV])."""
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
    ks = jnp.swapaxes(k_scale.astype(jnp.float32), 1, 2)   # [B, KV, S]
    vs = jnp.swapaxes(v_scale.astype(jnp.float32), 1, 2)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    chunk = _pick_chunk(chunk, S, B, 1)
    n_chunks = S // chunk
    is_int = dt == jnp.int8

    out, kq, vq, ks_o, vs_o = pl.pallas_call(
        functools.partial(_v2_qkv_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=B, chunk=chunk,
                          n_chunks=n_chunks, quant=True,
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
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qkv, sin_row, cos_row, kcv, vcv, ks, vs)
    return (out.reshape(B, H, D), kq, vq,
            ks_o.reshape(B, KV), vs_o.reshape(B, KV))


def _v2_stacked_kernel(l_ref, pos_ref, q_ref, kn_ref, vn_ref, k_ref,
                       v_ref, *rest, scale, n_kv, G, D, B, chunk,
                       n_chunks, quant, chunk_axis=0):
    """_v2_kernel with a scalar-prefetch layer index: the cache operands
    are the FULL [L, B, S, KV*D] stacks block-indexed by ``l_ref`` —
    under the decode scan a per-layer xs slice feeding a pallas operand
    is a materialized (and, with competing layout preferences, RELAYOUT)
    HBM copy: the round-4 B=8 HLO showed XLA assigning the in-loop cache
    an S-minor layout and copying 2x10.5 MB per LAYER to feed the
    row-major kernel operand (copy.101/102).  Block-indexing the full
    stack pins the layout at the custom-call and leaves nothing to copy
    (same story as ternary_matmul_stacked for the weights)."""
    if quant:
        ks_ref, vs_ref = rest[0], rest[1]
        out_ref = rest[2]
        scr = rest[3:]
        _v2_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref.at[0], v_ref.at[0],
                   out_ref, ks_ref, vs_ref, *scr, scale=scale,
                   n_kv=n_kv, G=G, D=D, B=B, chunk=chunk,
                   n_chunks=n_chunks, quant=True, chunk_axis=chunk_axis)
    else:
        out_ref = rest[0]
        scr = rest[1:]
        _v2_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref.at[0], v_ref.at[0],
                   out_ref, *scr, scale=scale, n_kv=n_kv, G=G, D=D, B=B,
                   chunk=chunk, n_chunks=n_chunks, quant=False,
                   chunk_axis=chunk_axis)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk", "n_kv"))
def decode_attention_batched_v2_stacked(
    l: jnp.ndarray,         # [] / [1] int32 layer index (traced)
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [L, B, S, KV, D] or flat [L, B, S, KV*D]
    v_cache: jnp.ndarray,   # FULL stack (PRE-write)
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> jnp.ndarray:
    """Whole-batch v2 flash-decode over one layer of the FULL stacked
    dense cache, selected via scalar prefetch (no per-layer xs slice)."""
    B, H, D = q.shape
    L = k_cache.shape[0]
    if k_cache.ndim == 5:
        S, KV = k_cache.shape[2], k_cache.shape[3]
        kcv = k_cache.reshape(L, B, S, KV * D)
        vcv = v_cache.reshape(L, B, S, KV * D)
    else:
        S, KV = k_cache.shape[2], n_kv
        kcv, vcv = k_cache, v_cache
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    BG, n_groups = _pick_group(B)
    chunk = _pick_chunk(chunk, S, BG, dt.itemsize)
    n_chunks = S // chunk

    # batch-group major, chunks innermost (see _pick_group): B=32 pools
    # blew the 16 MB VMEM scope with whole-batch per-slot scratch
    cache_spec = pl.BlockSpec((1, BG, chunk, KV * D),
                              lambda g, c, lr: (lr[0], g, c, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((BG, 1), lambda g, c, lr: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BG, KV, G, D), lambda g, c, lr: (g, 0, 0, 0)),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c, lr: (g, 0, 0)),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c, lr: (g, 0, 0)),
            cache_spec,
            cache_spec,
        ],
        out_specs=pl.BlockSpec((BG, KV, G, D),
                               lambda g, c, lr: (g, 0, 0, 0)),
        scratch_shapes=[
            s for _ in range(BG)
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
    )
    out = pl.pallas_call(
        functools.partial(_v2_stacked_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=BG, chunk=chunk,
                          n_chunks=n_chunks, quant=False, chunk_axis=1),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk", "n_kv"))
def decode_attention_quant_batched_v2_stacked(
    l: jnp.ndarray,         # [] / [1] int32 layer index (traced)
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D] ROUND-TRIPPED rows
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [L, B, S, KV, D] int8/fp8 or flat
    v_cache: jnp.ndarray,   # FULL stack (PRE-write)
    k_scale_t: jnp.ndarray,  # [L, B, KV, S] f32 TRANSPOSED scale stacks
    v_scale_t: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> jnp.ndarray:
    """Quantized-cache twin of the stacked whole-batch v2 kernel.  The
    scale stacks arrive pre-transposed [L, B, KV, S] so the per-layer
    blocks are the tiny [KV, chunk] planes the kernel expands on-MXU."""
    B, H, D = q.shape
    L = k_cache.shape[0]
    if k_cache.ndim == 5:
        S, KV = k_cache.shape[2], k_cache.shape[3]
        kcv = k_cache.reshape(L, B, S, KV * D)
        vcv = v_cache.reshape(L, B, S, KV * D)
    else:
        S, KV = k_cache.shape[2], n_kv
        kcv, vcv = k_cache, v_cache
    G = H // KV
    act = jnp.bfloat16
    qg = q.astype(act).reshape(B, KV, G, D)
    kn = k_new.astype(act).reshape(B, 1, KV * D)
    vn = v_new.astype(act).reshape(B, 1, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    BG, n_groups = _pick_group(B)
    chunk = _pick_chunk(chunk, S, BG, 1)
    n_chunks = S // chunk

    # batch-group major, chunks innermost — see the dense stacked wrapper
    cache_spec = pl.BlockSpec((1, BG, chunk, KV * D),
                              lambda g, c, lr: (lr[0], g, c, 0))
    scale_spec = pl.BlockSpec((1, BG, KV, chunk),
                              lambda g, c, lr: (lr[0], g, 0, c))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((BG, 1), lambda g, c, lr: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BG, KV, G, D), lambda g, c, lr: (g, 0, 0, 0)),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c, lr: (g, 0, 0)),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c, lr: (g, 0, 0)),
            cache_spec,
            cache_spec,
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((BG, KV, G, D),
                               lambda g, c, lr: (g, 0, 0, 0)),
        scratch_shapes=[
            s for _ in range(BG)
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
    )
    out = pl.pallas_call(
        functools.partial(_v2_stacked_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=BG, chunk=chunk,
                          n_chunks=n_chunks, quant=True, chunk_axis=1),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos2, qg, kn, vn,
      kcv, vcv, k_scale_t, v_scale_t)
    return out.reshape(B, H, D)


def _v2_qkv_stacked_kernel(l_ref, pos_ref, qkv_ref, sin_ref, cos_ref,
                           k_ref, v_ref, *rest, scale, n_kv, G, D, B,
                           chunk, n_chunks, quant, qmax, is_int):
    """_v2_qkv_kernel with a scalar-prefetch layer index over the FULL
    cache stacks (see _v2_stacked_kernel for why)."""
    if quant:
        ks_ref, vs_ref = rest[0], rest[1]
        rest2 = (ks_ref, vs_ref) + tuple(rest[2:])
    else:
        rest2 = tuple(rest)
    _v2_qkv_kernel(pos_ref, qkv_ref, sin_ref, cos_ref,
                   k_ref.at[0], v_ref.at[0], *rest2, scale=scale,
                   n_kv=n_kv, G=G, D=D, B=B, chunk=chunk,
                   n_chunks=n_chunks, quant=quant, qmax=qmax,
                   is_int=is_int)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk",
                                    "n_kv"))
def decode_attention_qkv_v2_stacked(
    l: jnp.ndarray,         # [] / [1] int32 layer index (traced)
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2]
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [L, B, S, KV, D] or flat [L, B, S, KV*D]
    v_cache: jnp.ndarray,   # FULL stack (PRE-write)
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rope-fused v2 flash-decode over one layer of the FULL stacked
    dense cache (any B; the B=1/2 default path).  Returns (attn,
    k_roped [B, KV, D], v_row [B, KV, D]) in cache dtype."""
    B = qkv.shape[0]
    L = k_cache.shape[0]
    if k_cache.ndim == 5:
        S, KV, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
        kcv = k_cache.reshape(L, B, S, KV * D)
        vcv = v_cache.reshape(L, B, S, KV * D)
    else:
        S, KV = k_cache.shape[2], n_kv
        D = k_cache.shape[3] // KV
        kcv, vcv = k_cache, v_cache
    H = n_heads
    G = H // KV
    dt = k_cache.dtype
    qkv = qkv.reshape(B, H + 2 * KV, D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    chunk = _pick_chunk(chunk, S, B, dt.itemsize)
    n_chunks = S // chunk

    cache_spec = pl.BlockSpec((1, B, chunk, KV * D),
                              lambda c, lr: (lr[0], 0, c, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda c, lr: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, H + 2 * KV, D), lambda c, lr: (0, 0, 0)),
            pl.BlockSpec((B, half), lambda c, lr: (0, 0)),
            pl.BlockSpec((B, half), lambda c, lr: (0, 0)),
            cache_spec,
            cache_spec,
        ],
        out_specs=(
            pl.BlockSpec((B, KV, G, D), lambda c, lr: (0, 0, 0, 0)),
            pl.BlockSpec((B, KV, D), lambda c, lr: (0, 0, 0)),
            pl.BlockSpec((B, KV, D), lambda c, lr: (0, 0, 0)),
        ),
        scratch_shapes=[
            s for _ in range(B)
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
    )
    out, kr, vr = pl.pallas_call(
        functools.partial(_v2_qkv_stacked_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=B, chunk=chunk,
                          n_chunks=n_chunks, quant=False, qmax=0.0,
                          is_int=False),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, D), dt),
        ),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos2, qkv, sin_row, cos_row,
      kcv, vcv)
    return out.reshape(B, H, D), kr, vr


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "chunk",
                                    "n_kv"))
def decode_attention_qkv_quant_v2_stacked(
    l: jnp.ndarray,         # [] / [1] int32 layer index (traced)
    qkv: jnp.ndarray,       # [B, H+2*KV, D] RAW fused projection (no rope)
    sin_row: jnp.ndarray,   # [B, D//2]
    cos_row: jnp.ndarray,   # [B, D//2]
    k_cache: jnp.ndarray,   # [L, B, S, KV, D] int8/fp8 or flat
    v_cache: jnp.ndarray,   # FULL stack (PRE-write)
    k_scale_t: jnp.ndarray,  # [L, B, KV, S] f32 TRANSPOSED scale stacks
    v_scale_t: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32
    n_heads: int,
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantized-cache twin of the stacked rope-fused v2 kernel: RoPE +
    in-VMEM row quantization + int8 stream with on-MXU scale expand.
    Returns (attn, k_q, v_q, k_s [B, KV], v_s [B, KV])."""
    B = qkv.shape[0]
    L = k_cache.shape[0]
    if k_cache.ndim == 5:
        S, KV, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
        kcv = k_cache.reshape(L, B, S, KV * D)
        vcv = v_cache.reshape(L, B, S, KV * D)
    else:
        S, KV = k_cache.shape[2], n_kv
        D = k_cache.shape[3] // KV
        kcv, vcv = k_cache, v_cache
    H = n_heads
    G = H // KV
    dt = k_cache.dtype
    qkv = qkv.reshape(B, H + 2 * KV, D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)
    half = D // 2

    chunk = _pick_chunk(chunk, S, B, 1)
    n_chunks = S // chunk
    is_int = dt == jnp.int8

    cache_spec = pl.BlockSpec((1, B, chunk, KV * D),
                              lambda c, lr: (lr[0], 0, c, 0))
    scale_spec = pl.BlockSpec((1, B, KV, chunk),
                              lambda c, lr: (lr[0], 0, 0, c))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda c, lr: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, H + 2 * KV, D), lambda c, lr: (0, 0, 0)),
            pl.BlockSpec((B, half), lambda c, lr: (0, 0)),
            pl.BlockSpec((B, half), lambda c, lr: (0, 0)),
            cache_spec,
            cache_spec,
            scale_spec,
            scale_spec,
        ],
        out_specs=(
            pl.BlockSpec((B, KV, G, D), lambda c, lr: (0, 0, 0, 0)),
            pl.BlockSpec((B, KV, D), lambda c, lr: (0, 0, 0)),
            pl.BlockSpec((B, KV, D), lambda c, lr: (0, 0, 0)),
            pl.BlockSpec((B, KV, 1), lambda c, lr: (0, 0, 0)),
            pl.BlockSpec((B, KV, 1), lambda c, lr: (0, 0, 0)),
        ),
        scratch_shapes=[
            s for _ in range(B)
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
    )
    out, kq, vq, ks_o, vs_o = pl.pallas_call(
        functools.partial(_v2_qkv_stacked_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=B, chunk=chunk,
                          n_chunks=n_chunks, quant=True,
                          qmax=127.0 if is_int else 448.0, is_int=is_int),
        out_shape=(
            jax.ShapeDtypeStruct((B, KV, G, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, D), dt),
            jax.ShapeDtypeStruct((B, KV, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, 1), jnp.float32),
        ),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos2, qkv, sin_row, cos_row,
      kcv, vcv, k_scale_t, v_scale_t)
    return (out.reshape(B, H, D), kq, vq,
            ks_o.reshape(B, KV), vs_o.reshape(B, KV))


def _scatter_rows_kernel(pos_ref, kr_ref, vr_ref, kin_ref, vin_ref,
                         ko_ref, vo_ref):
    """Read-modify-write of the 8-row window holding ``pos[b]``: pallas
    requires the second-to-last block dim be a multiple of 8, so the
    block is the window and a sublane select inserts the new row."""
    bb = pl.program_id(0)
    row = pos_ref[bb] % 8
    L = kr_ref.shape[0]
    KVD = kr_ref.shape[-1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 8, KVD), 2) == row
    ko_ref[...] = jnp.where(
        sel, jnp.broadcast_to(kr_ref[...], (L, 1, 8, KVD)),
        kin_ref[...]).astype(ko_ref.dtype)
    vo_ref[...] = jnp.where(
        sel, jnp.broadcast_to(vr_ref[...], (L, 1, 8, KVD)),
        vin_ref[...]).astype(vo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def scatter_kv_rows(
    k_cache: jnp.ndarray,   # [L, B, S, KV*D] flat (or 5D) — DONATED
    v_cache: jnp.ndarray,
    k_rows: jnp.ndarray,    # [L, B, 1, KV*D] new rows (any float dtype)
    v_rows: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32 write slots (clamped to S-1)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Write one row per (layer, batch) at ``pos[b]`` IN PLACE via an
    aliased pallas call with a scalar-prefetch index map.

    Replaces the post-scan XLA dynamic-update-slice chain for the
    stacked-attention plans: with the cache read by a layout-constrained
    custom call and written by XLA DUS ops, layout assignment picked an
    S-minor layout for the in-loop cache and inserted TWO full-cache
    relayout copies per decode step (round-4 HLO, copy.76/77 ≈ 0.77
    ms/step at B=8).  When every consumer is a pallas call the layout is
    pinned row-major and the buffers pass through untouched.

    Clamped semantics match BITNET_ROWS_WRITE=clamped: pos >= S writes
    row S-1 of the slot's own lane (see _decode_stacked's rationale).
    """
    squeeze = k_cache.ndim == 5
    if squeeze:
        L, B, S, KV, D = k_cache.shape
        kcv = k_cache.reshape(L, B, S, KV * D)
        vcv = v_cache.reshape(L, B, S, KV * D)
        k_rows = k_rows.reshape(L, B, 1, KV * D)
        v_rows = v_rows.reshape(L, B, 1, KV * D)
    else:
        L, B, S, KVD = k_cache.shape
        kcv, vcv = k_cache, v_cache
    KVD = kcv.shape[3]
    pos2 = jnp.minimum(pos.astype(jnp.int32),
                       jnp.int32(S - 1)).reshape(B)

    row_spec = pl.BlockSpec((L, 1, 1, KVD), lambda bb, pr: (0, bb, 0, 0))
    win_spec = pl.BlockSpec((L, 1, 8, KVD),
                            lambda bb, pr: (0, bb, pr[bb] // 8, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[row_spec, row_spec, win_spec, win_spec],
        out_specs=(win_spec, win_spec),
    )
    kc2, vc2 = pl.pallas_call(
        _scatter_rows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(kcv.shape, kcv.dtype),
            jax.ShapeDtypeStruct(vcv.shape, vcv.dtype),
        ),
        grid_spec=gs,
        # operand indices include the scalar-prefetch arg: caches are 3/4
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(pos2, k_rows, v_rows, kcv, vcv)
    if squeeze:
        kc2 = kc2.reshape(L, B, S, KV, D)
        vc2 = vc2.reshape(L, B, S, KV, D)
    return kc2, vc2


def _pick_group(B: int) -> tuple[int, int]:
    """Batch-group size for the whole-batch kernels: per-slot scratch is
    ~512 KB at 2B shapes, so whole-batch scratch blows the ~16 MB VMEM
    scope above B=16 (measured round 5: B=32 fell back to einsum at
    13.6 ms/step vs B=16's 3.2).  Group the batch on a second grid axis
    instead — largest divisor of B that keeps scratch ≤ 8 slots when
    grouping is needed."""
    if B <= 16:
        return B, 1
    for bg in (8, 4, 2, 1):
        if B % bg == 0:
            return bg, B // bg
    return 1, B


def _pick_chunk(chunk, S, B, itemsize):
    if chunk is None:
        # VMEM: 2 caches x 2 pipeline buffers x B x chunk x KV*D bytes;
        # budget ~10.5 MB of a ~16 MB core → 2048 bf16 rows, 4096 int8
        rows = 2048 if itemsize >= 2 else 4096
        chunk = max(128, 1 << ((rows // B).bit_length() - 1))
    chunk = min(chunk, S, DEFAULT_CHUNK)
    while S % chunk:
        chunk //= 2
    return chunk


@functools.partial(jax.jit,
                   static_argnames=("interpret", "chunk", "n_kv"))
def decode_attention_batched_v2(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D]      (post-RoPE)
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D] or pre-flat [B, S, KV*D]
    v_cache: jnp.ndarray,   # (PRE-write)
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> jnp.ndarray:
    """Whole-batch flash-decode over a dense bf16 cache (v2 body).

    3-D caches are the pre-flattened rows-mode form (pass ``n_kv``) —
    the flat xs skip the per-layer 5D→3D reshape inside the scan."""
    B, H, D = q.shape
    if k_cache.ndim == 4:
        S, KV = k_cache.shape[1], k_cache.shape[2]
        kcv = k_cache.reshape(B, S, KV * D)
        vcv = v_cache.reshape(B, S, KV * D)
    else:
        S, KV = k_cache.shape[1], n_kv
        kcv, vcv = k_cache, v_cache
    G = H // KV
    dt = k_cache.dtype
    qg = q.astype(dt).reshape(B, KV, G, D)
    kn = k_new.astype(dt).reshape(B, 1, KV * D)
    vn = v_new.astype(dt).reshape(B, 1, KV * D)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    BG, n_groups = _pick_group(B)
    chunk = _pick_chunk(chunk, S, BG, dt.itemsize)
    n_chunks = S // chunk

    out = pl.pallas_call(
        functools.partial(_v2_kernel, scale=float(D) ** -0.5,
                          n_kv=KV, G=G, D=D, B=BG, chunk=chunk,
                          n_chunks=n_chunks, quant=False, chunk_axis=1),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        # batch-group major, chunks innermost: the per-group scratch
        # (q_wide/m/d/ctx ≈ 512 KB/slot at 2B shapes) is sized for BG
        # slots instead of B, so B=32+ pools fit the ~16 MB VMEM scope
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((BG, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BG, KV, G, D), lambda g, c: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, chunk, KV * D), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, chunk, KV * D), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BG, KV, G, D), lambda g, c: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            s for _ in range(BG)
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),   # q_wide
                      pltpu.VMEM((KV * G, 1), jnp.float32),        # m
                      pltpu.VMEM((KV * G, 1), jnp.float32),        # d
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))   # ctx wide
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D * dt.itemsize,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv)
    return out.reshape(B, H, D)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "chunk", "n_kv"))
def decode_attention_quant_batched_v2(
    q: jnp.ndarray,         # [B, n_heads, D] (post-RoPE)
    k_new: jnp.ndarray,     # [B, KV, D] ROUND-TRIPPED rows
    v_new: jnp.ndarray,     # [B, KV, D]
    k_cache: jnp.ndarray,   # [B, S, KV, D] int8/fp8 or flat [B, S, KV*D]
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,   # [B, S, KV] f32 per-vector scales
    v_scale: jnp.ndarray,
    pos: jnp.ndarray,       # [B] int32
    interpret: bool = False,
    chunk: int | None = None,
    n_kv: int | None = None,
) -> jnp.ndarray:
    """Whole-batch flash-decode over a quantized cache (v2 body): the
    cache streams at 1 byte/elem and the scale planes ride in their
    storage layout [S, KV] (no XLA transpose), expanded to lane blocks
    in-kernel with ONE repeat per chunk and folded into the k/v stream.

    Numerics note: the fold multiplies (int8 → bf16) * f32-scale in bf16
    before the MXU — same effective precision as the bf16 dense cache
    (the v1 kernel scaled the f32 scores post-dot; both are well inside
    the int8 quantization error)."""
    B, H, D = q.shape
    if k_cache.ndim == 4:
        S, KV = k_cache.shape[1], k_cache.shape[2]
        kcv = k_cache.reshape(B, S, KV * D)
        vcv = v_cache.reshape(B, S, KV * D)
    else:
        S, KV = k_cache.shape[1], n_kv
        kcv, vcv = k_cache, v_cache
    G = H // KV
    act = jnp.bfloat16
    qg = q.astype(act).reshape(B, KV, G, D)
    kn = k_new.astype(act).reshape(B, 1, KV * D)
    vn = v_new.astype(act).reshape(B, 1, KV * D)
    # transposed scale planes [B, KV, S]: tiny VMEM blocks (lanes =
    # chunk) — the storage-layout [chunk, KV] block pads KV -> 128 lanes
    ks = jnp.swapaxes(k_scale.astype(jnp.float32), 1, 2)
    vs = jnp.swapaxes(v_scale.astype(jnp.float32), 1, 2)
    pos2 = pos.reshape(B, 1).astype(jnp.int32)

    BG, n_groups = _pick_group(B)
    chunk = _pick_chunk(chunk, S, BG, 1)
    n_chunks = S // chunk

    def kern(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, ks_ref, vs_ref,
             out_ref, *scr):
        _v2_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, out_ref,
                   ks_ref, vs_ref, *scr, scale=float(D) ** -0.5,
                   n_kv=KV, G=G, D=D, B=BG, chunk=chunk,
                   n_chunks=n_chunks, quant=True, chunk_axis=1)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, D), q.dtype),
        # batch-group major, chunks innermost — see the dense wrapper
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((BG, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BG, KV, G, D), lambda g, c: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 1, KV * D), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, chunk, KV * D), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, chunk, KV * D), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, KV, chunk), lambda g, c: (g, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, KV, chunk), lambda g, c: (g, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BG, KV, G, D), lambda g, c: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            s for _ in range(BG)
            for s in (pltpu.VMEM((KV * G, KV * D), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, 1), jnp.float32),
                      pltpu.VMEM((KV * G, KV * D), jnp.float32))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * KV * D,
            bytes_accessed=2 * B * S * KV * D + 8 * B * S * KV,
            transcendentals=B * H * S),
        interpret=interpret,
    )(pos2, qg, kn, vn, kcv, vcv, ks, vs)
    return out.reshape(B, H, D)
