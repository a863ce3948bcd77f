"""Fused ternary (2-bit) matmul Pallas kernels for the TPU MXU.

This is the TPU replacement for the reference's entire multi-backend kernel
matrix (``bitnet-kernels/src/cpu/x86.rs`` AVX2/AVX-512 ``matmul_i2s``,
``src/gpu/kernels/bitnet_kernels.cu`` ``bitnet_matmul_i2s``, and the
OpenCL/Metal/Vulkan/HIP/WGSL clones): ONE kernel family instead of seven
backends.

Design (SURVEY.md §7 P2, round-2 rework — see experiments/exp_w2a8.py):
- ternary codes stay **packed in HBM** as int32 words (16 codes/word,
  tile-local interleave from ops/linear.py);
- the kernel unpacks 4 codes per lane per shift plane —
  ``(word >> 2p) & 0x03030303`` — then **biases** each byte to
  ``code + (code>>1) ∈ {0,1,3,4}`` (= LUT value + 2) while still in i32
  lanes, and splits bytes into rows with one cross-size ``pltpu.bitcast``
  (i32→i8).  ~1.6 VPU ops/value vs ~6 for the round-1 per-byte unpack;
- the +2 bias is removed *after* the MXU via the zero-point identity
  ``Σ w·x = Σ (w+2)·x − 2·Σ x`` (per-token activation sums are a [M,1]
  column computed outside the kernel);
- two activation modes:
    * **bf16** ("pallas"): biased i8 → bf16, MXU bf16×bf16→f32.  Exact
      (all integer products < 2^24 are exact in f32 accumulation).
    * **w2a8** ("w2a8"): per-token absmax int8 activations, MXU
      int8×int8→int32 (2× MXU throughput, no i8→bf16 convert) — the TPU
      translation of the reference's quantized-activation kernels
      (``bitnet-kernels/src/cpu/x86.rs:417`` ``matmul_i2s_avx2``).
- grid (M/BM, N/BN, K/BK) with K innermost; the accumulator lives in VMEM
  scratch across the K sweep; Pallas double-buffers the HBM→VMEM streams
  across grid steps (keep ≥ 2 K steps).

Decode (M=1) is HBM-bandwidth bound: reading 2-bit weights moves 8× fewer
bytes than bf16 — that is the whole ternary speedup on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import KernelError

# K-granule of the packed interleave layout (must match ops.linear.KT_PACK)
KT = 256
MASK2 = 0x03030303
MASK1 = 0x01010101


def stacked_decode_max_m() -> int:
    """M cap for the one-M-block fused decode kernels (normed W2A8, TL):
    the whole [M, K(·2)] activation block plus the [M, Kp] int8 scratch
    must fit VMEM beside the weight and accumulator blocks, so the cap
    is a VMEM budget, not an algorithmic limit.  v5e (round 5): M=64
    compiles and holds per-row throughput — before the cap was raised
    from 32, a 48-slot serving pool silently fell off the stacked
    decode loop onto the generic per-layer path at 19x the device step
    time (67.6 vs 3.5 ms, docs/perf/round5-serving-log.md).  M=512
    (prefill-sized) fails to compile; prefill rides the M-blocked
    kernels instead.  BITNET_STACKED_DECODE_MAX_M overrides.

    Shared by the model eligibility gate (_stacked_decode_ok), the
    attention-plan whole-batch bound (decode_attn_plan), and the fused
    normed-kernel dispatch below — ONE predicate, so the cache-layout
    chooser can never again plan a kernel the model refuses to run.
    """
    import os

    return int(os.environ.get("BITNET_STACKED_DECODE_MAX_M", "64"))


def _bitcast_i32_to_i8(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """[R, N] i32 → [4R, N] i8, row ``4s+j`` = byte ``j`` of word ``s``.

    Hardware path: Mosaic's cross-size bitcast expands sublanes
    row-major little-endian (verified on v5e, exp_w2a8.py P1).  Interpret
    mode lacks it, so emulate with lax.bitcast + reshape (same order).
    """
    if not interpret:
        return pltpu.bitcast(x, jnp.int8)
    R, N = x.shape
    b = jax.lax.bitcast_convert_type(x, jnp.int8)      # [R, N, 4]
    return jnp.transpose(b, (0, 2, 1)).reshape(R * 4, N)


def _unpack_words_biased_i8(p32: jnp.ndarray, interpret: bool,
                            lut_bias: bool = True) -> jnp.ndarray:
    """[R, BN] i32 words → [16R, BN] i8 **biased** values.

    ``lut_bias=True`` (ternary I2_S): biased value = LUT{-2,-1,1,2}[code]
    + 2 = code + (code >> 1) ∈ {0,1,3,4}.  ``lut_bias=False`` (TL1/TL2
    table-lookup levels {-2,-1,0,1}, tl1.rs:49-82): biased value = code
    ∈ {0..3} — one VPU op cheaper.  Both use zero-point 2, so callers
    remove the bias via the same correction ``− 2·Σx``.  Output rows
    follow the tile-local interleave: within a KT=256 subtile (R=16),
    plane p / word s / byte j lands at row p*64 + 4s + j = logical row
    (ops/linear.py).
    """
    planes = []
    for p in range(4):
        t = (p32 >> (2 * p)) & MASK2
        b = t + ((t >> 1) & MASK1) if lut_bias else t
        planes.append(_bitcast_i32_to_i8(b, interpret))
    return jnp.concatenate(planes, axis=0)


# --------------------------------------------------------------------------
# bf16-activation kernels (exact; per-tensor / per-column / per-32-row scales)
# --------------------------------------------------------------------------
def _qk256_kernel(x_ref, w_ref, sumx_ref, scale_ref, out_ref, acc_ref,
                  *, n_k: int, bkt: int, interpret: bool, vecscale: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 16), KT // 16), :]
        w = _unpack_words_biased_i8(p32, interpret).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(
            x_ref[:, pl.ds(t * KT, KT)], w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        corr = acc_ref[:] - 2.0 * sumx_ref[:]          # remove +2 bias
        if vecscale:
            out_ref[:] = (corr * scale_ref[0, :][None, :]).astype(
                out_ref.dtype)
        else:
            out_ref[:] = (corr * scale_ref[0, 0]).astype(out_ref.dtype)


def _bitnet32_kernel(x_ref, w_ref, s_ref, corr_ref, out_ref, acc_ref,
                     *, n_k: int, bkt: int, interpret: bool,
                     lut_bias: bool = True):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 16), KT // 16), :]
        v = _unpack_words_biased_i8(p32, interpret, lut_bias).astype(
            jnp.float32)
        s = s_ref[pl.ds(t * (KT // 32), KT // 32), :]   # [KT/32, BN] f32
        # elementwise row-repeat ×32 (NOT pltpu.repeat, which tiles copies)
        s32 = jnp.broadcast_to(
            s[:, None, :], (s.shape[0], 32, s.shape[1])
        ).reshape(s.shape[0] * 32, s.shape[1])
        w = (v * s32).astype(jnp.bfloat16)              # biased, scaled
        acc_ref[:] += jnp.dot(
            x_ref[:, pl.ds(t * KT, KT)], w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        # bias removal 2·Σ_b s[b,n]·sum32[m,b] is a 32×-smaller matmul,
        # precomputed in XLA (a [M, K/32] block couldn't lane-align as a
        # Pallas input anyway) and subtracted in the epilogue
        out_ref[:] = (acc_ref[:] - corr_ref[:]).astype(out_ref.dtype)


# --------------------------------------------------------------------------
# W2A8 kernels: int8 activations on the int8 MXU (qk256 flavors)
# --------------------------------------------------------------------------
def _qk256_w2a8_kernel(xq_ref, w_ref, sumq_ref, sx_ref, scale_ref,
                       out_ref, acc_ref,
                       *, n_k: int, bkt: int, interpret: bool,
                       vecscale: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 16), KT // 16), :]
        w = _unpack_words_biased_i8(p32, interpret)     # i8 {0,1,3,4}
        acc_ref[:] += jnp.dot(
            xq_ref[:, pl.ds(t * KT, KT)], w,
            preferred_element_type=jnp.int32,
        )

    @pl.when(k == n_k - 1)
    def _():
        corr = (acc_ref[:] - 2 * sumq_ref[:]).astype(jnp.float32)
        y = corr * sx_ref[:].astype(jnp.float32)        # per-token scale
        if vecscale:
            out_ref[:] = (y * scale_ref[0, :][None, :]).astype(out_ref.dtype)
        else:
            out_ref[:] = (y * scale_ref[0, 0]).astype(out_ref.dtype)


def _qk256_w2a8_normed_kernel(x_ref, g_ref, w_ref, scale_ref, *rest,
                              n_k: int, bkt: int, eps: float,
                              has_norm: bool, vecscale: bool,
                              glu: bool, has_resid: bool,
                              interpret: bool):
    """W2A8 kernel with the RMSNorm + per-token absmax quantization fused
    into the first grid step (decode shapes: one M block, whole-K x).

    Decode is launch-overhead bound: the separate XLA norm fusion +
    absmax/round/sum chain + M-padding cost ~6 µs per matmul at B=1
    (experiments/exp_fixed_ops.py S1) — here they ride the first weight
    tile's DMA window instead.  The quantized activations live in VMEM
    scratch for the whole (n, k) sweep; rows ≥ M are never initialized
    and only feed output rows the caller slices away (integer products
    cannot overflow: 128·4·K < 2^24).

    ``glu``: x is the raw gate|up projection [M, 2K]; the preamble
    computes ``silu(gate) · up`` before the norm — the SwiGLU activation
    rides the kernel too.  ``has_resid``: a residual block is added in
    the epilogue, so the layer's residual add stops being a standalone
    XLA fusion.
    """
    if has_resid:
        resid_ref, out_ref, acc_ref, xq_scr, sx_scr, sumq_scr = rest
    else:
        out_ref, acc_ref, xq_scr, sx_scr, sumq_scr = rest
        resid_ref = None
    n = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((n == 0) & (k == 0))
    def _():
        xf = x_ref[:].astype(jnp.float32)              # [M, Kp] / [M, 2Kp]
        if glu:
            Kp = xf.shape[1] // 2
            gate = xf[:, :Kp]
            xf = gate * jax.lax.logistic(gate) * xf[:, Kp:]   # silu(g)·up
        if has_norm:
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + jnp.float32(eps))
            xf = xf * g_ref[:].astype(jnp.float32)     # [1, Kp] broadcast
        absmax = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        sx = absmax / 127.0
        q = jnp.clip(jnp.round(xf / sx), -127, 127)
        M = xf.shape[0]
        xq_scr[0:M, :] = q.astype(jnp.int8)
        sx_scr[0:M, :] = sx
        # q holds exact small integers; f32 summation is exact < 2^24
        sumq_scr[0:M, :] = jnp.sum(q, axis=1, keepdims=True).astype(
            jnp.int32)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = k * bkt * KT
    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 16), KT // 16), :]
        w = _unpack_words_biased_i8(p32, interpret)     # i8 {0,1,3,4}
        acc_ref[:] += jnp.dot(
            xq_scr[:, pl.ds(base + t * KT, KT)], w,
            preferred_element_type=jnp.int32,
        )

    @pl.when(k == n_k - 1)
    def _():
        corr = (acc_ref[:] - 2 * sumq_scr[:]).astype(jnp.float32)
        y = corr * sx_scr[:].astype(jnp.float32)
        if vecscale:
            y = y * scale_ref[0, :][None, :]
        else:
            y = y * scale_ref[0, 0]
        if has_resid:
            # resid carries M (not bm) rows; rows ≥ M stay unwritten
            M = resid_ref.shape[0]
            out_ref[0:M, :] = (
                y[0:M, :] + resid_ref[:].astype(jnp.float32)
            ).astype(out_ref.dtype)
        else:
            out_ref[:] = y.astype(out_ref.dtype)


def _qk256_w2a8_stacked_kernel(l_ref, x_ref, g_ref, w_ref, s_ref, *rest,
                               n_k: int, bkt: int, eps: float,
                               has_norm: bool, glu: bool, has_resid: bool,
                               interpret: bool):
    """Stacked-layer variant of the normed W2A8 kernel: weights arrive as
    the FULL ``[L, Kp/16, Np]`` stack and the layer index rides in as a
    scalar-prefetch operand driving the block index maps.

    Why: under ``lax.scan`` the per-layer weight slice feeding a pallas
    operand is MATERIALIZED by XLA (dynamic-slice → full HBM copy), which
    tripled decode's weight traffic (profiler: ~0.8 ms/step of
    ``dynamic-slice_bitcast_fusion`` vs the 0.65 ms kernel floor).
    Scalar-prefetch block indexing reads each tile straight from the
    stacked array — no copy (v5e: gateup×30 0.757 → 0.554 ms).

    The body is :func:`_qk256_w2a8_normed_kernel` verbatim — the block
    index maps already selected layer ``l``, so dropping each ref's
    leading unit axis is the only difference (one numerics body for the
    stacked and unstacked paths; tests/test_decode_attention.py
    TestStackedKernels pins their parity).
    """
    del l_ref  # consumed by the BlockSpec index maps
    _qk256_w2a8_normed_kernel(
        x_ref, g_ref.at[0], w_ref.at[0], s_ref.at[0], *rest,
        n_k=n_k, bkt=bkt, eps=eps, has_norm=has_norm, vecscale=True,
        glu=glu, has_resid=has_resid, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("k_dim", "n_dim", "eps", "glu", "interpret", "blocks"),
)
def ternary_matmul_stacked(
    l: jnp.ndarray,            # [] / [1] int32 layer index (traced)
    x: jnp.ndarray,            # [M, K] (or [M, 2K] when glu)
    packed: jnp.ndarray,       # [L, Kp/16, Np] stacked int32 words
    scale_vec: jnp.ndarray,    # [L, Np] f32 per-column scales
    gamma: jnp.ndarray | None, # [L, Kp] RMSNorm weights (None = no norm)
    k_dim: int,
    n_dim: int,
    eps: float = 1e-5,
    glu: bool = False,
    resid: jnp.ndarray | None = None,   # [M, n_dim]
    interpret: bool = False,
    blocks: tuple[int, int, int] | None = None,   # (bm, bn, bkt) override
) -> jnp.ndarray:
    """Decode-shaped W2A8 matmul over one layer of a stacked weight array
    (see _qk256_w2a8_stacked_kernel).  Caller guarantees K == Kp, one M
    block, kind qk256."""
    M = x.shape[0]
    Kp = packed.shape[1] * 16
    Np = packed.shape[2]
    bm, bn, bkt = blocks or _pick_blocks_stacked(M, Kp, Np)
    bk = bkt * KT
    n_k = Kp // bk
    grid = (1, Np // bn, n_k)
    Mp = bm

    # [L, 1, Kp]/[L, 1, Np] with unit middle dims: a (1, Kp) block on a
    # (L, Kp) array trips the Mosaic last-two-dims rule for L > 1
    has_norm = gamma is not None
    g = (gamma.reshape(-1, 1, Kp).astype(jnp.float32) if has_norm
         else jnp.ones((1, 1, Kp), jnp.float32))
    g_map = ((lambda m, n, k, lr: (lr[0], 0, 0)) if has_norm
             else (lambda m, n, k, lr: (0, 0, 0)))
    in_specs = [
        pl.BlockSpec((M, x.shape[1]), lambda m, n, k, lr: (0, 0)),
        pl.BlockSpec((1, 1, Kp), g_map),
        pl.BlockSpec((1, bk // 16, bn), lambda m, n, k, lr: (lr[0], k, n)),
        pl.BlockSpec((1, 1, bn), lambda m, n, k, lr: (lr[0], 0, n)),
    ]
    operands = [x, g, packed, scale_vec.reshape(-1, 1, Np)]
    has_resid = resid is not None
    if has_resid:
        if resid.shape[1] != Np:
            resid = jnp.pad(resid, ((0, 0), (0, Np - resid.shape[1])))
        in_specs.append(pl.BlockSpec((M, bn), lambda m, n, k, lr: (0, n)))
        operands.append(resid)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bm, Kp), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _qk256_w2a8_stacked_kernel, n_k=n_k, bkt=bkt, eps=eps,
            has_norm=has_norm, glu=glu, has_resid=has_resid,
            interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), *operands)
    return out[:M, :n_dim]


def _qk256_w2a8_stacked_prefill_kernel(l_ref, xq_ref, w_ref, sumq_ref,
                                       sx_ref, scale_ref, out_ref, acc_ref,
                                       *, n_k: int, bkt: int,
                                       interpret: bool):
    """Stacked-layer variant of the plain W2A8 kernel for PREFILL shapes
    (M-blocked, activations quantized in XLA): the weight stack
    ``[L, Kp/16, Np]`` is indexed by the scalar-prefetch layer index, so
    the prefill ``lax.scan`` stops materializing a per-layer weight-slice
    copy for every pallas operand (the same ~0.8 ms/pass of
    ``dynamic-slice_bitcast_fusion`` the decode loop eliminated).

    The body is :func:`_qk256_w2a8_kernel` verbatim (drop the stacked
    refs' unit leading axis); norm/quantize stay in XLA because a
    [M≥512, Kp] activation block + int8 scratch would blow VMEM — at
    prefill M the XLA-side prep amortizes over the rows anyway.
    """
    del l_ref  # consumed by the BlockSpec index maps
    _qk256_w2a8_kernel(xq_ref, w_ref.at[0], sumq_ref, sx_ref,
                       scale_ref.at[0], out_ref, acc_ref,
                       n_k=n_k, bkt=bkt, interpret=interpret,
                       vecscale=True)


@functools.partial(
    jax.jit,
    static_argnames=("k_dim", "n_dim", "interpret", "blocks"),
)
def ternary_matmul_stacked_prefill(
    l: jnp.ndarray,            # [] / [1] int32 layer index (traced)
    x: jnp.ndarray,            # [M, K] float (already normed/activated)
    packed: jnp.ndarray,       # [L, Kp/16, Np] stacked int32 words
    scale_vec: jnp.ndarray,    # [L, Np] f32 per-column scales
    k_dim: int,
    n_dim: int,
    interpret: bool = False,
    blocks: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Prefill-shaped (M-blocked) W2A8 matmul over one layer of a stacked
    weight array; activations are absmax-int8 quantized here in XLA with
    the exact math of `_ternary_matmul_2d`'s w2a8 branch, so results are
    bit-identical to the unstacked path at matching block sizes."""
    M, K = x.shape
    Kp = packed.shape[1] * 16
    Np = packed.shape[2]
    bm, bn, bkt = blocks or _pick_blocks(M, Kp, Np, "w2a8")
    bk = bkt * KT
    if K != Kp:
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Kp - K)))
    Mp = -(-M // bm) * bm
    n_m, n_n, n_k = Mp // bm, Np // bn, Kp // bk

    xf = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
    sx = absmax / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    sumq = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    xq = _pad_to(xq, 0, bm)
    sumq = _pad_to(sumq, 0, bm)
    sx = _pad_to(sx, 0, bm)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, bk // 16, bn),
                         lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((bm, 1), lambda m, n, k, lr: (m, 0)),
            pl.BlockSpec((bm, 1), lambda m, n, k, lr: (m, 0)),
            pl.BlockSpec((1, 1, bn), lambda m, n, k, lr: (lr[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _qk256_w2a8_stacked_prefill_kernel, n_k=n_k, bkt=bkt,
            interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp + (Kp // 4) * Np + Mp * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), xq, packed,
      sumq, sx, scale_vec.reshape(-1, 1, Np))
    return out[:M, :n_dim]


def _bitnet32_stacked_kernel(l_ref, x_ref, w_ref, s_ref, corr_ref, out_ref,
                             acc_ref, *, n_k: int, bkt: int,
                             interpret: bool, lut_bias: bool):
    """Stacked-layer variant of the bitnet32/TL kernel: weights AND
    per-block scales arrive as full ``[L, ...]`` stacks with the layer
    index in scalar prefetch (same motivation as the qk256 stacked
    kernels: scan weight slices feeding pallas operands are materialized
    copies).  The bias correction stays in XLA — it reads ``scales[l]``
    with ordinary dynamic-slice fusion, which XLA fuses for free."""
    del l_ref  # consumed by the BlockSpec index maps
    _bitnet32_kernel(x_ref, w_ref.at[0], s_ref.at[0], corr_ref, out_ref,
                     acc_ref, n_k=n_k, bkt=bkt, interpret=interpret,
                     lut_bias=lut_bias)


@functools.partial(
    jax.jit,
    static_argnames=("k_dim", "n_dim", "lut_bias", "interpret", "blocks"),
)
def ternary_matmul_stacked_tl(
    l: jnp.ndarray,            # [] / [1] int32 layer index (traced)
    x: jnp.ndarray,            # [M, K] float (already normed/activated)
    packed: jnp.ndarray,       # [L, Kp/16, Np] stacked int32 words
    scales: jnp.ndarray,       # [L, Ks/32, Ns] f32 per-K-block scales
    k_dim: int,
    n_dim: int,
    lut_bias: bool = False,    # True: bitnet32 LUT {-2,-1,1,2}; False: TL
    interpret: bool = False,
    blocks: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Decode-shaped bitnet32/TL matmul over one layer of stacked weight
    + scale arrays (bf16 activations — TL has no W2A8 recipe; the
    zero-point-2 identity shares the 2·sum32 correction with bitnet32,
    computed here in XLA from ``scales[l]``)."""
    M, K = x.shape
    Kp = packed.shape[1] * 16
    Np = packed.shape[2]
    bm, bn, bkt = blocks or _pick_blocks(M, Kp, Np, "pallas")
    bk = bkt * KT
    if K != Kp:
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Kp - K)))
    Mp = -(-M // bm) * bm
    n_m, n_n, n_k = Mp // bm, Np // bn, Kp // bk

    s = jnp.asarray(scales, jnp.float32)
    if s.shape[1] * 32 != Kp or s.shape[2] != Np:
        s = jnp.pad(s, ((0, 0), (0, Kp // 32 - s.shape[1]),
                        (0, Np - s.shape[2])))
    xb = x.astype(jnp.bfloat16)
    x_in = _pad_to(xb, 0, bm)
    # bias correction 2·(sum32 @ scales[l]): reads the layer's scale
    # plane via ordinary XLA dynamic-slice fusion (no pallas copy rule)
    sum32 = jnp.sum(
        x_in.astype(jnp.float32).reshape(Mp, Kp // 32, 32), axis=-1)
    s_l = jnp.take(s, jnp.asarray(l, jnp.int32).reshape(()), axis=0)
    corr = 2.0 * jnp.matmul(sum32, s_l,
                            precision=jax.lax.Precision.HIGHEST)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, bk // 16, bn),
                         lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, bk // 32, bn),
                         lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _bitnet32_stacked_kernel, n_k=n_k, bkt=bkt,
            interpret=interpret, lut_bias=lut_bias),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp * 2 + (Kp // 4) * Np + Mp * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), x_in, packed, s, corr)
    return out[:M, :n_dim]


def _bitnet32_fused_kernel(x_ref, g_ref, w_ref, s_ref, *rest,
                           n_k: int, bkt: int, eps: float, has_norm: bool,
                           glu: bool, has_resid: bool, lut_bias: bool,
                           interpret: bool):
    """bitnet32/TL decode kernel with the RMSNorm (+SwiGLU, +residual)
    fused in — the TL counterpart of `_qk256_w2a8_normed_kernel`.

    Activations stay bf16 (there is no W2A8 recipe for per-32-row scales:
    the int8 MXU dot cannot absorb a scale that varies along K at
    granularity 32), but the weights go UNBIASED in-kernel — the unpack
    produces biased codes, and ``(v − 2) · s32`` folds the zero-point
    removal into the scale multiply that already exists.  That deletes
    the separate XLA ``2·(sum32 @ scales[l])`` HIGHEST-precision
    correction matmul AND its corr operand stream (`_bitnet32_kernel`),
    and the norm/SwiGLU/residual stop being standalone XLA fusions
    between matmuls (~6 µs of fixed cost per matmul at B=1,
    experiments/exp_fixed_ops.py).

    Caller guarantees decode shapes: one M block, K == Kp (the in-kernel
    norm means column padding cannot be folded into the operand).
    Reference behavior: the BitNet32-F16 / TL1 / TL2 flavors of
    crates/bitnet-quantization/src/{i2s.rs:27-50,tl1.rs:49-82} — the
    reference calls BitNet32 its fast flavor (README.md:44); this gives
    it the same fused treatment as QK256 on TPU.
    """
    if has_resid:
        resid_ref, out_ref, acc_ref, xb_scr = rest
    else:
        out_ref, acc_ref, xb_scr = rest
        resid_ref = None
    n = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((n == 0) & (k == 0))
    def _():
        xf = x_ref[:].astype(jnp.float32)              # [M, Kp] / [M, 2Kp]
        if glu:
            Kp = xf.shape[1] // 2
            gate = xf[:, :Kp]
            xf = gate * jax.lax.logistic(gate) * xf[:, Kp:]   # silu(g)·up
        if has_norm:
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + jnp.float32(eps))
            xf = xf * g_ref[:].astype(jnp.float32)     # [1, Kp] broadcast
        M = xf.shape[0]
        xb_scr[0:M, :] = xf.astype(jnp.bfloat16)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = k * bkt * KT
    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 16), KT // 16), :]
        v = _unpack_words_biased_i8(p32, interpret, lut_bias).astype(
            jnp.float32)                                # {0,1,3,4} / {0..3}
        s = s_ref[pl.ds(t * (KT // 32), KT // 32), :]   # [KT/32, bn] f32
        s32 = jnp.broadcast_to(
            s[:, None, :], (s.shape[0], 32, s.shape[1])
        ).reshape(s.shape[0] * 32, s.shape[1])
        w = ((v - 2.0) * s32).astype(jnp.bfloat16)      # UNBIASED, scaled
        acc_ref[:] += jnp.dot(
            xb_scr[:, pl.ds(base + t * KT, KT)], w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        if has_resid:
            M = resid_ref.shape[0]
            out_ref[0:M, :] = (
                acc_ref[0:M, :] + resid_ref[:].astype(jnp.float32)
            ).astype(out_ref.dtype)
        else:
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _bitnet32_fused_stacked_kernel(l_ref, x_ref, g_ref, w_ref, s_ref,
                                   *rest, n_k: int, bkt: int, eps: float,
                                   has_norm: bool, glu: bool,
                                   has_resid: bool, lut_bias: bool,
                                   interpret: bool):
    """Stacked-layer wrapper of `_bitnet32_fused_kernel` (weights + scale
    planes as full [L, ...] stacks indexed via scalar prefetch)."""
    del l_ref  # consumed by the BlockSpec index maps
    _bitnet32_fused_kernel(
        x_ref, g_ref.at[0], w_ref.at[0], s_ref.at[0], *rest,
        n_k=n_k, bkt=bkt, eps=eps, has_norm=has_norm, glu=glu,
        has_resid=has_resid, lut_bias=lut_bias, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("k_dim", "n_dim", "eps", "glu", "lut_bias",
                     "interpret", "blocks"),
)
def ternary_matmul_stacked_tl_fused(
    l: jnp.ndarray,            # [] / [1] int32 layer index (traced)
    x: jnp.ndarray,            # [M, K] raw (or [M, 2K] when glu)
    packed: jnp.ndarray,       # [L, Kp/16, Np] stacked int32 words
    scales: jnp.ndarray,       # [L, Kp/32, Np] f32 per-32-row scales
    gamma: jnp.ndarray | None, # [L, Kp] RMSNorm weights (None = no norm)
    k_dim: int,
    n_dim: int,
    eps: float = 1e-5,
    glu: bool = False,
    resid: jnp.ndarray | None = None,   # [M, n_dim]
    lut_bias: bool = False,    # True: bitnet32 LUT {-2,-1,1,2}; False: TL
    interpret: bool = False,
    blocks: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Decode-shaped fused bitnet32/TL matmul over one layer of stacked
    weight + scale arrays (see `_bitnet32_fused_kernel`).  Caller
    guarantees K == Kp (k_dim % 256 == 0), one M block."""
    M = x.shape[0]
    Kp = packed.shape[1] * 16
    Np = packed.shape[2]
    if k_dim != Kp:
        raise KernelError(
            f"fused TL kernel needs k_dim == Kp ({k_dim} != {Kp}); "
            "use ternary_matmul_stacked_tl")
    bm, bn, bkt = blocks or _pick_blocks_stacked(M, Kp, Np)
    bk = bkt * KT
    n_k = Kp // bk
    grid = (1, Np // bn, n_k)

    s = jnp.asarray(scales, jnp.float32)
    if s.shape[1] * 32 != Kp or s.shape[2] != Np:
        s = jnp.pad(s, ((0, 0), (0, Kp // 32 - s.shape[1]),
                        (0, Np - s.shape[2])))

    has_norm = gamma is not None
    g = (gamma.reshape(-1, 1, Kp).astype(jnp.float32) if has_norm
         else jnp.ones((1, 1, Kp), jnp.float32))
    g_map = ((lambda m, n, k, lr: (lr[0], 0, 0)) if has_norm
             else (lambda m, n, k, lr: (0, 0, 0)))
    in_specs = [
        pl.BlockSpec((M, x.shape[1]), lambda m, n, k, lr: (0, 0)),
        pl.BlockSpec((1, 1, Kp), g_map),
        pl.BlockSpec((1, bk // 16, bn), lambda m, n, k, lr: (lr[0], k, n)),
        pl.BlockSpec((1, bk // 32, bn), lambda m, n, k, lr: (lr[0], k, n)),
    ]
    operands = [x, g, packed, s]
    has_resid = resid is not None
    if has_resid:
        if resid.shape[1] != Np:
            resid = jnp.pad(resid, ((0, 0), (0, Np - resid.shape[1])))
        in_specs.append(pl.BlockSpec((M, bn), lambda m, n, k, lr: (0, n)))
        operands.append(resid)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),      # accumulator
            pltpu.VMEM((bm, Kp), jnp.bfloat16),     # normed activations
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _bitnet32_fused_stacked_kernel, n_k=n_k, bkt=bkt, eps=eps,
            has_norm=has_norm, glu=glu, has_resid=has_resid,
            lut_bias=lut_bias, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((bm, Np), x.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * Kp * Np,
            bytes_accessed=(Kp // 4) * Np + (Kp // 32) * Np * 4
            + bm * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), *operands)
    return out[:M, :n_dim]


def _tl_w2a8_fused_kernel(x_ref, g_ref, w_ref, s_ref, *rest,
                          n_k: int, bkt: int, eps: float, has_norm: bool,
                          glu: bool, has_resid: bool, lut_bias: bool,
                          interpret: bool):
    """bitnet32/TL decode kernel on the **int8 MXU** (round 5).

    Round 4's fused TL kernel (`_bitnet32_fused_kernel`) claimed "there
    is no W2A8 recipe for per-32-row scales: the int8 MXU dot cannot
    absorb a scale that varies along K at granularity 32".  The dot
    can't — but the K-reduction factors EXACTLY over the scale blocks:

        y[m,n] = sx[m] · Σ_b s[b,n] · ( Σ_{k∈b} xq[m,k]·c[k,n] − 2·Σ_{k∈b} xq[m,k] )

    The first on-chip attempt sliced xq per 32-row block — Mosaic
    rejects 32-wide LANE slices ("cannot statically prove that index in
    dimension 1 is a multiple of 128"), and 8 tiny [M,32] dots per tile
    would be MXU-latency-bound anyway.  This version keeps the identity
    but restructures for the hardware:

    - **Preamble** builds a block-masked activation matrix in VMEM
      scratch ONCE: row ``r = m·8 + b`` of ``x_scr`` [32, Kp] holds
      ``xq[m, k]`` on exactly the lanes whose within-tile scale block
      ``(k mod 256)//32 == b`` and zeros elsewhere (pure iota select —
      no slicing, no transpose).
    - **Per K-tile**: ONE full-contraction int8 MXU dot
      ``x_scr[:, tile] [32, 256] @ w [256, bn] → int32 [32, bn]`` whose
      row ``m·8+b`` IS the per-block partial Σ_{k∈b} xq·c; the
      zero-point-2 identity and the f32 block scale ride a VPU fma on
      the [32, bn] partials (st tiled down the 32 rows), accumulated
      into a WIDE [32, bn] f32 accumulator.  vs the bf16 kernel this
      cuts the per-weight VPU dequant work to ~unpack-only (no
      per-weight scale broadcast/multiply/convert — the scale work is
      per PARTIAL, 32 rows instead of 256 weight rows).
    - **Epilogue** reduces each row group of 8 to one output row and
      applies the per-token activation scale + residual.

    All slice offsets are multiples of 256 (lanes) or 8 (f32 sublanes);
    int8 scratch rows are the i8 sublane tile (32).  Per-block int32
    partials are exact (|xq|·4·32 < 2^15); the f32 block-scale
    accumulation matches the reference's per-block dequant semantics
    (crates/bitnet-quantization/src/i2s.rs:27-50 — f16 scale per
    32-element block).  Decode shapes only: one M block, M ≤ 2 (the
    masked rows 8·M must fit the 32-row i8 tile with headroom; B>2 TL
    pools ride the bf16 fused kernel), K == Kp.
    """
    if has_resid:
        resid_ref, out_ref, acc_ref, x_scr, sx_scr = rest
    else:
        out_ref, acc_ref, x_scr, sx_scr = rest
        resid_ref = None
    n = pl.program_id(1)
    k = pl.program_id(2)
    Kp = x_scr.shape[1]
    M = x_ref.shape[0]

    @pl.when((n == 0) & (k == 0))
    def _():
        xf = x_ref[:].astype(jnp.float32)              # [M, Kp] / [M, 2Kp]
        if glu:
            Kg = xf.shape[1] // 2
            gate = xf[:, :Kg]
            xf = gate * jax.lax.logistic(gate) * xf[:, Kg:]   # silu(g)·up
        if has_norm:
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + jnp.float32(eps))
            xf = xf * g_ref[:].astype(jnp.float32)     # [1, Kp] broadcast
        absmax = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
        sx = absmax / 127.0
        q = jnp.clip(jnp.round(xf / sx), -127.0, 127.0)   # [M, Kp] f32
        sx_scr[0:M, :] = sx
        # block-masked rows: row m·8+b = q[m] masked to scale block b
        row = jax.lax.broadcasted_iota(jnp.int32, (32, Kp), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (32, Kp), 1)
        base = jnp.broadcast_to(q[0:1, :], (32, Kp))
        if M == 2:
            # extract row 1 without a sub-tile sublane slice: masked
            # column reduce of the [2, Kp] block
            q1 = jnp.sum(
                jnp.where(jax.lax.broadcasted_iota(
                    jnp.int32, (M, Kp), 0) == 1, q, 0.0),
                axis=0, keepdims=True)
            base = jnp.where(row >= 8, jnp.broadcast_to(q1, (32, Kp)),
                             base)
        live = ((lane % KT) // 32 == row % 8) & (row < 8 * M)
        x_scr[:] = jnp.where(live, base, 0.0).astype(jnp.int8)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base_k = k * bkt * KT
    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 16), KT // 16), :]
        w = _unpack_words_biased_i8(p32, interpret, lut_bias)
        xt = x_scr[:, pl.ds(base_k + t * KT, KT)]          # [32, KT] i8
        p = jnp.dot(xt, w, preferred_element_type=jnp.int32)  # [32, bn]
        sq = jnp.sum(xt.astype(jnp.int32), axis=1, keepdims=True)
        st = s_ref[pl.ds(t * (KT // 32), KT // 32), :].astype(
            jnp.float32)                                   # [8, bn]
        s_full = jnp.concatenate([st, st, st, st], axis=0)  # [32, bn]
        acc_ref[:] += (p - 2 * sq).astype(jnp.float32) * s_full

    @pl.when(k == n_k - 1)
    def _():
        # rows m·8 .. m·8+8 of the wide accumulator sum to output row m;
        # rows ≥ 8·M were zero-masked activations → zero partials.
        # rows ≥ M of out_ref stay unwritten and the caller slices them
        # away (same contract as the qk256 normed kernel).
        ys = [jnp.sum(acc_ref[8 * m:8 * m + 8, :], axis=0, keepdims=True)
              for m in range(M)]
        y = jnp.concatenate(ys, axis=0) if M > 1 else ys[0]
        y = y * sx_scr[0:M, :].astype(jnp.float32)
        if has_resid:
            y = y + resid_ref[:].astype(jnp.float32)
        out_ref[0:M, :] = y.astype(out_ref.dtype)


def _tl_w2a8_fused_stacked_kernel(l_ref, x_ref, g_ref, w_ref, s_ref,
                                  *rest, n_k: int, bkt: int, eps: float,
                                  has_norm: bool, glu: bool,
                                  has_resid: bool, lut_bias: bool,
                                  interpret: bool):
    """Stacked-layer wrapper of `_tl_w2a8_fused_kernel` (weights + scale
    planes as full [L, ...] stacks indexed via scalar prefetch)."""
    del l_ref  # consumed by the BlockSpec index maps
    _tl_w2a8_fused_kernel(
        x_ref, g_ref.at[0], w_ref.at[0], s_ref.at[0], *rest,
        n_k=n_k, bkt=bkt, eps=eps, has_norm=has_norm, glu=glu,
        has_resid=has_resid, lut_bias=lut_bias, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("k_dim", "n_dim", "eps", "glu", "lut_bias",
                     "interpret", "blocks"),
)
def ternary_matmul_stacked_tl_w2a8(
    l: jnp.ndarray,            # [] / [1] int32 layer index (traced)
    x: jnp.ndarray,            # [M, K] raw (or [M, 2K] when glu)
    packed: jnp.ndarray,       # [L, Kp/16, Np] stacked int32 words
    scales: jnp.ndarray,       # [L, Kp/32, Np] f32 per-32-row scales
    gamma: jnp.ndarray | None, # [L, Kp] RMSNorm weights (None = no norm)
    k_dim: int,
    n_dim: int,
    eps: float = 1e-5,
    glu: bool = False,
    resid: jnp.ndarray | None = None,   # [M, n_dim]
    lut_bias: bool = False,    # True: bitnet32 LUT {-2,-1,1,2}; False: TL
    interpret: bool = False,
    blocks: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Decode-shaped W2A8 bitnet32/TL matmul over one layer of stacked
    weight + scale arrays (see `_tl_w2a8_fused_kernel`).  Caller
    guarantees K == Kp (k_dim % 256 == 0), one M block, M ≤ 2 (the
    block-masked activation rows 8·M live in one 32-row i8 tile)."""
    M = x.shape[0]
    Kp = packed.shape[1] * 16
    Np = packed.shape[2]
    if k_dim != Kp:
        raise KernelError(
            f"TL w2a8 kernel needs k_dim == Kp ({k_dim} != {Kp}); "
            "use ternary_matmul_stacked_tl")
    if M > 2:
        raise KernelError(
            f"TL w2a8 kernel is decode-shaped (M <= 2, got {M}); "
            "use ternary_matmul_stacked_tl_fused")
    bm, bn, bkt = blocks or _pick_blocks_stacked(M, Kp, Np)
    bk = bkt * KT
    n_k = Kp // bk
    grid = (1, Np // bn, n_k)

    s = jnp.asarray(scales, jnp.float32)
    if s.shape[1] * 32 != Kp or s.shape[2] != Np:
        s = jnp.pad(s, ((0, 0), (0, Kp // 32 - s.shape[1]),
                        (0, Np - s.shape[2])))

    has_norm = gamma is not None
    g = (gamma.reshape(-1, 1, Kp).astype(jnp.float32) if has_norm
         else jnp.ones((1, 1, Kp), jnp.float32))
    g_map = ((lambda m, n, k, lr: (lr[0], 0, 0)) if has_norm
             else (lambda m, n, k, lr: (0, 0, 0)))
    in_specs = [
        pl.BlockSpec((M, x.shape[1]), lambda m, n, k, lr: (0, 0)),
        pl.BlockSpec((1, 1, Kp), g_map),
        pl.BlockSpec((1, bk // 16, bn), lambda m, n, k, lr: (lr[0], k, n)),
        pl.BlockSpec((1, bk // 32, bn), lambda m, n, k, lr: (lr[0], k, n)),
    ]
    operands = [x, g, packed, s]
    has_resid = resid is not None
    if has_resid:
        if resid.shape[1] != Np:
            resid = jnp.pad(resid, ((0, 0), (0, Np - resid.shape[1])))
        in_specs.append(pl.BlockSpec((M, bn), lambda m, n, k, lr: (0, n)))
        operands.append(resid)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[
            pltpu.VMEM((32, bn), jnp.float32),      # WIDE per-block acc
            pltpu.VMEM((32, Kp), jnp.int8),         # block-masked rows
            pltpu.VMEM((8, 1), jnp.float32),        # per-token scale
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _tl_w2a8_fused_stacked_kernel, n_k=n_k, bkt=bkt, eps=eps,
            has_norm=has_norm, glu=glu, has_resid=has_resid,
            lut_bias=lut_bias, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((bm, Np), x.dtype),
        grid_spec=gs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * Kp * Np,
            bytes_accessed=(Kp // 4) * Np + (Kp // 32) * Np * 4
            + bm * Np * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), *operands)
    return out[:M, :n_dim]


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "variant", "k_dim", "n_dim", "bm", "bn", "bkt",
                     "interpret", "out_dtype", "has_norm", "eps", "glu"),
)
def _ternary_matmul_2d(
    x: jnp.ndarray,            # [M, K] float
    packed: jnp.ndarray,       # [Kp/16, Np] int32 words
    scales: jnp.ndarray,       # [] scalar (qk256) or [K/32, Np] (bitnet32)
    kind: str,
    variant: str,              # 'pallas' (bf16) | 'w2a8' | 'w2a8_normed'
    k_dim: int,
    n_dim: int,
    bm: int,
    bn: int,
    bkt: int,
    interpret: bool,
    out_dtype,
    gamma: jnp.ndarray | None = None,   # [K] RMSNorm weight (w2a8_normed)
    has_norm: bool = False,
    eps: float = 1e-5,
    glu: bool = False,                  # x = gate|up ([M, 2K], w2a8_normed)
    resid: jnp.ndarray | None = None,   # [M, N] residual (w2a8_normed)
) -> jnp.ndarray:
    M, K = x.shape
    if glu:
        K //= 2
    Kp = packed.shape[0] * 16
    Np = packed.shape[1]
    bk = bkt * KT

    if K != Kp and not glu:  # pad K → Kp (padded rows are code 0)
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Kp - K)))
    Mp = -(-M // bm) * bm

    n_m, n_n, n_k = Mp // bm, Np // bn, Kp // bk
    grid = (n_m, n_n, n_k)

    w_spec = pl.BlockSpec((bk // 16, bn), lambda m, n, k: (k, n),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0),
                            memory_space=pltpu.VMEM)

    flops = 2 * Mp * Kp * Np
    bytes_accessed = Mp * Kp * 2 + (Kp // 4) * Np + Mp * Np * 4

    if variant == "w2a8_normed":
        # norm+quantize fused into the matmul kernel (decode shapes only:
        # caller guarantees kind=='qk256', one M block, K==Kp)
        assert kind == "qk256" and n_m == 1 and K == Kp
        s = jnp.asarray(scales, jnp.float32)
        vecscale = s.ndim >= 2
        if vecscale:
            s = s.reshape(1, -1)
            if s.shape[1] != Np:
                s = jnp.pad(s, ((0, 0), (0, Np - s.shape[1])),
                            constant_values=1.0)
            s_spec = pl.BlockSpec((1, bn), lambda m, n, k: (0, n),
                                  memory_space=pltpu.VMEM)
        else:
            s = s.reshape(1, 1)
            s_spec = pl.BlockSpec((1, 1), lambda m, n, k: (0, 0),
                                  memory_space=pltpu.SMEM)
        g = (jnp.asarray(gamma, jnp.float32).reshape(1, Kp)
             if has_norm else jnp.ones((1, Kp), jnp.float32))
        in_specs = [
            pl.BlockSpec((M, x.shape[1]), lambda m, n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda m, n, k: (0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            s_spec,
        ]
        operands = [x, g, packed, s]
        has_resid = resid is not None
        if has_resid:
            if resid.shape[1] != Np:
                resid = jnp.pad(resid, ((0, 0), (0, Np - resid.shape[1])))
            in_specs.append(pl.BlockSpec((M, bn), lambda m, n, k: (0, n),
                                         memory_space=pltpu.VMEM))
            operands.append(resid)
        out = pl.pallas_call(
            functools.partial(
                _qk256_w2a8_normed_kernel, n_k=n_k, bkt=bkt, eps=eps,
                has_norm=has_norm, vecscale=vecscale, glu=glu,
                has_resid=has_resid, interpret=interpret),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((bm, bn), jnp.int32),      # accumulator
                pltpu.VMEM((bm, Kp), jnp.int8),       # quantized activations
                pltpu.VMEM((bm, 1), jnp.float32),     # per-token scale
                pltpu.VMEM((bm, 1), jnp.int32),       # zero-point sums
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=bytes_accessed,
                transcendentals=0),
            interpret=interpret,
        )(*operands)
        return out[:M, :n_dim]

    use_w2a8 = variant == "w2a8" and kind == "qk256"
    if use_w2a8:
        # per-token absmax int8 quantization (BitNet W2A8 recipe)
        xf = x.astype(jnp.float32)
        absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                             1e-8)
        sx = absmax / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        sumq = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        xq = _pad_to(xq, 0, bm)
        sumq = _pad_to(sumq, 0, bm)
        sx = _pad_to(sx, 0, bm)
        x_in, sum_in, sx_in = xq, sumq, sx
        x_spec = pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                              memory_space=pltpu.VMEM)
        acc_dtype = jnp.int32
    else:
        xb = x.astype(jnp.bfloat16)
        # the bias correction must sum the SAME values the MXU multiplies:
        # the bf16-rounded activations, accumulated in f32
        sumx = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
        x_in = _pad_to(xb, 0, bm)
        sum_in = _pad_to(sumx, 0, bm)
        sx_in = None
        x_spec = pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                              memory_space=pltpu.VMEM)
        acc_dtype = jnp.float32

    if kind == "qk256":
        s = jnp.asarray(scales, jnp.float32)
        vecscale = s.ndim >= 2
        if vecscale:       # per-column scale vector (fused projections)
            s = s.reshape(1, -1)
            if s.shape[1] != Np:   # pad scale cols with 1s (lane padding)
                s = jnp.pad(s, ((0, 0), (0, Np - s.shape[1])),
                            constant_values=1.0)
            s_spec = pl.BlockSpec((1, bn), lambda m, n, k: (0, n),
                                  memory_space=pltpu.VMEM)
        else:
            s = s.reshape(1, 1)
            s_spec = pl.BlockSpec((1, 1), lambda m, n, k: (0, 0),
                                  memory_space=pltpu.SMEM)
        if use_w2a8:
            kernel = functools.partial(
                _qk256_w2a8_kernel, n_k=n_k, bkt=bkt, interpret=interpret,
                vecscale=vecscale)
            in_specs = [x_spec, w_spec, col_spec, col_spec, s_spec]
            operands = (x_in, packed, sum_in, sx_in, s)
        else:
            kernel = functools.partial(
                _qk256_kernel, n_k=n_k, bkt=bkt, interpret=interpret,
                vecscale=vecscale)
            in_specs = [x_spec, w_spec, col_spec, s_spec]
            operands = (x_in, packed, sum_in, s)
    elif kind in ("bitnet32", "tl"):
        # pad scales along K-blocks to Kp/32
        s = jnp.asarray(scales, jnp.float32)
        if s.shape[0] * 32 != Kp:
            s = jnp.pad(s, ((0, Kp // 32 - s.shape[0]), (0, 0)))
        s_spec = pl.BlockSpec((bk // 32, bn), lambda m, n, k: (k, n),
                              memory_space=pltpu.VMEM)
        # bias correction 2·(sum32 @ s) precomputed in XLA (exact: HIGHEST
        # precision f32 MXU) — sums over the same bf16-rounded values the
        # main dot consumes.  TL shares zero-point 2, so the identical
        # correction applies (value = code − 2, tl1.rs reverse table).
        sum32 = jnp.sum(
            x_in.astype(jnp.float32).reshape(Mp, Kp // 32, 32), axis=-1)
        corr = 2.0 * jnp.matmul(sum32, s,
                                precision=jax.lax.Precision.HIGHEST)
        corr_spec = pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                                 memory_space=pltpu.VMEM)
        kernel = functools.partial(_bitnet32_kernel, n_k=n_k, bkt=bkt,
                                   interpret=interpret,
                                   lut_bias=kind == "bitnet32")
        in_specs = [x_spec, w_spec, s_spec, corr_spec]
        operands = (x_in, packed, s, corr)
    else:
        raise KernelError(f"unknown ternary kind {kind!r}")

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:M, :n_dim]


def _pick_blocks_stacked(M: int, Kp: int, Np: int) -> tuple[int, int, int]:
    """(bm, bn, bkt) for the stacked decode kernels — v5e sweep
    (2026-08-17, within-run comparisons): whole-N blocks win at every
    decode shape (qkv 1.08×, gateup 1.07× of the HBM floor), and bkt
    wants the K-block ≤ ~1280 rows AND ≤ ~2 MB packed (gateup bkt=2 beat
    5; down bkt=3 beat 9/27).  BITNET_BKT_ROWCAP / BITNET_BKT_MBCAP
    override the caps for in-model sweeps."""
    import os as _os

    rowcap = int(_os.environ.get("BITNET_BKT_ROWCAP", "1280"))
    mbcap = float(_os.environ.get("BITNET_BKT_MBCAP", "2"))
    bm = max(16, -(-M // 8) * 8)
    bn = Np if Np <= 14336 else _largest_divisor(Np, 7168, 128)
    nk = Kp // KT
    bkt = 1
    for d in range(1, nk + 1):
        if nk % d or nk // d < 2 and nk != 1:
            continue
        if d * KT <= rowcap and d * 16 * bn * 4 <= mbcap * (1 << 20):
            bkt = d
    return bm, bn, bkt


def _largest_divisor(x: int, cap: int, mult: int) -> int:
    """Largest d ≤ cap with d | x and d % mult == 0 (falls back to mult)."""
    best = mult
    d = mult
    while d <= min(x, cap):
        if x % d == 0:
            best = d
        d += mult
    return best


def _pick_blocks(M: int, Kp: int, Np: int, variant: str
                 ) -> tuple[int, int, int]:
    """(bm, bn, bkt) — empirically tuned on v5e (sweep logs in commit
    history + experiments/exp_w2a8.py P5).  Decode (M≤32) is VPU-unpack +
    DMA-pipeline bound: widest lane-aligned N block, K split so the grid
    keeps ≥2 K-steps (Pallas double-buffers across grid steps — a
    single-step grid can't overlap DMA with compute).  Prefill wants one
    M block so each weight tile is unpacked exactly once.
    """
    nk = Kp // KT
    if M <= max(32, stacked_decode_max_m()):
        bm = max(16, -(-M // 8) * 8)
        # w2a8 decode sweep favored much wider N blocks than bf16
        bn_cap = 7168 if variant == "w2a8" else 2560
        bn = _largest_divisor(Np, bn_cap, 128)
        # largest divisor of nk with packed block ≤ ~1.6 MB that still
        # leaves ≥2 K grid steps for pipelining
        cap = max(1, (16 * (1 << 20)) // (10 * 64 * bn))
        bkt = 1
        for d in range(1, nk + 1):
            if nk % d == 0 and d <= cap and (nk // d >= 2 or nk == 1):
                bkt = d
        return bm, bn, bkt
    bm = -(-M // 16) * 16 if M <= 512 else 512
    # bn: largest lane-aligned divisor of Np up to 2304 columns
    bn = _largest_divisor(Np, 2304, 128)
    # bkt: largest divisor of the K-tile count with packed block ≤ ~1 MB
    cap = max(1, (1 << 20) // (64 * bn))
    bkt = 1
    for d in range(1, min(nk, 8) + 1):
        if nk % d == 0 and d <= cap:
            bkt = d
    # keep the f32 accumulator ≤ ~5 MB
    while bm * bn * 4 > 5 * (1 << 20) and bm > 64:
        bm //= 2
    return bm, bn, bkt


def ternary_matmul_pallas(lin, x: jnp.ndarray,
                          interpret: bool | None = None,
                          variant: str = "pallas",
                          gamma: jnp.ndarray | None = None,
                          eps: float = 1e-5,
                          glu: bool = False,
                          resid: jnp.ndarray | None = None) -> jnp.ndarray:
    """``y = x @ W`` with W packed ternary — fused unpack+MXU kernel.

    ``lin``: ops.linear.TernaryLinear (kind 'qk256' or 'bitnet32');
    ``x``: [..., K] activations; ``variant``: 'pallas' (bf16-exact) or
    'w2a8' (int8 activations, qk256 only).  Returns [..., N] in x.dtype.

    ``gamma``: optional RMSNorm weight — computes ``(x @ W) of
    rms_norm(x, gamma)`` with the norm fused into the kernel's
    activation-quantize preamble on eligible w2a8 decode shapes, and
    falls back to an explicit XLA norm otherwise.  ``glu``: ``x`` is the
    raw gate|up projection ([..., 2K]); silu(gate)·up fuses into the
    same preamble.  ``resid``: [..., N] residual added in the epilogue.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    K = x.shape[-1] // 2 if glu else x.shape[-1]
    x2 = x.reshape(-1, x.shape[-1])
    M = x2.shape[0]

    Kp = lin.packed.shape[0] * 16
    Np = lin.packed.shape[1]
    bm, bn, bkt = _pick_blocks(M, Kp, Np, variant)

    scales = lin.scales if lin.scales is not None else jnp.float32(1.0)
    # decode shapes only (M ≤ 32): the fused preamble holds the whole
    # [M, K(·2)] activation row in VMEM — a prefill-sized M would blow
    # the VMEM budget (observed: M=512 × 2F f32 failed to compile)
    if (variant == "w2a8" and lin.kind == "qk256"
            and M <= stacked_decode_max_m() and M <= bm and K == Kp):
        # norm (if any) + quantize (+ SwiGLU / residual) fused in-kernel —
        # decode is launch-overhead bound (exp_fixed_ops.py S1)
        y = _ternary_matmul_2d(
            x2, lin.packed, scales, kind=lin.kind, variant="w2a8_normed",
            k_dim=lin.k, n_dim=lin.n,
            bm=bm, bn=bn, bkt=bkt, interpret=interpret, out_dtype=x.dtype,
            gamma=gamma, has_norm=gamma is not None, eps=eps, glu=glu,
            resid=None if resid is None else resid.reshape(-1, lin.n),
        )
        return y.reshape(*lead, lin.n)
    if glu:
        x2 = jax.nn.silu(x2[:, :K]) * x2[:, K:]
    if gamma is not None:
        from .rmsnorm import rms_norm

        x2 = rms_norm(x2, gamma, eps)
    y = _ternary_matmul_2d(
        x2, lin.packed, scales, kind=lin.kind, variant=variant,
        k_dim=lin.k, n_dim=lin.n,
        bm=bm, bn=bn, bkt=bkt, interpret=interpret, out_dtype=x.dtype,
    )
    if resid is not None:
        y = y + resid.reshape(-1, lin.n)
    return y.reshape(*lead, lin.n)
