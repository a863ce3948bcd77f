"""Fused ternary (2-bit) matmul Pallas kernels for the TPU MXU.

This is the TPU replacement for the reference's entire multi-backend kernel
matrix (``bitnet-kernels/src/cpu/x86.rs`` AVX2/AVX-512 ``matmul_i2s``,
``src/gpu/kernels/bitnet_kernels.cu`` ``bitnet_matmul_i2s``, and the
OpenCL/Metal/Vulkan/HIP/WGSL clones): ONE kernel family instead of seven
backends.

Design (SURVEY.md §7 P2):
- ternary codes stay **packed in HBM** (4 codes/byte, tile-local interleave
  from ops/linear.py); the kernel unpacks 2-bit→int8 in VMEM with
  shift/mask — no gather, no LUT table walk (the AVX2 nibble-LUT approach
  translates to pure VPU arithmetic: ``v = c + (c>=2) - 2``);
- the MXU consumes the dequantized tile directly from VMEM: bf16 x bf16 →
  f32 accumulate (per-block-scaled BitNet32) or the values themselves for
  QK256 no-scale;
- grid (M/BM, N/BN, K/BK) with K innermost; the f32 accumulator lives in
  VMEM scratch across the K sweep; Pallas double-buffers the HBM→VMEM
  streams automatically.

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
DEFAULT_BM = 512
DEFAULT_BN = 512
DEFAULT_BKT = 4          # K-subtiles per grid step (BK = BKT * 256)


def _unpack_subtile(p32: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[KT/4, BN] int32 bytes → [KT, BN] ternary-LUT values in ``dtype``.

    Tile-local interleave (ops/linear.py): code plane j of byte row i is
    logical row ``j*(KT/4) + i``; concatenating the four shift planes along
    the sublane axis reconstructs the contiguous K-subtile.
    LUT {-2,-1,1,2} realized as ``v = c + (c>=2) - 2`` (no gather; Mosaic
    vector arith needs i32/i16, so codes are widened before math).
    """
    planes = [(p32 >> (2 * j)) & 3 for j in range(4)]
    c = jnp.concatenate(planes, axis=0)           # [KT, BN] int32 codes
    v = c + (c >= 2).astype(jnp.int32) - 2        # {-2,-1,1,2}
    return v.astype(dtype)


# --------------------------------------------------------------------------
# QK256 kernel (no per-block scales; optional per-tensor scalar)
# --------------------------------------------------------------------------
def _qk256_kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref,
                  *, n_k: int, bkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # loop over the BKT interleave subtiles of this K-block; each unpacks
    # independently and feeds one MXU pass (K=256 contraction)
    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 4), KT // 4), :].astype(jnp.int32)
        w = _unpack_subtile(p32, jnp.bfloat16)    # [KT, BN]
        acc_ref[:] += jnp.dot(
            x_ref[:, pl.ds(t * KT, KT)], w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[0, 0]).astype(out_ref.dtype)


# --------------------------------------------------------------------------
# QK256 kernel with per-column scales (fused QKV / gate+up projections)
# --------------------------------------------------------------------------
def _qk256_vecscale_kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref,
                           *, n_k: int, bkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 4), KT // 4), :].astype(jnp.int32)
        w = _unpack_subtile(p32, jnp.bfloat16)
        acc_ref[:] += jnp.dot(
            x_ref[:, pl.ds(t * KT, KT)], w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[0, :][None, :]).astype(
            out_ref.dtype)


# --------------------------------------------------------------------------
# BitNet32 kernel (per-32-row f32 scales)
# --------------------------------------------------------------------------
def _bitnet32_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref,
                     *, n_k: int, bkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for t in range(bkt):
        p32 = w_ref[pl.ds(t * (KT // 4), KT // 4), :].astype(jnp.int32)
        v = _unpack_subtile(p32, jnp.float32)     # [KT, BN]
        s = s_ref[pl.ds(t * (KT // 32), KT // 32), :]   # [KT/32, BN] f32
        # elementwise row-repeat ×32 (NOT pltpu.repeat, which tiles copies)
        s32 = jnp.broadcast_to(
            s[:, None, :], (s.shape[0], 32, s.shape[1])
        ).reshape(s.shape[0] * 32, s.shape[1])
        w = (v * s32).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(
            x_ref[:, pl.ds(t * KT, KT)], w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


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
    static_argnames=("kind", "k_dim", "n_dim", "bm", "bn", "bkt",
                     "interpret", "out_dtype"),
)
def _ternary_matmul_2d(
    x: jnp.ndarray,            # [M, K] float
    packed: jnp.ndarray,       # [Kp/4, Np] uint8
    scales: jnp.ndarray,       # [] scalar (qk256) or [K/32, Np] (bitnet32)
    kind: str,
    k_dim: int,
    n_dim: int,
    bm: int,
    bn: int,
    bkt: int,
    interpret: bool,
    out_dtype,
) -> jnp.ndarray:
    M, K = x.shape
    Kp = packed.shape[0] * 4
    Np = packed.shape[1]
    bk = bkt * KT

    x = x.astype(jnp.bfloat16)
    if K != Kp:  # pad K → Kp (padded weight rows hit zero activations)
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    Mp = -(-M // bm) * bm
    x = _pad_to(x, 0, bm)

    n_m, n_n, n_k = Mp // bm, Np // bn, Kp // bk
    grid = (n_m, n_n, n_k)

    x_spec = pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bk // 4, bn), lambda m, n, k: (k, n),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                            memory_space=pltpu.VMEM)

    flops = 2 * Mp * Kp * Np
    bytes_accessed = Mp * Kp * 2 + (Kp // 4) * Np + Mp * Np * 4

    if kind == "qk256":
        s = jnp.asarray(scales, jnp.float32)
        if s.ndim >= 2:        # per-column scale vector (fused projections)
            kernel = functools.partial(_qk256_vecscale_kernel, n_k=n_k,
                                       bkt=bkt)
            s = s.reshape(1, -1)
            if s.shape[1] != Np:   # pad scale cols with 1s (lane padding)
                s = jnp.pad(s, ((0, 0), (0, Np - s.shape[1])),
                            constant_values=1.0)
            s_spec = pl.BlockSpec((1, bn), lambda m, n, k: (0, n),
                                  memory_space=pltpu.VMEM)
            operands = (x, packed, s)
        else:
            kernel = functools.partial(_qk256_kernel, n_k=n_k, bkt=bkt)
            s_spec = pl.BlockSpec((1, 1), lambda m, n, k: (0, 0),
                                  memory_space=pltpu.SMEM)
            operands = (x, packed, s.reshape(1, 1))
    elif kind == "bitnet32":
        kernel = functools.partial(_bitnet32_kernel, n_k=n_k, bkt=bkt)
        # pad scales along K-blocks to Kp/32
        s = jnp.asarray(scales, jnp.float32)
        if s.shape[0] * 32 != Kp:
            s = jnp.pad(s, ((0, Kp // 32 - s.shape[0]), (0, 0)))
        s_spec = pl.BlockSpec((bk // 32, bn), lambda m, n, k: (k, n),
                              memory_space=pltpu.VMEM)
        operands = (x, packed, s)
    else:
        raise KernelError(f"unknown ternary kind {kind!r}")

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=grid,
        in_specs=[x_spec, w_spec, s_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:M, :n_dim]


def _largest_divisor(x: int, cap: int, mult: int) -> int:
    """Largest d ≤ cap with d | x and d % mult == 0 (falls back to mult)."""
    best = mult
    d = mult
    while d <= min(x, cap):
        if x % d == 0:
            best = d
        d += mult
    return best


def _pick_blocks(M: int, Kp: int, Np: int) -> tuple[int, int, int]:
    """(bm, bn, bkt) — empirically tuned on v5e (sweep logs in commit
    history).  Decode (M≤32) is VPU-unpack + DMA-pipeline bound: widest
    lane-aligned N block up to 2560, K split so the grid keeps ≥2 K-steps
    (Pallas double-buffers across grid steps — a single-step grid can't
    overlap DMA with compute: 2560² went 13.8→10.1 µs, 6912×2560 went
    48.7→20.3 µs with this rule).  Prefill wants one M block so each
    weight tile is unpacked exactly once (512/768/5 ≈ 82% of v5e bf16
    peak).
    """
    nk = Kp // KT
    if M <= 32:
        bm = max(16, -(-M // 8) * 8)
        bn = _largest_divisor(Np, 2560, 128)
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
                          interpret: bool | None = None) -> jnp.ndarray:
    """``y = x @ W`` with W packed ternary — fused unpack+MXU kernel.

    ``lin``: ops.linear.TernaryLinear (kind 'qk256' or 'bitnet32');
    ``x``: [..., K] activations. Returns [..., N] in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    Kp = lin.packed.shape[0] * 4
    Np = lin.packed.shape[1]
    bm, bn, bkt = _pick_blocks(M, Kp, Np)

    scales = lin.scales if lin.scales is not None else jnp.float32(1.0)
    y = _ternary_matmul_2d(
        x2, lin.packed, scales, kind=lin.kind, k_dim=lin.k, n_dim=lin.n,
        bm=bm, bn=bn, bkt=bkt, interpret=interpret, out_dtype=x.dtype,
    )
    return y.reshape(*lead, lin.n)
