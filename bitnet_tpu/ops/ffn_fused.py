"""Fused W2A8 FFN kernel: gate|up matmul + SiLU·up + down matmul in ONE
Pallas call.

Decode is launch-overhead bound (~8 µs of fixed cost per pallas call on
v5e, measured by the 30-layer stack ablation); the FFN is two of the four
matmul calls per layer AND an HBM round-trip of the [M, 2F] intermediate.
This kernel streams the fused gate|up weights and the down weights
tile-by-tile over the F axis: per F-tile it computes the gate/up slices,
applies SiLU·up, re-quantizes the activation tile to int8 (per-token
PER-TILE absmax — a finer grid than the unfused per-row quant, so logits
differ at int8-noise level), and accumulates the down product into a
[M, H] f32 scratch.

Not applicable when the model has a ``ffn_sub_norm`` (the 2B-4T
sub-layernorm normalizes over the FULL F row before down_proj); callers
fall back to the unfused path there.

Reference: this collapses ``FeedForward::forward`` (lib.rs:723-793) plus
two ``KernelProvider.matmul_i2s`` dispatches into one TPU kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ternary_matmul import KT, _unpack_words_biased_i8


def _ffn_kernel(xq_ref, sumq_ref, sx_ref, wg_ref, wu_ref, sg_ref, su_ref,
                wd_ref, sd_ref, out_ref, acc_ref,
                *, n_f: int, kp: int, bf: int, interpret: bool):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # --- gate/up slices: full-K contraction, int8 MXU ---
    # unpack ALL K-subtiles first and issue ONE dot — many narrow dots
    # cost ~0.1-0.2 µs each in MXU pipeline overhead (v5e: the split-dot
    # version regressed decode by ~1 ms over 30 layers)
    def mm_full_k(w_ref):
        tiles = [
            _unpack_words_biased_i8(
                w_ref[t * (KT // 16):(t + 1) * (KT // 16), :], interpret)
            for t in range(kp // KT)
        ]
        w = jnp.concatenate(tiles, axis=0)                # [kp, bf] i8
        return jnp.dot(xq_ref[:], w,
                       preferred_element_type=jnp.int32)  # [bm, bf] i32

    sumq = sumq_ref[:]                                    # [bm, 1] i32
    sx = sx_ref[:].astype(jnp.float32)                    # [bm, 1]
    y_g = ((mm_full_k(wg_ref) - 2 * sumq).astype(jnp.float32)
           * sx * sg_ref[0, :][None, :])
    y_u = ((mm_full_k(wu_ref) - 2 * sumq).astype(jnp.float32)
           * sx * su_ref[0, :][None, :])
    act = y_g * jax.nn.sigmoid(y_g) * y_u                 # SiLU(g) · u

    # --- per-token per-tile int8 requantization ---
    amax = jnp.maximum(jnp.max(jnp.abs(act), axis=1, keepdims=True), 1e-8)
    sa = amax / 127.0
    aq = jnp.clip(jnp.round(act / sa), -127, 127).astype(jnp.int8)
    sq2 = jnp.sum(aq.astype(jnp.int32), axis=1, keepdims=True)

    # --- down tile: contraction over this F-tile (one dot) ---
    wd_tiles = [
        _unpack_words_biased_i8(
            wd_ref[t * (KT // 16):(t + 1) * (KT // 16), :], interpret)
        for t in range(bf // KT)
    ]
    wd = jnp.concatenate(wd_tiles, axis=0)                # [bf, Hp] i8
    dacc = jnp.dot(aq, wd, preferred_element_type=jnp.int32)
    acc_ref[:] += ((dacc - 2 * sq2).astype(jnp.float32)
                   * sa * sd_ref[0, :][None, :])

    @pl.when(f == n_f - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_bf(F: int) -> int:
    """Largest 256-multiple divisor of F giving ≥4 grid steps (DMA
    pipelining), else the largest divisor at all."""
    cands = [d for d in range(KT, F + 1, KT) if F % d == 0]
    for d in reversed(cands):
        if F // d >= 4:
            return d
    return cands[0] if cands else 0


def ffn_fused_supported(gateup, down, F: int, M: int) -> bool:
    return (gateup is not None and gateup.kind == "qk256"
            and down.kind == "qk256" and F % KT == 0
            and down.packed.shape[0] * 16 == -(-F // KT) * KT
            and M <= 32 and _pick_bf(F) > 0)


@functools.partial(jax.jit,
                   static_argnames=("k_dim", "f_dim", "n_dim", "interpret"))
def ffn_w2a8_fused(
    x: jnp.ndarray,            # [M, K] activations (post-ffn_norm)
    gu_packed: jnp.ndarray,    # [Kp/16, 2Fp] int32 (fused gate|up)
    gu_scales: jnp.ndarray,    # [..., 1, 2Fp] per-column scales
    d_packed: jnp.ndarray,     # [Fp/16, Hp] int32
    d_scale: jnp.ndarray,      # scalar or [..., 1, Hp] per-column scales
    k_dim: int,
    f_dim: int,
    n_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = (silu(x@Wg) * (x@Wu)) @ Wd, all ternary-packed, one kernel."""
    M, K = x.shape
    Kp = gu_packed.shape[0] * 16
    Fp = f_dim                       # fused layout: [gate(F) | up(F)]
    Hp = d_packed.shape[1]
    bm = max(16, -(-M // 8) * 8)
    bf = _pick_bf(Fp)
    n_f = Fp // bf

    xf = x.astype(jnp.float32)
    if K != Kp:
        xf = jnp.pad(xf, ((0, 0), (0, Kp - K)))
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
    sx = absmax / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    sumq = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    Mp = -(-M // bm) * bm
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sumq = jnp.pad(sumq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)

    sg = jnp.asarray(gu_scales, jnp.float32).reshape(1, -1)
    sd = jnp.asarray(d_scale, jnp.float32).reshape(1, -1)
    if sd.shape[1] == 1:          # scalar per-tensor scale
        sd = jnp.broadcast_to(sd, (1, Hp))
    elif sd.shape[1] != Hp:       # lane padding
        sd = jnp.pad(sd, ((0, 0), (0, Hp - sd.shape[1])),
                     constant_values=1.0)

    col = pl.BlockSpec((bm, 1), lambda f: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, n_f=n_f, kp=Kp, bf=bf,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((Mp, Hp), x.dtype),
        grid=(n_f,),
        in_specs=[
            pl.BlockSpec((bm, Kp), lambda f: (0, 0),
                         memory_space=pltpu.VMEM),            # xq
            col,                                              # sumq
            col,                                              # sx
            pl.BlockSpec((Kp // 16, bf), lambda f: (0, f),
                         memory_space=pltpu.VMEM),            # W_gate tile
            pl.BlockSpec((Kp // 16, bf), lambda f, _n=n_f: (0, f + _n),
                         memory_space=pltpu.VMEM),            # W_up tile
            pl.BlockSpec((1, bf), lambda f: (0, f),
                         memory_space=pltpu.VMEM),            # gate scales
            pl.BlockSpec((1, bf), lambda f, _n=n_f: (0, f + _n),
                         memory_space=pltpu.VMEM),            # up scales
            pl.BlockSpec((bf // 16, Hp), lambda f: (f, 0),
                         memory_space=pltpu.VMEM),            # W_down tile
            pl.BlockSpec((1, Hp), lambda f: (0, 0),
                         memory_space=pltpu.VMEM),            # down scales
        ],
        out_specs=pl.BlockSpec((bm, Hp), lambda f: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * 2 * Fp + 2 * Mp * Fp * Hp,
            bytes_accessed=(Kp // 4) * 2 * Fp + (Fp // 4) * Hp,
            transcendentals=Mp * Fp),
        interpret=interpret,
    )(xq, sumq, sx, gu_packed,
      gu_packed, sg, sg,
      d_packed, sd)
    return out[:M, :n_dim]
