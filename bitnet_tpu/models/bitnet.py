"""Functional BitNet transformer forward pass (pure JAX).

Architecture parity with ``TransformerModel``
(``crates/bitnet-transformer/src/lib.rs:1259-1650``): embed → N × (RMSNorm →
GQA attention with RoPE → residual → RMSNorm → SwiGLU FFN → residual) →
RMSNorm → logits (tied embeddings or separate ``output.weight``).

TPU-first design decisions (vs the reference's per-layer object graph):
- layer parameters are **stacked** on a leading L axis and the layer loop is
  a single ``lax.scan`` — one compiled block body regardless of depth;
- the KV cache rides through the scan as per-layer xs/ys, so each layer's
  cache update stays on-chip with its block;
- everything is static-shape: queries are padded to a bucket, the cache is a
  fixed [S] ring buffer, padded cache writes are dropped via an
  out-of-bounds index (position == S).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import attention
from ..ops.linear import TernaryLinear, linear_apply, linear_apply_normed
from ..ops.rmsnorm import rms_norm
from ..ops.rope import apply_rope


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "attn_norm", "wq", "wk", "wv", "wo",
        "ffn_norm", "w_gate", "w_up", "w_down",
        "wqkv", "w_gateup", "attn_sub_norm", "ffn_sub_norm",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class BlockParams:
    """Per-layer parameters, stacked on a leading [L] axis.

    ``wqkv`` / ``w_gateup`` are optional fused projections (one kernel
    call for q|k|v and gate|up — see ops.linear.concat_linears and
    fuse_block_params); when present, block_forward prefers them and the
    unfused fields may be None.

    ``attn_sub_norm`` / ``ffn_sub_norm`` are the BitNet b1.58 2B-4T
    sub-layernorms: RMSNorm on the attention output before o_proj and on
    the SwiGLU product before down_proj.  The reference only *maps* these
    tensor names (weight_mapper.rs:260-270) and never applies them — we
    apply them, which is required for logits parity with bitnet.cpp on
    the real 2B-4T checkpoint.
    """

    attn_norm: jnp.ndarray     # [L, H]
    wq: Optional[TernaryLinear]          # [L, H, nh*D]
    wk: Optional[TernaryLinear]          # [L, H, nkv*D]
    wv: Optional[TernaryLinear]          # [L, H, nkv*D]
    wo: TernaryLinear          # [L, nh*D, H]
    ffn_norm: jnp.ndarray      # [L, H]
    w_gate: Optional[TernaryLinear]      # [L, H, F]
    w_up: Optional[TernaryLinear]        # [L, H, F]
    w_down: TernaryLinear      # [L, F, H]
    wqkv: Optional[TernaryLinear] = None      # [L, H, (nh+2*nkv)*D]
    w_gateup: Optional[TernaryLinear] = None  # [L, H, 2*F]
    attn_sub_norm: Optional[jnp.ndarray] = None   # [L, nh*D]
    ffn_sub_norm: Optional[jnp.ndarray] = None    # [L, F]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "blocks", "final_norm", "lm_head",
                 "rope_sin", "rope_cos", "embed_q", "embed_q_scale"],
    meta_fields=[],
)
@dataclasses.dataclass
class BitNetParams:
    embed: jnp.ndarray                 # [V, H]
    blocks: BlockParams
    final_norm: jnp.ndarray            # [H]
    lm_head: Optional[TernaryLinear]   # None when tied
    rope_sin: jnp.ndarray              # [S_rope, D/2]
    rope_cos: jnp.ndarray              # [S_rope, D/2]
    # optional int8 tied-logits head (quantize_head): the decode LM head
    # is HBM-bound on the [V, H] table read — int8 halves the bytes
    embed_q: Optional[jnp.ndarray] = None        # [V, H] int8
    embed_q_scale: Optional[jnp.ndarray] = None  # [V] f32 per-row scales


def quantize_head(params: BitNetParams) -> BitNetParams:
    """Attach an int8 per-row-quantized copy of the tied embedding for the
    logits projection (EngineConfig ``logits_dtype='int8'``).  The f32/bf16
    table stays for token embedding lookups; the head read halves."""
    if params.lm_head is not None:
        return params   # untied head: already a ternary linear
    emb = params.embed.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(emb), axis=1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(emb / scale[:, None]), -127, 127).astype(jnp.int8)
    return dataclasses.replace(params, embed_q=q, embed_q_scale=scale)


def fuse_block_params(blocks: BlockParams) -> BlockParams:
    """Fuse q|k|v and gate|up into single projections (decode at M=1 is
    launch- and DMA-bound; 7 kernel calls/layer become 4).  Falls back to
    the unfused params — LOUDLY — when widths aren't 128-aligned or kinds
    differ (a silent fallback would degrade every decode to the 7-call
    path with no trace); anything other than those known alignment
    conditions propagates."""
    from ..errors import QuantizationError
    from ..ops.linear import concat_linears

    try:
        wqkv = concat_linears([blocks.wq, blocks.wk, blocks.wv])
        w_gateup = concat_linears([blocks.w_gate, blocks.w_up])
    except QuantizationError as e:
        from ..obs.warn_once import warn_once

        warn_once(
            f"projection fusion disabled — decode runs the unfused 7-call "
            f"path: {e}")
        return blocks
    return dataclasses.replace(blocks, wqkv=wqkv, w_gateup=w_gateup,
                               wq=None, wk=None, wv=None,
                               w_gate=None, w_up=None,
                               wo=_colvec_scales(blocks.wo),
                               w_down=_colvec_scales(blocks.w_down))


def _colvec_scales(lin: TernaryLinear) -> TernaryLinear:
    """Stacked qk256 scalar-per-layer scales → per-column ``[L, 1, Np]``
    vectors, fixed at fuse (load) time.  concat_linears already produces
    this form for wqkv/w_gateup; normalizing wo/w_down too makes the
    decode/prefill scale-vector prep (_scale_vec) a free reshape of a
    parameter instead of a per-step broadcast materialized as a fresh
    pallas operand."""
    s = lin.scales
    if (lin.kind != "qk256" or lin.packed is None or lin.packed.ndim != 3
            or s is None or jnp.ndim(s) != 1):
        return lin
    L, Np = lin.packed.shape[0], lin.packed.shape[2]
    vec = jnp.broadcast_to(
        jnp.asarray(s, jnp.float32).reshape(L, 1, 1), (L, 1, Np))
    return dataclasses.replace(lin, scales=vec)


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "silu":
        return jax.nn.silu(x)
    if name == "relu2":
        r = jax.nn.relu(x)
        return r * r
    if name == "gelu":
        return jax.nn.gelu(x)
    raise ValueError(f"unknown hidden_act {name!r}")


def _ffn(cfg: ModelConfig, bp: "BlockParams", x: jnp.ndarray,
         kernel_path: str) -> jnp.ndarray:
    """SwiGLU FFN (reference lib.rs:751-793); ``x`` is the PRE-norm
    residual and the return value INCLUDES it (``x + down(...)``) —
    ffn_norm, the 2B-4T ffn_sub_norm, the SwiGLU activation, and the
    residual add all fuse into the gate/up and down projection kernels
    (quantize-preamble / epilogue fusion).

    On the w2a8 path (SiLU models without the 2B-4T ffn_sub_norm, which
    normalizes over the full F row) the whole FFN runs as ONE fused
    Pallas kernel (ops/ffn_fused.py) — decode is launch-overhead bound.
    """
    from functools import partial as _p

    import os as _os

    B, T, H = x.shape
    lapn = _p(linear_apply_normed, eps=cfg.rms_norm_eps, path=kernel_path)
    # opt-in: measured on v5e the fused-FFN kernel LOSES to the two tuned
    # standalone kernels at B=1 (2.76 vs 2.57 ms/token — its F-tiled
    # streams overlap worse than the wide-N dedicated blocks); kept for
    # future tuning and for launch-bound hosts
    if (_os.environ.get("BITNET_FUSED_FFN") == "1"
            and kernel_path == "w2a8" and cfg.hidden_act == "silu"
            and bp.ffn_sub_norm is None and bp.w_gateup is not None):
        from ..ops.ffn_fused import ffn_fused_supported, ffn_w2a8_fused

        h = rms_norm(x, bp.ffn_norm, cfg.rms_norm_eps)
        F = bp.w_gateup.n // 2
        if (ffn_fused_supported(bp.w_gateup, bp.w_down, F, B * T)
                and bp.w_gateup.packed.shape[1] == 2 * F):
            y = ffn_w2a8_fused(
                h.reshape(B * T, H), bp.w_gateup.packed,
                bp.w_gateup.scales, bp.w_down.packed,
                (bp.w_down.scales if bp.w_down.scales is not None
                 else jnp.float32(1.0)),
                k_dim=H, f_dim=F, n_dim=bp.w_down.n,
                interpret=jax.default_backend() != "tpu")
            return x + y.reshape(B, T, bp.w_down.n)
    if bp.w_gateup is not None:
        gu = lapn(bp.w_gateup, x, bp.ffn_norm)     # ONE fused kernel call
        if cfg.hidden_act == "silu":
            # silu(gate)·up + ffn_sub_norm + quantize + residual: ONE call
            return lapn(bp.w_down, gu, bp.ffn_sub_norm, glu=True, resid=x)
        F = bp.w_gateup.n // 2
        gate = _act(cfg.hidden_act, gu[..., :F])
        up = gu[..., F:]
    else:
        h = rms_norm(x, bp.ffn_norm, cfg.rms_norm_eps)
        gate = _act(cfg.hidden_act, lapn(bp.w_gate, h, None))
        up = lapn(bp.w_up, h, None)
    gu = gate * up
    # 2B-4T ffn_sub_norm (or plain quantize) fuses into the down kernel
    return lapn(bp.w_down, gu, bp.ffn_sub_norm, resid=x)


def _scale_vec(lin: TernaryLinear) -> jnp.ndarray:
    """[L, Np] per-column scale vector for the stacked kernel (scalar
    per-layer scales broadcast; fused-projection vectors lane-padded)."""
    L, Np = lin.packed.shape[0], lin.packed.shape[2]
    s = jnp.asarray(lin.scales, jnp.float32).reshape(L, -1)
    if s.shape[1] == 1:
        return jnp.broadcast_to(s, (L, Np))
    if s.shape[1] != Np:
        s = jnp.pad(s, ((0, 0), (0, Np - s.shape[1])), constant_values=1.0)
    return s


def _stacked_weights_ok(cfg: ModelConfig, b,
                        kinds: tuple[str, ...] = ("qk256",)) -> bool:
    """Weight-side eligibility shared by the stacked decode loop and the
    stacked prefill: fused projections, stacked packs with scales of a
    UNIFORM supported kind, norm widths matching."""
    if b.wqkv is None or b.w_gateup is None or cfg.hidden_act != "silu":
        return False
    lins = (b.wqkv, b.wo, b.w_gateup, b.w_down)
    if len({lin.kind for lin in lins}) != 1:
        return False
    for lin in lins:
        if lin.kind not in kinds or lin.packed is None:
            return False
        if lin.packed.ndim != 3:
            return False
        if lin.scales is None:    # _scale_vec / TL corr need scales
            return False
        if (lin.kind == "qk256"
                and lin.packed.shape[1] * 16 != lin.k):   # K must equal Kp
            return False
    if (b.attn_sub_norm is not None
            and b.attn_sub_norm.shape[-1] != b.wo.k):
        return False
    if (b.ffn_sub_norm is not None
            and b.ffn_sub_norm.shape[-1] != b.w_down.k):
        return False
    return (b.attn_norm.shape[-1] == b.wqkv.k
            and b.ffn_norm.shape[-1] == b.w_gateup.k)


def _stacked_decode_ok(cfg: ModelConfig, params: BitNetParams, T: int,
                       B: int, k_scale, kv_positions, window, write_slots,
                       kernel_path: str) -> bool:
    """Trace-time eligibility for the stacked decode loop."""
    from ..ops.ternary_matmul import stacked_decode_max_m

    # B cap = the normed kernel's one-M-block VMEM limit — shared with
    # decode_attn_plan so the cache-layout chooser and this gate can
    # never disagree (a 48-slot pool once planned quant_batched_v2 but
    # fell here to the generic per-layer path at 19x the step time)
    if not (T == 1 and B <= stacked_decode_max_m()
            and kernel_path == "w2a8"):
        return False
    if kv_positions is not None or window is not None:
        return False
    if write_slots is not None:
        return False
    # TL/bitnet32 ride the stacked loop with the bf16 per-K-block-scale
    # kernel (ternary_matmul_stacked_tl); qk256 uses the W2A8 family
    return _stacked_weights_ok(cfg, params.blocks,
                               kinds=("qk256", "tl", "bitnet32"))


def _stacked_prefill_ok(cfg: ModelConfig, params: BitNetParams, T: int,
                        kv_positions, window, write_slots,
                        kernel_path: str) -> bool:
    """Trace-time eligibility for the stacked prefill (T>1) path.

    Default ON since the round-3 on-chip A/B (exp_round3b P vs X,
    back-to-back: 12.52 vs 13.08 ms for T=512 — the stacked
    scalar-prefetch matmuls beat the per-layer scan slices by ~4.5%);
    BITNET_STACKED_PREFILL=0 restores the generic path."""
    import os as _os

    if _os.environ.get("BITNET_STACKED_PREFILL", "1") != "1":
        return False
    if not (T > 1 and kernel_path == "w2a8"):
        return False
    if kv_positions is not None or window is not None:
        return False
    if write_slots is not None:
        return False
    return _stacked_weights_ok(cfg, params.blocks)


def decode_attn_plan(B: int, kv_dtype=None, flat: bool = False) -> str:
    """Trace-time decode-attention kernel selection for the rows-mode
    stacked loop — the ONE source of truth shared by ``_decode_stacked``
    and honest-compute receipts (the engine records the plan name so a
    receipt states which kernel actually ran).

    ``kv_dtype``: the quantized cache dtype (jnp.int8 / float8_e4m3fn)
    or None for dense bf16/f32 caches.  Returns one of:
      qkv_batched_v2 / qkv_quant_batched_v2  rope-fused whole-batch v2
      qkv_batched / qkv_quant_batched   rope-fused whole-batch v1
      qkv / qkv_quant                   rope-fused per-b kernels (B≤2)
      flash / flash_quant               plain flash-decode (B≤ max_b)
      batched / quant_batched           whole-batch, rope in XLA (v1)
      einsum                            XLA einsum attention fallback

    Gating (v5e measurements in README / docs/perf):
    - rope fusion defaults ON in rows mode (1.29 vs 1.46 ms/token B=1);
    - B≤2 defaults to the stacked rope-fused v2 kernels
      (ops/decode_attention_v2.py): 1.19 (flat cache) vs the v1
      kernels' 1.48 ms/step B=1 on-chip; BITNET_B1_ATTN=v1 restores v1;
    - B>2 pools default to the v2 whole-batch kernels with the stacked
      full-cache read + pallas row scatter — WITH the flat [L,B,S,KV*D]
      cache layout (engine cache_layout() allocates it) they beat
      einsum 2.00 vs 2.78 ms/step at B=8 bf16 (4004 vs 2878 tok/s) and
      1.72 with int8 KV; BITNET_BATCHED_ATTN=0 restores einsum, =1 the
      v1 kernels, =v2qkv the rope-fused whole-batch variant (loses at
      B=8: the per-b rope preamble costs more than the XLA rope glue);
    - the per-b kernel grid loses to einsum above max_b (default 2);
    - quantized caches ride the quant kernels when the dtype is int8 or
      fp8_e4m3.  fp8 was Mosaic-cast-verified on-chip in round 5
      (kernel-vs-XLA cosine 0.99999 from identical fp8 cache values,
      experiments/exp_r5_fp8.py) and is measured in the round-5 matrix —
      it loses to int8 everywhere on v5e (the e4m3→bf16 cast costs more
      VPU work than int8 convert×scale: 2.06 vs 1.61 ms/step at B=1
      S=1024, 3.77 vs 1.78 at B=8), so ``kv_cache_dtype="auto"`` never
      selects it; BITNET_FP8_KERNEL=0 restores the einsum fallback for
      explicitly-fp8 caches.
    """
    import os as _os

    quantized = kv_dtype is not None
    rows_mode = _os.environ.get("BITNET_CACHE_YS", "0") != "1"
    rope_fused = _os.environ.get(
        "BITNET_ROPE_FUSED", "1" if rows_mode else "0") == "1"
    fp8_kernel = _os.environ.get("BITNET_FP8_KERNEL", "1") == "1"
    batched_env = _os.environ.get("BITNET_BATCHED_ATTN", "v2")
    attn_max_b = int(_os.environ.get("BITNET_DECODE_ATTN_MAX_B", "2"))
    # whole-batch v2 kernels keep per-slot VMEM scratch (q_wide + wide
    # ctx ≈ 2·[H, KV·D] f32 ≈ 512 KB/slot at 2B shapes): B=32 in ONE
    # grid step blows the 16 MB scoped-vmem limit (measured round 5:
    # einsum fallback ran 13.6 ms/step vs B=16's 3.2).  The plain
    # batched_v2 wrappers now split B>16 over a batch-group grid axis
    # (_pick_group — scratch sized per group), so the cap only gates
    # batch sizes the grouping can't divide (odd B>16).
    v2_max_b = int(_os.environ.get("BITNET_V2_WHOLEBATCH_MAX_B", "16"))
    from ..ops.ternary_matmul import stacked_decode_max_m

    # bound the whole-batch window by the stacked-loop eligibility cap:
    # above it the model runs the generic per-layer path, where a flat
    # cache (chosen because this plan landed in _FLAT_PLANS) costs a
    # per-step flat->5D relayout storm (the round-5 B=48 cliff)
    v2_ok_b = B <= v2_max_b or (
        B % 2 == 0 and B <= min(64, stacked_decode_max_m()))
    dt_ok = (not quantized or kv_dtype == jnp.int8
             or (fp8_kernel and kv_dtype == jnp.float8_e4m3fn))
    if rope_fused and batched_env == "v2qkv" and 2 < B <= v2_max_b \
            and dt_ok:
        return "qkv_quant_batched_v2" if quantized else "qkv_batched_v2"
    if rope_fused and batched_env == "1" and B > 2 and dt_ok:
        return "qkv_quant_batched" if quantized else "qkv_batched"
    if rope_fused and B <= 2 and dt_ok:
        # v2s (default): rope-fused v2 body over the FULL stacked cache
        # via scalar prefetch — no per-layer xs slice for XLA to copy
        # and ~3x fewer per-chunk VPU ops than v1 (round-4 microbench:
        # 1.8 vs 5.5 µs/layer at B=1).  BITNET_B1_ATTN=v1 restores the
        # xs-threaded v1 kernels.
        if _os.environ.get("BITNET_B1_ATTN", "v2s") == "v2s":
            return "qkv_quant_v2s" if quantized else "qkv_v2s"
        return "qkv_quant" if quantized else "qkv"
    if B <= attn_max_b and dt_ok:
        return "flash_quant" if quantized else "flash"
    if batched_env == "v2" and dt_ok and flat and v2_ok_b:
        # DEFAULT for B>2 pools WITH a flat-layout cache: plain v2
        # whole-batch kernel, rope in XLA — the rope-fused per-b
        # preamble costs ~17 µs/layer at B=8 (76.5 vs 59.0 µs/layer
        # microbench) while the XLA rope glue amortizes over the batch.
        # 5D callers stay on einsum: a 5D while-carry + pallas operands
        # forces the S-minor relayout copy storm (4 x ~1 ms/step at
        # B=8) that makes this path LOSE — allocate flat
        # (engine.cache.decode_cache_layout) to get the win.
        return "quant_batched_v2" if quantized else "batched_v2"
    if batched_env not in ("0", "", "v2") and dt_ok:
        return "quant_batched" if quantized else "batched"
    return "einsum"


def _decode_stacked(cfg: ModelConfig, params: BitNetParams,
                    x: jnp.ndarray,              # [B, 1, H] embedded
                    q_positions: jnp.ndarray,    # [B, 1]
                    k_cache: jnp.ndarray,        # [L, B, S, KV, D]
                    v_cache: jnp.ndarray,
                    pre_len: jnp.ndarray,        # [B] valid cache slots
                    rope_sin: jnp.ndarray,       # [B, 1, 1, D/2] rows
                    rope_cos: jnp.ndarray,
                    k_scale: jnp.ndarray | None = None,  # [L, B, S, KV]
                    v_scale: jnp.ndarray | None = None):
    """Decode step with STACKED weight/cache kernels (profiler-driven:
    under lax.scan, per-layer slices of stacked arrays feeding pallas
    operands are materialized HBM copies — ~0.8 ms/step of weight copies
    and ~0.6 ms/step of cache slice/write-back against a 0.65 ms kernel
    floor.  Scalar-prefetch block indexing reads straight from the
    stacks; the caches stay scan CARRIES updated in-place via
    dynamic_update_slice)."""
    from ..ops.decode_attention import (
        decode_attention,
        decode_attention_quant,
    )
    from ..ops.ternary_matmul import ternary_matmul_stacked

    b = params.blocks
    B, T, H = x.shape
    nh, nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L, S = k_cache.shape[0], k_cache.shape[2]
    eps = cfg.rms_norm_eps
    interp = jax.default_backend() != "tpu"
    kind = b.wqkv.kind
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # caller-side flat cache [L, B, S, KV*D] (engine cache_layout()):
    # the decode carry stays flat end-to-end so XLA's while-loop layout
    # heuristic never sees the sublane-padded 5D [.., KV, D] shape (the
    # round-4 copy storm, see the flat block below).  Whatever path runs,
    # the caches are returned in the caller's layout.
    flat_in = k_cache.ndim == 4

    if kind == "qk256":
        sv = {n: _scale_vec(getattr(b, n))
              for n in ("wqkv", "wo", "w_gateup", "w_down")}

        def mm(l, h, name, gamma, **kw):
            lin = getattr(b, name)
            return ternary_matmul_stacked(
                l, h, lin.packed, sv[name], gamma, k_dim=lin.k,
                n_dim=lin.n, eps=eps, interpret=interp, **kw)
    else:
        # TL/bitnet32: per-K-block-scale kernels.  Default is the FUSED
        # kernel (norm + SwiGLU + residual ride the matmul, unbiased
        # (v-2)*s32 weights kill the XLA correction matmul) — the same
        # treatment qk256 gets, per VERDICT r3 #3 (the reference calls
        # BitNet32 its fast flavor, README.md:44).  Requires K == Kp
        # (in-kernel norm can't see column padding); unaligned widths
        # and BITNET_TL_FUSED=0 fall back to the unfused kernel with
        # norm/SwiGLU/residual in XLA.
        import os as _os

        from ..ops.ternary_matmul import (
            ternary_matmul_stacked_tl,
            ternary_matmul_stacked_tl_fused,
            ternary_matmul_stacked_tl_w2a8,
        )

        aligned = all(getattr(b, n).k % 256 == 0
                      for n in ("wqkv", "wo", "w_gateup", "w_down"))
        # Round 5 default for B≤2: the int8-MXU per-K-block kernel (the
        # "no W2A8 recipe for per-32-row scales" claim was wrong — the
        # reduction factors over the scale blocks; see
        # _tl_w2a8_fused_kernel).  B>2 TL pools ride the bf16 fused
        # kernel (the block-masked rows 8·M must fit one 32-row i8
        # tile).  BITNET_TL_W2A8=0 falls back to the bf16 kernel always.
        tl_w2a8 = (_os.environ.get("BITNET_TL_W2A8", "1") == "1"
                   and aligned and B <= 2)
        tl_fused = (_os.environ.get("BITNET_TL_FUSED", "1") == "1"
                    and aligned)

        def mm(l, h, name, gamma, glu=False, resid=None):
            lin = getattr(b, name)
            if tl_w2a8:
                return ternary_matmul_stacked_tl_w2a8(
                    l, h, lin.packed, lin.scales, gamma, k_dim=lin.k,
                    n_dim=lin.n, eps=eps, glu=glu, resid=resid,
                    lut_bias=kind == "bitnet32", interpret=interp)
            if tl_fused:
                return ternary_matmul_stacked_tl_fused(
                    l, h, lin.packed, lin.scales, gamma, k_dim=lin.k,
                    n_dim=lin.n, eps=eps, glu=glu, resid=resid,
                    lut_bias=kind == "bitnet32", interpret=interp)
            x2 = h
            if glu:
                K2 = x2.shape[1] // 2
                x2 = jax.nn.silu(x2[:, :K2]) * x2[:, K2:]
            if gamma is not None:
                x2 = rms_norm(x2, jnp.take(gamma, l, axis=0), eps)
            y = ternary_matmul_stacked_tl(
                l, x2, lin.packed, lin.scales, k_dim=lin.k, n_dim=lin.n,
                lut_bias=kind == "bitnet32", interpret=interp)
            return y if resid is None else y + resid

    # NOTE the caches ride the scan as READ-ONLY xs (per-layer 2.6 MB
    # slice semantics): carrying the FULL [L, ...] stacks and mixing an
    # opaque pallas read with a dynamic_update_slice write makes XLA
    # insert defensive whole-stack copies per layer (measured 19.8
    # ms/token).  Only the WEIGHTS (read-only, loop-invariant) ride the
    # scalar-prefetch stacked kernels.
    #
    # Round-3 rows mode (default): the caches are xs ONLY — each layer
    # emits just its new k/v row (and scale) as ys, and ONE post-scan
    # scatter writes all L rows at the query position.  Round 2 threaded
    # the full slices back out as ys too, which paid the slice copy twice
    # (read + restack ≈ 0.7 ms/step at B=1).  Attention reads the
    # PRE-write slice and folds the new token in-kernel
    # (ops/decode_attention.py), so nothing downstream needs the written
    # cache until the next step.  BITNET_CACHE_YS=1 restores the round-2
    # xs/ys threading for A/B timing.
    quantized = k_scale is not None
    import os as _os
    rows_mode = _os.environ.get("BITNET_CACHE_YS", "0") != "1"
    plan = decode_attn_plan(B, k_cache.dtype if quantized else None,
                            flat=flat_in)

    def body_rows(h, xs):
        """Rows mode: xs caches are PRE-write read-only slices; returns
        the new (quantized) k/v rows + scales as ys for the post-scan
        scatter."""
        l, kc, vc, ks, vs = xs                  # h [B, H]; kc [B,S,KV,D]
        if plan in ("qkv_batched", "qkv_quant_batched",
                    "qkv_batched_v2", "qkv_quant_batched_v2"):
            # whole-batch rope-fused kernels: B>2 pools get the full
            # fusion win (no q/k/v slicing, no XLA rope pair, pre-write
            # cache read) with the batch amortizing the program count;
            # quantized caches also quantize the new rows in-VMEM and
            # stream at half the bytes.  v2 = the round-4 low-op-count
            # body (ops/decode_attention_v2.py).  Flat xs (kc.ndim == 3)
            # skip the wrapper's per-layer 5D→3D reshape.
            nkv_kw = {"n_kv": nkv} if kc.ndim == 3 else {}
            qkv = mm(l, h, "wqkv", b.attn_norm)
            if quantized:
                if plan.endswith("_v2"):
                    from ..ops.decode_attention_v2 import (
                        decode_attention_qkv_quant_batched_v2 as _fq,
                    )
                else:
                    from ..ops.decode_attention import (
                        decode_attention_qkv_quant_batched as _fq,
                    )

                attn1, k_row, v_row, ks_row, vs_row = _fq(
                    qkv, rope_sin[:, 0, 0, :], rope_cos[:, 0, 0, :],
                    kc, vc, ks, vs, pre_len, n_heads=nh,
                    interpret=interp, **nkv_kw)
                if kc.ndim == 3:
                    k_row = k_row.reshape(B, nkv * D)
                    v_row = v_row.reshape(B, nkv * D)
                ys = (k_row[:, None], v_row[:, None],
                      ks_row[:, None], vs_row[:, None])
            else:
                if plan.endswith("_v2"):
                    from ..ops.decode_attention_v2 import (
                        decode_attention_qkv_batched_v2 as _fb,
                    )
                else:
                    from ..ops.decode_attention import (
                        decode_attention_qkv_batched as _fb,
                    )

                attn1, k_row, v_row = _fb(
                    qkv, rope_sin[:, 0, 0, :], rope_cos[:, 0, 0, :],
                    kc, vc, pre_len, n_heads=nh, interpret=interp,
                    **nkv_kw)
                if kc.ndim == 3:
                    k_row = k_row.reshape(B, nkv * D)
                    v_row = v_row.reshape(B, nkv * D)
                zs = jnp.zeros((B, 1, 1), jnp.float32)
                ys = (k_row[:, None], v_row[:, None], zs, zs)
            h = mm(l, attn1.reshape(B, nh * D), "wo", b.attn_sub_norm,
                   resid=h)
            gu = mm(l, h, "w_gateup", b.ffn_norm)
            h = mm(l, gu, "w_down", b.ffn_sub_norm, glu=True, resid=h)
            return h, ys
        if plan in ("qkv", "qkv_quant"):
            # ONE kernel applies RoPE to the raw q|k|v row, runs
            # flash-decode, and emits the roped k/v rows — exactly the ys
            # rows mode wants (round-2's layout-flip objection was about
            # the per-layer restack, which rows mode no longer does).
            # With an int8 cache the kernel also quantizes the new rows
            # in-VMEM and streams the cache as int8 (half the HBM read).
            # Flat xs (kc.ndim == 3, [B, S, KV*D]) skip the wrapper's 5D→
            # 3D reshape — the XLA-level reshape forced per-step
            # whole-cache relayout copies (HLO copy.44/45).
            nkv_kw = {"n_kv": nkv} if kc.ndim == 3 else {}
            if quantized:
                from ..ops.decode_attention import decode_attention_qkv_quant

                qkv = mm(l, h, "wqkv", b.attn_norm)
                attn1, k_row, v_row, ks_row, vs_row = (
                    decode_attention_qkv_quant(
                        qkv, rope_sin[:, 0, 0, :], rope_cos[:, 0, 0, :],
                        kc, vc, ks, vs, pre_len, n_heads=nh,
                        interpret=interp, **nkv_kw))
                if kc.ndim == 3:
                    k_row = k_row.reshape(B, nkv * D)
                    v_row = v_row.reshape(B, nkv * D)
                ys = (k_row[:, None], v_row[:, None],
                      ks_row[:, None], vs_row[:, None])
            else:
                from ..ops.decode_attention import decode_attention_qkv

                qkv = mm(l, h, "wqkv", b.attn_norm)
                attn1, k_row, v_row = decode_attention_qkv(
                    qkv, rope_sin[:, 0, 0, :], rope_cos[:, 0, 0, :],
                    kc, vc, pre_len, n_heads=nh, interpret=interp,
                    **nkv_kw)
                if kc.ndim == 3:
                    k_row = k_row.reshape(B, nkv * D)
                    v_row = v_row.reshape(B, nkv * D)
                zs = jnp.zeros((B, 1, 1), jnp.float32)
                ys = (k_row[:, None], v_row[:, None], zs, zs)
            h = mm(l, attn1.reshape(B, nh * D), "wo", b.attn_sub_norm,
                   resid=h)
            gu = mm(l, h, "w_gateup", b.ffn_norm)
            h = mm(l, gu, "w_down", b.ffn_sub_norm, glu=True, resid=h)
            return h, ys
        qkv = mm(l, h, "wqkv", b.attn_norm)
        q = qkv[:, : nh * D].reshape(B, 1, nh, D)
        kn = qkv[:, nh * D: (nh + nkv) * D].reshape(B, 1, nkv, D)
        vn = qkv[:, (nh + nkv) * D:].reshape(B, 1, nkv, D)
        q = apply_rope(q, rope_sin, rope_cos, q_positions)
        kn = apply_rope(kn, rope_sin, rope_cos, q_positions)
        if quantized:
            kq, ksr = _quantize_kv(kn, kc.dtype)
            vq, vsr = _quantize_kv(vn, vc.dtype)
            # the ROUND-TRIPPED row feeds attention so numerics match the
            # generic path (which reads the written row back quantized)
            kn_in = (kq.astype(jnp.float32) * ksr[..., None]).astype(
                x.dtype)
            vn_in = (vq.astype(jnp.float32) * vsr[..., None]).astype(
                x.dtype)
        else:
            kq, vq = kn.astype(kc.dtype), vn.astype(vc.dtype)
            ksr = vsr = jnp.zeros((B, 1, 1), jnp.float32)
            kn_in, vn_in = kn, vn
        # flash-decode kernel gate (see decode_attn_plan): its grid steps
        # scale with B while XLA einsum attention batches rows — v5e
        # rows-mode measurements: B=1 pallas 1.51 ms vs einsum n/a; B=8
        # pallas 5.48 ms vs einsum 2.99 ms.  Keep the kernel for tiny B.
        if plan in ("flash", "flash_quant"):
            if plan == "flash_quant":
                # int8 cache + per-vector scales dequantize IN-KERNEL —
                # the cache stream stays int8 all the way into VMEM
                # (half the HBM read of the bf16 cache)
                attn = decode_attention_quant(
                    q[:, 0], kn_in[:, 0], vn_in[:, 0], kc, vc,
                    ks, vs, pre_len, interpret=interp)
            else:
                attn = decode_attention(
                    q[:, 0], kn_in[:, 0], vn_in[:, 0], kc, vc, pre_len,
                    interpret=interp)
        elif plan in ("batched", "quant_batched",
                      "batched_v2", "quant_batched_v2"):
            # whole-batch-per-grid-step kernels: amortize the fixed cost
            # the per-b grid paid B times (which made pallas lose to XLA
            # einsum at B=8) and read the PRE-write cache, skipping the
            # post-write slice copy below (int8 caches additionally
            # stream at half the bytes with in-VMEM scale dequant).
            # v2 (the B>2 DEFAULT) = the round-4 low-op-count body; flat
            # xs (kc.ndim == 3) skip the wrapper's per-layer 5D→3D
            # reshape.
            nkv_kw = ({"n_kv": nkv}
                      if plan.endswith("_v2") and kc.ndim == 3 else {})
            if quantized:
                if plan.endswith("_v2"):
                    from ..ops.decode_attention_v2 import (
                        decode_attention_quant_batched_v2 as _fq,
                    )
                else:
                    from ..ops.decode_attention import (
                        decode_attention_quant_batched as _fq,
                    )

                attn = _fq(
                    q[:, 0], kn_in[:, 0], vn_in[:, 0], kc, vc, ks, vs,
                    pre_len, interpret=interp, **nkv_kw)
            else:
                if plan.endswith("_v2"):
                    from ..ops.decode_attention_v2 import (
                        decode_attention_batched_v2 as _fb,
                    )
                else:
                    from ..ops.decode_attention import (
                        decode_attention_batched as _fb,
                    )

                attn = _fb(
                    q[:, 0], kn_in[:, 0], vn_in[:, 0], kc, vc, pre_len,
                    interpret=interp, **nkv_kw)
        else:
            # XLA einsum attention needs the POST-write cache view; the
            # written slice copy feeds only this read (the canonical
            # cache update is the post-scan scatter)
            if quantized:
                kcw = kc.at[b_idx, q_positions].set(kq, mode="drop")
                vcw = vc.at[b_idx, q_positions].set(vq, mode="drop")
                ksw = ks.at[b_idx, q_positions].set(ksr, mode="drop")
                vsw = vs.at[b_idx, q_positions].set(vsr, mode="drop")
                k_read = (kcw.astype(jnp.float32)
                          * ksw[..., None]).astype(x.dtype)
                v_read = (vcw.astype(jnp.float32)
                          * vsw[..., None]).astype(x.dtype)
            else:
                k_read = kc.at[b_idx, q_positions].set(
                    kn.astype(kc.dtype), mode="drop")
                v_read = vc.at[b_idx, q_positions].set(
                    vn.astype(vc.dtype), mode="drop")
            attn = attention(q, k_read, v_read, q_positions,
                             pre_len + T)[:, 0]
        a2 = attn.reshape(B, nh * D)
        h = mm(l, a2, "wo", b.attn_sub_norm, resid=h)
        gu = mm(l, h, "w_gateup", b.ffn_norm)
        h = mm(l, gu, "w_down", b.ffn_sub_norm, glu=True, resid=h)
        if kc.ndim == 3:
            # flat xs: emit flat rows so the post-scan scatter shapes line
            # up ([L, B, 1, KV*D] ys → reshaped back to 5D after the scan)
            kq = kq.reshape(B, 1, nkv * D)
            vq = vq.reshape(B, 1, nkv * D)
        return h, (kq, vq, ksr, vsr)

    def body(h, xs):
        l, kc, vc, ks, vs = xs                  # h [B, H]; kc [B,S,KV,D]
        qkv = mm(l, h, "wqkv", b.attn_norm)
        q = qkv[:, : nh * D].reshape(B, 1, nh, D)
        kn = qkv[:, nh * D: (nh + nkv) * D].reshape(B, 1, nkv, D)
        vn = qkv[:, (nh + nkv) * D:].reshape(B, 1, nkv, D)
        q = apply_rope(q, rope_sin, rope_cos, q_positions)
        kn = apply_rope(kn, rope_sin, rope_cos, q_positions)
        if quantized:
            # int8/fp8 cache: quantize the new rows, scatter all four
            # arrays, and dequantize the layer slice for attention —
            # the ROUND-TRIPPED new row feeds the kernel init so the
            # numerics match the generic path (which reads the written
            # row back from the quantized cache)
            kq, ksr = _quantize_kv(kn, kc.dtype)
            vq, vsr = _quantize_kv(vn, vc.dtype)
            kc = kc.at[b_idx, q_positions].set(kq, mode="drop")
            vc = vc.at[b_idx, q_positions].set(vq, mode="drop")
            ks = ks.at[b_idx, q_positions].set(ksr, mode="drop")
            vs = vs.at[b_idx, q_positions].set(vsr, mode="drop")
            k_read = (kc.astype(jnp.float32) * ks[..., None]).astype(
                x.dtype)
            v_read = (vc.astype(jnp.float32) * vs[..., None]).astype(
                x.dtype)
            kn_in = (kq.astype(jnp.float32) * ksr[..., None]).astype(
                x.dtype)
            vn_in = (vq.astype(jnp.float32) * vsr[..., None]).astype(
                x.dtype)
        else:
            kn_in, vn_in = kn, vn
        import os as _os
        attn_max_b = int(_os.environ.get("BITNET_DECODE_ATTN_MAX_B", "2"))
        if B <= attn_max_b:
            # fused flash-decode kernel; grid steps scale with B, so
            # batched pools use the XLA einsum attention below (v5e:
            # B=8 was faster on XLA) while keeping the stacked matmuls
            if quantized:
                attn = decode_attention(
                    q[:, 0], kn_in[:, 0], vn_in[:, 0], k_read, v_read,
                    pre_len, interpret=interp)
            else:
                attn = decode_attention(
                    q[:, 0], kn[:, 0], vn[:, 0], kc, vc, pre_len,
                    interpret=interp)
                kc = kc.at[b_idx, q_positions].set(
                    kn.astype(kc.dtype), mode="drop")
                vc = vc.at[b_idx, q_positions].set(
                    vn.astype(vc.dtype), mode="drop")
        else:
            if not quantized:
                kc = kc.at[b_idx, q_positions].set(
                    kn.astype(kc.dtype), mode="drop")
                vc = vc.at[b_idx, q_positions].set(
                    vn.astype(vc.dtype), mode="drop")
                k_read, v_read = kc, vc
            attn = attention(q, k_read, v_read, q_positions,
                             pre_len + T)[:, 0]
        a2 = attn.reshape(B, nh * D)
        h = mm(l, a2, "wo", b.attn_sub_norm, resid=h)
        gu = mm(l, h, "w_gateup", b.ffn_norm)
        h = mm(l, gu, "w_down", b.ffn_sub_norm, glu=True, resid=h)
        return h, (kc, vc, ks, vs)

    if rows_mode:
        # FLAT xs (default for the rope-fused plans): thread the caches
        # through the scan as [L, B, S, KV*D] so the kernel wrapper never
        # reshapes at the XLA level — the 5D→3D reshape inside the scan
        # made layout assignment flip the whole cache's layout, inserting
        # TWO full-cache relayout copies per step at the scan boundary
        # (S=4096 profile: copy.44/45 ≈ 625 µs EACH) plus per-layer
        # [B,S,KV*D] copies (copy.46/47).  The 5D↔flat reshapes here sit
        # OUTSIDE the scan on default layouts (bitcasts).
        # BITNET_CACHE_FLAT=0 restores 5D xs for A/B.
        #
        # flat_in (k_cache.ndim == 4): the CALLER already stores the
        # cache flat [L, B, S, KV*D] across decode steps.  This is the
        # whole fix for the round-4 B=8 copy storm: a 5D cache carry has
        # minor dims [KV=5, D=128], and XLA's (8,128) tiling wastes 3/8
        # sublanes on the KV=5 face — so layout assignment gives the
        # decode while-loop carry an S-minor layout ({2,4,3,1,0}) and
        # relayout-copies the FULL cache 4x per step (copy.54/55/58/59,
        # ~1 ms EACH at B=8 S=1024) to feed the row-major pallas
        # operands.  A flat [.., 1024, 640] carry tiles perfectly in
        # row-major, so nothing gets copied.  The engine/bench allocate
        # flat when the plan rides the stacked kernels (cache_layout()).
        flat = (plan in ("qkv", "qkv_quant",
                         "qkv_batched_v2", "qkv_quant_batched_v2",
                         "batched_v2", "quant_batched_v2",
                         "qkv_v2s", "qkv_quant_v2s")
                and _os.environ.get("BITNET_CACHE_FLAT", "1") == "1")
        if flat_in and not flat:
            # caller stores flat but the selected plan wants 5D views —
            # convert here (a bitcast outside the scan) and restore at
            # the shared exit below
            k_cache = k_cache.reshape(L, B, S, nkv, D)
            v_cache = v_cache.reshape(L, B, S, nkv, D)
        if flat_in and flat:
            KVD = k_cache.shape[3]
            kx, vx = k_cache, v_cache
        else:
            KVD = k_cache.shape[3] * k_cache.shape[4]
            kx = k_cache.reshape(L, B, S, KVD) if flat else k_cache
            vx = v_cache.reshape(L, B, S, KVD) if flat else v_cache
        # Stacked attention (default for the batched v2 plans): the
        # caches do NOT ride the scan as xs at all — the kernel
        # block-indexes the FULL stack via scalar prefetch.  A per-layer
        # xs slice feeding a pallas operand is a materialized copy, and
        # the round-4 B=8 HLO showed layout assignment turning it into a
        # RELAYOUT copy pair (2 x 10.5 MB per layer, ~1.3 ms/step).
        # BITNET_ATTN_STACKED=0 restores xs threading for A/B.
        stacked_attn = (plan in ("batched_v2", "quant_batched_v2",
                                 "qkv_v2s", "qkv_quant_v2s")
                        and _os.environ.get("BITNET_ATTN_STACKED",
                                            "1") == "1")
        if stacked_attn:
            from ..ops.decode_attention_v2 import (
                decode_attention_batched_v2_stacked,
                decode_attention_qkv_quant_v2_stacked,
                decode_attention_qkv_v2_stacked,
                decode_attention_quant_batched_v2_stacked,
            )

            nkv_kw = {"n_kv": nkv} if flat else {}
            if quantized:
                ks_t = jnp.swapaxes(k_scale, 2, 3)    # [L, B, KV, S]
                vs_t = jnp.swapaxes(v_scale, 2, 3)

            def body_rows_sa(h, l):
                qkv = mm(l, h, "wqkv", b.attn_norm)
                if plan.startswith("qkv"):
                    # rope-fused stacked kernels (B≤2 default): RoPE,
                    # row quantization, attention all in ONE kernel
                    if quantized:
                        attn, kq, vq, ksr2, vsr2 = (
                            decode_attention_qkv_quant_v2_stacked(
                                l, qkv, rope_sin[:, 0, 0, :],
                                rope_cos[:, 0, 0, :], kx, vx, ks_t, vs_t,
                                pre_len, n_heads=nh, interpret=interp,
                                **nkv_kw))
                        ksr = ksr2[:, None]
                        vsr = vsr2[:, None]
                    else:
                        attn, kq, vq = decode_attention_qkv_v2_stacked(
                            l, qkv, rope_sin[:, 0, 0, :],
                            rope_cos[:, 0, 0, :], kx, vx, pre_len,
                            n_heads=nh, interpret=interp, **nkv_kw)
                        ksr = vsr = jnp.zeros((B, 1, 1), jnp.float32)
                    kq = kq[:, None]               # [B, 1, KV, D]
                    vq = vq[:, None]
                else:
                    q = qkv[:, : nh * D].reshape(B, 1, nh, D)
                    kn = qkv[:, nh * D: (nh + nkv) * D].reshape(
                        B, 1, nkv, D)
                    vn = qkv[:, (nh + nkv) * D:].reshape(B, 1, nkv, D)
                    q = apply_rope(q, rope_sin, rope_cos, q_positions)
                    kn = apply_rope(kn, rope_sin, rope_cos, q_positions)
                    if quantized:
                        kq, ksr = _quantize_kv(kn, kx.dtype)
                        vq, vsr = _quantize_kv(vn, vx.dtype)
                        kn_in = (kq.astype(jnp.float32)
                                 * ksr[..., None]).astype(x.dtype)
                        vn_in = (vq.astype(jnp.float32)
                                 * vsr[..., None]).astype(x.dtype)
                        attn = decode_attention_quant_batched_v2_stacked(
                            l, q[:, 0], kn_in[:, 0], vn_in[:, 0], kx, vx,
                            ks_t, vs_t, pre_len, interpret=interp,
                            **nkv_kw)
                    else:
                        kq, vq = kn, vn
                        ksr = vsr = jnp.zeros((B, 1, 1), jnp.float32)
                        attn = decode_attention_batched_v2_stacked(
                            l, q[:, 0], kn[:, 0], vn[:, 0], kx, vx,
                            pre_len, interpret=interp, **nkv_kw)
                h2 = mm(l, attn.reshape(B, nh * D), "wo", b.attn_sub_norm,
                        resid=h)
                gu = mm(l, h2, "w_gateup", b.ffn_norm)
                h2 = mm(l, gu, "w_down", b.ffn_sub_norm, glu=True,
                        resid=h2)
                if flat:
                    kq = kq.reshape(B, 1, nkv * D)
                    vq = vq.reshape(B, 1, nkv * D)
                return h2, (kq, vq, ksr, vsr)

            x2, (k_rows, v_rows, ks_rows, vs_rows) = jax.lax.scan(
                body_rows_sa, x[:, 0, :],
                jnp.arange(L, dtype=jnp.int32))
        else:
            if quantized:
                xs = (jnp.arange(L, dtype=jnp.int32), kx, vx,
                      k_scale, v_scale)
            else:
                # no dummy scale xs: slicing even a tiny constant per
                # scan step costs ~2.5 µs/layer of XLA fusions
                # (profiled ~80 µs/step at L=30)
                xs = (jnp.arange(L, dtype=jnp.int32), kx, vx)

            def body_rows_plain(h, xs3):
                l, kc, vc = xs3
                return body_rows(h, (l, kc, vc, None, None))

            x2, (k_rows, v_rows, ks_rows, vs_rows) = jax.lax.scan(
                body_rows if quantized else body_rows_plain,
                x[:, 0, :], xs)
        if stacked_attn and _os.environ.get(
                "BITNET_ROWS_WRITE", "pallas") == "pallas":
            # Pallas row scatter (aliased, scalar-prefetch index map):
            # with the attention custom call layout-constraining the
            # cache, leaving the writes to XLA DUS made layout
            # assignment pick an S-minor in-loop layout and relayout-copy
            # the WHOLE cache every step (copy.76/77, ~0.77 ms at B=8).
            # All-pallas consumers pin the layout; the buffers pass
            # through untouched.
            from ..ops.decode_attention_v2 import scatter_kv_rows

            kx, vx = scatter_kv_rows(
                kx, vx, k_rows, v_rows, q_positions[:, 0],
                interpret=interp)
            if flat_in:                            # caller keeps flat
                k_cache = kx if kx.ndim == 4 else kx.reshape(
                    L, B, S, nkv * D)
                v_cache = vx if vx.ndim == 4 else vx.reshape(
                    L, B, S, nkv * D)
            else:
                k_cache = kx.reshape(L, B, S, nkv, D) if flat else kx
                v_cache = vx.reshape(L, B, S, nkv, D) if flat else vx
            if quantized:
                z = jnp.int32(0)
                for bb in range(B):
                    p = jnp.minimum(q_positions[bb, 0], S - 1)
                    k_scale = jax.lax.dynamic_update_slice(
                        k_scale, ks_rows[:, bb:bb + 1, :1],
                        (z, jnp.int32(bb), p, z))
                    v_scale = jax.lax.dynamic_update_slice(
                        v_scale, vs_rows[:, bb:bb + 1, :1],
                        (z, jnp.int32(bb), p, z))
            if not quantized:
                k_scale = v_scale = None
            return x2[:, None, :], k_cache, v_cache, k_scale, v_scale
        if flat:
            k_rows = k_rows.reshape(L, B, 1, nkv, D)
            v_rows = v_rows.reshape(L, B, 1, nkv, D)
            k_cache = kx.reshape(L, B, S, nkv, D)
            v_cache = vx.reshape(L, B, S, nkv, D)
        # ONE write of all L new rows at the query position.  Per-batch
        # unrolled dynamic_update_slice (B ≤ 16 here) instead of a
        # gather-indexed scatter: XLA updates the donated cache IN PLACE
        # (the scatter materialized a full-cache copy — profiled ~160
        # µs/step).
        #
        # The write is a PURE clamped DUS — no old-row read, no select.
        # The S=4096 profile caught the guarded read-select-write variant
        # (dynamic_slice old + where(ok) + DUS) forcing TWO full-cache
        # copies per step (copy.38/39, ~625 µs each): the extra read of
        # the operand at the write location defeats XLA's in-place
        # DUS-fusion share analysis.  Clamping instead means a padded slot
        # (q_position == S, i.e. an EMPTY pool slot) clobbers row S-1 of
        # its OWN batch slot with the garbage row the kernels computed —
        # safe because (a) rows past a sequence's valid length are masked
        # by pre_len and never read, and (b) any row is rewritten at its
        # true position before that position becomes valid, so a
        # continuation that reaches S-1 overwrites it first.
        # BITNET_ROWS_WRITE=guarded restores the read-select-write for
        # A/B; =scatter uses .at[].set(mode="drop").
        wmode = _os.environ.get("BITNET_ROWS_WRITE", "clamped")
        if wmode == "scatter":
            li = jnp.arange(L, dtype=jnp.int32)[:, None, None]
            bi = jnp.arange(B, dtype=jnp.int32)[None, :, None]
            pi = q_positions[None, :, :]  # [1, B, 1]
            k_cache = k_cache.at[li, bi, pi].set(
                k_rows.astype(k_cache.dtype), mode="drop")
            v_cache = v_cache.at[li, bi, pi].set(
                v_rows.astype(v_cache.dtype), mode="drop")
            if quantized:
                k_scale = k_scale.at[li, bi, pi].set(ks_rows, mode="drop")
                v_scale = v_scale.at[li, bi, pi].set(vs_rows, mode="drop")
        else:
            guarded = wmode == "guarded"
            z = jnp.int32(0)
            for b in range(B):
                p = jnp.minimum(q_positions[b, 0], S - 1)
                ok = (q_positions[b, 0] < S)[None, None, None, None, None]

                def wr(cache, rows):
                    new = rows[:, b:b + 1, :, :, :][:, :, :1]
                    if guarded:
                        old = jax.lax.dynamic_slice(
                            cache, (z, jnp.int32(b), p, z, z),
                            (L, 1, 1, cache.shape[3], cache.shape[4]))
                        new = jnp.where(ok, new, old)
                    return jax.lax.dynamic_update_slice(
                        cache, new.astype(cache.dtype),
                        (z, jnp.int32(b), p, z, z))

                k_cache = wr(k_cache, k_rows)
                v_cache = wr(v_cache, v_rows)
                if quantized:
                    ok3 = ok[..., 0, 0]

                    def wrs(sc, rows):
                        new = rows[:, b:b + 1, :1]
                        if guarded:
                            old = jax.lax.dynamic_slice(
                                sc, (z, jnp.int32(b), p, z),
                                (L, 1, 1, sc.shape[3]))
                            new = jnp.where(ok3, new, old)
                        return jax.lax.dynamic_update_slice(
                            sc, new, (z, jnp.int32(b), p, z))

                    k_scale = wrs(k_scale, ks_rows)
                    v_scale = wrs(v_scale, vs_rows)
    else:
        if flat_in:
            k_cache = k_cache.reshape(L, B, S, nkv, D)
            v_cache = v_cache.reshape(L, B, S, nkv, D)
        if not quantized:
            # dummy tiny xs keep ONE scan body for both modes
            k_scale = jnp.zeros((L, B, 1, 1), jnp.float32)
            v_scale = jnp.zeros((L, B, 1, 1), jnp.float32)
        x2, (k_cache, v_cache, k_scale, v_scale) = jax.lax.scan(
            body, x[:, 0, :],
            (jnp.arange(L, dtype=jnp.int32), k_cache, v_cache,
             k_scale, v_scale))
    if not quantized:
        k_scale = v_scale = None
    if flat_in and k_cache.ndim == 5:
        k_cache = k_cache.reshape(L, B, S, nkv * D)
        v_cache = v_cache.reshape(L, B, S, nkv * D)
    return x2[:, None, :], k_cache, v_cache, k_scale, v_scale


def _prefill_stacked(cfg: ModelConfig, params: BitNetParams,
                     x: jnp.ndarray,              # [B, T, H] embedded
                     q_positions: jnp.ndarray,    # [B, T]
                     k_cache: jnp.ndarray,        # [L, B, S, KV, D]
                     v_cache: jnp.ndarray,
                     pre_len: jnp.ndarray,        # [B] valid cache slots
                     rope_sin: jnp.ndarray,       # [B, T, 1, D/2] rows
                     rope_cos: jnp.ndarray,
                     k_scale: jnp.ndarray | None = None,  # [L, B, S, KV]
                     v_scale: jnp.ndarray | None = None):
    """Prefill (T>1) with STACKED scalar-prefetch weight kernels.

    Same motivation as the decode loop (_decode_stacked): under
    ``lax.scan`` each layer's weight slice feeding a pallas operand is a
    materialized HBM copy — ~0.6 GB of stacked packs re-copied per
    forward pass.  The prefill matmuls are M-blocked
    (ternary_matmul_stacked_prefill) with norm/SwiGLU/quantize in XLA,
    where at M=B·T rows they amortize; attention and cache writes are the
    same XLA ops as block_forward's generic path, so numerics match the
    unstacked prefill bit-for-bit at matching block geometry.
    """
    from ..ops.flash import flash_attention
    from ..ops.ternary_matmul import ternary_matmul_stacked_prefill

    b = params.blocks
    B, T, H = x.shape
    M = B * T
    nh, nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L, S = k_cache.shape[0], k_cache.shape[2]
    eps = cfg.rms_norm_eps
    interp = jax.default_backend() != "tpu"
    sv = {n: _scale_vec(getattr(b, n))
          for n in ("wqkv", "wo", "w_gateup", "w_down")}
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    quantized = k_scale is not None
    has_asn = b.attn_sub_norm is not None
    has_fsn = b.ffn_sub_norm is not None
    # sub-norm gammas ride the scan as xs; absent ones use [L, 1] dummies
    # so ONE traced body covers both parameterizations
    asn = b.attn_sub_norm if has_asn else jnp.zeros((L, 1), jnp.float32)
    fsn = b.ffn_sub_norm if has_fsn else jnp.zeros((L, 1), jnp.float32)
    use_flash = T * S >= (1 << 19) and T > 1
    new_len = pre_len + T

    def mm(l, h2, name):
        lin = getattr(b, name)
        return ternary_matmul_stacked_prefill(
            l, h2, lin.packed, sv[name], k_dim=lin.k, n_dim=lin.n,
            interpret=interp)

    def body(h, xs):
        l, an, asn_l, fn, fsn_l, kc, vc, ks, vs = xs
        h2 = h.reshape(M, H)
        qkv = mm(l, rms_norm(h2, an, eps), "wqkv").reshape(B, T, -1)
        q = qkv[..., : nh * D].reshape(B, T, nh, D)
        kn = qkv[..., nh * D: (nh + nkv) * D].reshape(B, T, nkv, D)
        vn = qkv[..., (nh + nkv) * D:].reshape(B, T, nkv, D)
        q = apply_rope(q, rope_sin, rope_cos, q_positions)
        kn = apply_rope(kn, rope_sin, rope_cos, q_positions)
        if quantized:
            kq, ksr = _quantize_kv(kn, kc.dtype)
            vq, vsr = _quantize_kv(vn, vc.dtype)
            kc = kc.at[b_idx, q_positions].set(kq, mode="drop")
            vc = vc.at[b_idx, q_positions].set(vq, mode="drop")
            ks = ks.at[b_idx, q_positions].set(ksr, mode="drop")
            vs = vs.at[b_idx, q_positions].set(vsr, mode="drop")
            # f32 reads, NOT .astype(x.dtype): block_forward's generic
            # path keeps the dequantized cache f32 — bit-parity with the
            # flag-off prefill requires the same here (the decode loop's
            # bf16 cast is a different, decode-only trade)
            k_read = kc.astype(jnp.float32) * ks[..., None]
            v_read = vc.astype(jnp.float32) * vs[..., None]
        else:
            kc = kc.at[b_idx, q_positions].set(
                kn.astype(kc.dtype), mode="drop")
            vc = vc.at[b_idx, q_positions].set(
                vn.astype(vc.dtype), mode="drop")
            k_read, v_read = kc, vc
        if use_flash:
            attn = flash_attention(q, k_read, v_read, q_positions, new_len)
        else:
            attn = attention(q, k_read, v_read, q_positions, new_len)
        a2 = attn.reshape(M, nh * D)
        if has_asn:
            a2 = rms_norm(a2, asn_l, eps)
        h2 = mm(l, a2, "wo") + h2
        g2 = rms_norm(h2, fn, eps)
        gu = mm(l, g2, "w_gateup")
        F = gu.shape[1] // 2
        act = jax.nn.silu(gu[:, :F]) * gu[:, F:]
        if has_fsn:
            act = rms_norm(act, fsn_l, eps)
        h2 = mm(l, act, "w_down") + h2
        return h2.reshape(B, T, H), (kc, vc, ks, vs)

    if not quantized:
        k_scale = jnp.zeros((L, B, 1, 1), jnp.float32)
        v_scale = jnp.zeros((L, B, 1, 1), jnp.float32)
    x, (k_cache, v_cache, k_scale, v_scale) = jax.lax.scan(
        body, x,
        (jnp.arange(L, dtype=jnp.int32), b.attn_norm, asn, b.ffn_norm,
         fsn, k_cache, v_cache, k_scale, v_scale))
    if not quantized:
        k_scale = v_scale = None
    return x, k_cache, v_cache, k_scale, v_scale


def embed_tokens(params: BitNetParams, tokens: jnp.ndarray) -> jnp.ndarray:
    """[B, T] int32 → [B, T, H] activations (reference: embed, lib.rs:1278)."""
    return jnp.take(params.embed, tokens, axis=0)


def _quantize_kv(x: jnp.ndarray, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-vector absmax quantization for the int8/fp8 KV cache.

    x: [B, T, KV, D] → (q same shape in ``dtype``, scale [B, T, KV] f32).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    qmax = 127.0 if dtype == jnp.int8 else 448.0  # fp8_e4m3 max
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = x.astype(jnp.float32) / scale[..., None]
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -127, 127)
    return q.astype(dtype), scale


def block_qkv(
    cfg: ModelConfig,
    bp: "BlockParams",           # single layer (no L axis)
    x: jnp.ndarray,              # [B, T, H]
    rope_sin: jnp.ndarray,
    rope_cos: jnp.ndarray,
    q_positions: jnp.ndarray,    # [B, T]
    kernel_path: str = "xla",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Projection + RoPE half of a block: handles BOTH the fused-wqkv and
    unfused parameterizations (attn_norm fuses into the kernel preamble).

    Shared by block_forward and the sequence-parallel/ring prefills
    (parallel/sequence.py, parallel/ring.py) so every parallelism mode
    runs the SHIPPED parameterization — fused projections and the 2B-4T
    sub-norms included.  Returns (q [B,T,nh,D], k, v [B,T,nkv,D]) roped.
    """
    B, T, H = x.shape
    nh, nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    lapn = partial(linear_apply_normed, eps=cfg.rms_norm_eps,
                   path=kernel_path)
    if bp.wqkv is not None:
        qkv = lapn(bp.wqkv, x, bp.attn_norm)   # ONE fused kernel call
        q = qkv[..., : nh * D].reshape(B, T, nh, D)
        k = qkv[..., nh * D: (nh + nkv) * D].reshape(B, T, nkv, D)
        v = qkv[..., (nh + nkv) * D:].reshape(B, T, nkv, D)
    else:
        h = rms_norm(x, bp.attn_norm, cfg.rms_norm_eps)
        q = lapn(bp.wq, h, None).reshape(B, T, nh, D)
        k = lapn(bp.wk, h, None).reshape(B, T, nkv, D)
        v = lapn(bp.wv, h, None).reshape(B, T, nkv, D)
    if rope_sin.ndim == 2:
        rope_pos = jnp.minimum(q_positions, rope_sin.shape[0] - 1)
    else:
        rope_pos = q_positions  # pre-gathered rows ignore positions
    q = apply_rope(q, rope_sin, rope_cos, rope_pos)
    k = apply_rope(k, rope_sin, rope_cos, rope_pos)
    return q, k, v


def block_finish(
    cfg: ModelConfig,
    bp: "BlockParams",
    x: jnp.ndarray,              # [B, T, H] PRE-attention residual
    attn: jnp.ndarray,           # [B, T, nh, D] or [B, T, nh*D]
    kernel_path: str = "xla",
) -> jnp.ndarray:
    """o-projection (+ 2B-4T attn_sub_norm) + residual + FFN — the half of
    a block after attention; shared with the SP/ring prefills."""
    B, T, _ = x.shape
    lapn = partial(linear_apply_normed, eps=cfg.rms_norm_eps,
                   path=kernel_path)
    x = lapn(bp.wo, attn.reshape(B, T, -1), bp.attn_sub_norm, resid=x)
    return _ffn(cfg, bp, x, kernel_path)


def block_forward(
    cfg: ModelConfig,
    x: jnp.ndarray,              # [B, T, H]
    bp: BlockParams,             # single layer (no L axis)
    rope_sin: jnp.ndarray,
    rope_cos: jnp.ndarray,
    q_positions: jnp.ndarray,    # [B, T]; padded slots hold S (OOB)
    k_cache: jnp.ndarray,        # [B, S, nkv, D]
    v_cache: jnp.ndarray,        # [B, S, nkv, D]
    kv_valid_len: jnp.ndarray,   # [B]
    kernel_path: str = "xla",
    k_scale: jnp.ndarray | None = None,   # [B, S, nkv] (quantized cache)
    v_scale: jnp.ndarray | None = None,
    write_slots: jnp.ndarray | None = None,   # [B, T] cache slots (ring buf)
    kv_positions: jnp.ndarray | None = None,  # [B, S] abs pos per slot
    window: int | None = None,                # sliding-window width
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray | None, jnp.ndarray | None]:
    """One transformer block; returns (y, k_cache, v_cache, k_scale, v_scale).

    ``write_slots`` (default: the absolute positions) decouples where KV is
    *stored* from where it logically *is* — the ring-buffer windowed cache
    writes at ``pos % W`` and supplies ``kv_positions`` so attention masks
    by true position (reference WindowedKVCache, sliding_window.rs:238).
    """
    B, T, H = x.shape
    nh, nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    lap = partial(linear_apply, path=kernel_path)
    if write_slots is None:
        write_slots = q_positions

    # --- attention ---
    lapn = partial(linear_apply_normed, eps=cfg.rms_norm_eps,
                   path=kernel_path)
    quantized0 = k_scale is not None
    fast_decode = (T == 1 and B <= 2 and not quantized0
                   and kv_positions is None and window is None
                   and write_slots is q_positions
                   and kernel_path in ("pallas", "w2a8"))
    # opt-in (BITNET_ROPE_FUSED=1): measured on v5e the rope-fused kernel
    # is FASTER in isolation (3.5 vs 4.4 µs/layer) but flips XLA's layout
    # assignment for the KV cache in the full model — per-layer
    # layout-changing cache copies (~170 µs/layer, profiler `copy.42/44`)
    # swamp the win.  Kept for re-evaluation on newer XLA.
    import os as _os
    if (fast_decode and bp.wqkv is not None and rope_sin.ndim == 4
            and _os.environ.get("BITNET_ROPE_FUSED", "0") == "1"):
        # rope-fused path: the RAW qkv row feeds ONE kernel that applies
        # RoPE, runs flash-decode attention, and hands back the roped
        # k / v rows for the cache scatter — the q/k/v slicing and both
        # rope fusions disappear from the XLA graph
        from ..ops.decode_attention import decode_attention_qkv

        qkv = lapn(bp.wqkv, x, bp.attn_norm)
        attn1, k_row, v_row = decode_attention_qkv(
            qkv[:, 0], rope_sin[:, 0, 0, :], rope_cos[:, 0, 0, :],
            k_cache, v_cache, kv_valid_len, n_heads=nh,
            interpret=jax.default_backend() != "tpu")
        b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
        k_cache = k_cache.at[b_idx, write_slots].set(
            k_row[:, None], mode="drop")
        v_cache = v_cache.at[b_idx, write_slots].set(
            v_row[:, None], mode="drop")
        attn = attn1[:, None].reshape(B, T, nh * D)
        x = lapn(bp.wo, attn, bp.attn_sub_norm, resid=x)
        x = _ffn(cfg, bp, x, kernel_path)
        return x, k_cache, v_cache, k_scale, v_scale
    # projections + RoPE (fused/unfused + attn_norm preamble): shared
    # helper so SP/ring run the identical parameterization
    q, k, v = block_qkv(cfg, bp, x, rope_sin, rope_cos, q_positions,
                        kernel_path)

    # cache write: scatter at write slots; slot==S drops (padding)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    quantized = k_scale is not None

    # --- fused decode-attention fast path (T=1, plain dense cache) ---
    # one Pallas kernel replaces ~12 XLA fusions per layer (the measured
    # ~37 µs/layer decode overhead); the new token's KV is handled
    # in-kernel so the cache scatter moves off the critical path.
    # B-gated: the kernel's grid steps scale with B while the XLA einsum
    # path batches rows, so big pools keep XLA (v5e: B=1 3.17→2.57 ms/tok
    # with the kernel; B=8 was faster on XLA attention)
    if fast_decode:
        from .. import ops as _ops  # noqa: F401 (namespace)
        from ..ops.decode_attention import decode_attention

        attn1 = decode_attention(
            q[:, 0], k[:, 0], v[:, 0], k_cache, v_cache, kv_valid_len,
            interpret=jax.default_backend() != "tpu")
        k_cache = k_cache.at[b_idx, write_slots].set(
            k.astype(k_cache.dtype), mode="drop")
        v_cache = v_cache.at[b_idx, write_slots].set(
            v.astype(v_cache.dtype), mode="drop")
        x = block_finish(cfg, bp, x, attn1[:, None], kernel_path)
        return x, k_cache, v_cache, k_scale, v_scale
    if quantized:
        kq, ks = _quantize_kv(k, k_cache.dtype)
        vq, vs = _quantize_kv(v, v_cache.dtype)
        k_cache = k_cache.at[b_idx, write_slots].set(kq, mode="drop")
        v_cache = v_cache.at[b_idx, write_slots].set(vq, mode="drop")
        k_scale = k_scale.at[b_idx, write_slots].set(ks, mode="drop")
        v_scale = v_scale.at[b_idx, write_slots].set(vs, mode="drop")
        k_read = k_cache.astype(jnp.float32) * k_scale[..., None]
        v_read = v_cache.astype(jnp.float32) * v_scale[..., None]
    else:
        k_cache = k_cache.at[b_idx, write_slots].set(
            k.astype(k_cache.dtype), mode="drop")
        v_cache = v_cache.at[b_idx, write_slots].set(
            v.astype(v_cache.dtype), mode="drop")
        k_read, v_read = k_cache, v_cache

    new_len = kv_valid_len + T  # engine guarantees T real tokens ≤ T
    # long prefill: dense scores would be [B,KV,G,T,S] f32 — switch to the
    # chunked online-softmax path above ~0.5M score elements per head
    # (trace-time decision; shapes are static under jit)
    if kv_positions is None and T * k_read.shape[1] >= (1 << 19) and T > 1:
        from ..ops.flash import flash_attention

        attn = flash_attention(q, k_read, v_read, q_positions, new_len,
                               window=window)
    else:
        attn = attention(q, k_read, v_read, q_positions, new_len,
                         kv_positions=kv_positions, window=window)
    # o-projection (+ 2B-4T attn sub-norm) + residual + SwiGLU FFN
    x = block_finish(cfg, bp, x, attn, kernel_path)
    return x, k_cache, v_cache, k_scale, v_scale


def forward(
    cfg: ModelConfig,
    params: BitNetParams,
    tokens: jnp.ndarray,         # [B, T]
    q_positions: jnp.ndarray,    # [B, T]
    k_cache: jnp.ndarray,        # [L, B, S, nkv, D]
    v_cache: jnp.ndarray,        # [L, B, S, nkv, D]
    kv_valid_len: jnp.ndarray,   # [B] valid length BEFORE this call
    num_real_tokens: jnp.ndarray | int | None = None,  # per-batch new tokens
    kernel_path: str = "xla",
    k_scale: jnp.ndarray | None = None,   # [L, B, S, nkv] (int8/fp8 cache)
    v_scale: jnp.ndarray | None = None,
    write_slots: jnp.ndarray | None = None,   # [B, T] (ring-buffer cache)
    kv_positions: jnp.ndarray | None = None,  # [B, S]
    window: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray | None, jnp.ndarray | None]:
    """Full forward.

    Returns (hidden [B, T, H], k_cache, v_cache, k_scale, v_scale).
    ``kv_valid_len`` advances by the number of *real* (non-padded) new
    tokens, which the engine passes via ``num_real_tokens`` ([B] or scalar;
    defaults to T).
    """
    x = embed_tokens(params, tokens)
    B, T, H = x.shape
    if num_real_tokens is None:
        num_real_tokens = T

    # attention masking needs the post-write valid length; block_forward
    # computes new_len = pre_len + T, so hand it pre_len adjusted so that
    # pre_len + T == kv_valid_len + num_real_tokens.
    _pre_len = kv_valid_len + jnp.asarray(num_real_tokens, jnp.int32) - T

    # pre-gather the rope rows ONCE for all layers (positions are
    # layer-invariant; 30 redundant table gathers otherwise, and the
    # rope-fused decode-attention kernel needs the rows directly)
    if params.rope_sin.ndim == 2:
        rp = jnp.minimum(q_positions, params.rope_sin.shape[0] - 1)
        rope_sin = params.rope_sin[rp][:, :, None, :]   # [B, T, 1, D/2]
        rope_cos = params.rope_cos[rp][:, :, None, :]
    else:
        rope_sin, rope_cos = params.rope_sin, params.rope_cos

    if _stacked_decode_ok(cfg, params, T, B, k_scale, kv_positions,
                          window, write_slots, kernel_path):
        # _decode_stacked accepts flat [L, B, S, KV*D] caches natively
        # (and returns them in the caller's layout)
        h, k_cache, v_cache, k_scale, v_scale = _decode_stacked(
            cfg, params, x, q_positions, k_cache, v_cache, _pre_len,
            rope_sin, rope_cos, k_scale, v_scale)
        h = rms_norm(h, params.final_norm, cfg.rms_norm_eps)
        return h, k_cache, v_cache, k_scale, v_scale

    # prefill / generic paths run on 5D caches; a flat caller gets its
    # layout back on return (outside any loop these reshapes are
    # bitcasts on row-major layouts)
    flat_in = k_cache is not None and k_cache.ndim == 4
    if flat_in:
        Lc, Bc, Sc = k_cache.shape[0], k_cache.shape[1], k_cache.shape[2]
        k_cache = k_cache.reshape(Lc, Bc, Sc, cfg.num_kv_heads,
                                  cfg.head_dim)
        v_cache = v_cache.reshape(Lc, Bc, Sc, cfg.num_kv_heads,
                                  cfg.head_dim)

    def _restore(kc, vc):
        if flat_in:
            return (kc.reshape(Lc, Bc, Sc, -1), vc.reshape(Lc, Bc, Sc, -1))
        return kc, vc

    if _stacked_prefill_ok(cfg, params, T, kv_positions, window,
                           write_slots, kernel_path):
        h, k_cache, v_cache, k_scale, v_scale = _prefill_stacked(
            cfg, params, x, q_positions, k_cache, v_cache, _pre_len,
            rope_sin, rope_cos, k_scale, v_scale)
        h = rms_norm(h, params.final_norm, cfg.rms_norm_eps)
        k_cache, v_cache = _restore(k_cache, v_cache)
        return h, k_cache, v_cache, k_scale, v_scale

    def body(carry, xs):
        h = carry
        bp, kc, vc, ks, vs = xs
        y, kc, vc, ks, vs = block_forward(
            cfg, h, bp, rope_sin, rope_cos,
            q_positions, kc, vc, _pre_len, kernel_path, ks, vs,
            write_slots, kv_positions, window,
        )
        return y, (kc, vc, ks, vs)

    x, (k_cache, v_cache, k_scale, v_scale) = jax.lax.scan(
        body, x, (params.blocks, k_cache, v_cache, k_scale, v_scale)
    )
    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
    k_cache, v_cache = _restore(k_cache, v_cache)
    return x, k_cache, v_cache, k_scale, v_scale


def forward_cache(
    cfg: ModelConfig,
    params: BitNetParams,
    tokens: jnp.ndarray,         # [B, T]
    q_positions: jnp.ndarray,    # [B, T]
    cache,                       # engine.cache.KVCache
    num_real_tokens: jnp.ndarray | int | None = None,
    kernel_path: str = "xla",
):
    """KVCache-pytree convenience wrapper around :func:`forward`.

    Returns (hidden, new_cache) with ``cache.lengths`` advanced.
    """
    import dataclasses as _dc

    if num_real_tokens is None:
        num_real_tokens = tokens.shape[1]
    h, k, v, ks, vs = forward(
        cfg, params, tokens, q_positions, cache.k, cache.v, cache.lengths,
        num_real_tokens, kernel_path, cache.k_scale, cache.v_scale,
    )
    new_cache = _dc.replace(
        cache, k=k, v=v, k_scale=ks, v_scale=vs,
        lengths=cache.lengths + jnp.asarray(num_real_tokens, jnp.int32),
    )
    return h, new_cache


def logits(
    cfg: ModelConfig,
    params: BitNetParams,
    hidden: jnp.ndarray,          # [B, T, H] (already final-normed)
    kernel_path: str = "xla",
) -> jnp.ndarray:
    """Project hidden states to vocab logits (reference: lib.rs:1599)."""
    if params.lm_head is not None:
        return linear_apply(params.lm_head, hidden, path=kernel_path)
    if params.embed_q is not None and kernel_path == "w2a8":
        # int8 head (quantize_head): per-row table scales × per-token
        # activation scale, int8×int8→int32 MXU — halves the dominant
        # [V, H] HBM read of tied-logits decode
        hf = hidden.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        hq = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            hq, params.embed_q,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx
                * params.embed_q_scale[None, None, :])
    # tied embeddings: x @ E^T on the MXU in the table's stored dtype with
    # f32 accumulation — casting the [V, H] table up to f32 would read it
    # at 2x the bytes (the whole op is HBM-bound at decode)
    return jax.lax.dot_general(
        hidden.astype(params.embed.dtype), params.embed,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
