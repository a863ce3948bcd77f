"""Ternary linear layers: parameter pytree + apply dispatch.

Replaces the reference's ``QuantizedLinear`` + ``KernelProvider`` dispatch
(``bitnet-inference/src/layers/quantized_linear.rs:502``,
``bitnet-kernels/src/lib.rs:39-58``) with a single TPU design:

- weights live in HBM **packed** (2-bit codes, 4/byte) in a tile-local
  interleaved layout chosen so Pallas kernels (and the XLA fallback) unpack
  with nothing but shifts/masks + one reshape;
- ``apply`` dispatches between the fused Pallas kernel and a pure-XLA
  dequant path (the correctness fallback, like the reference's dequant
  route in ``bitnet-models/src/bitnet.rs:37-81``).

Packed layout ("tile-local interleave", tile KT=256 rows of K):
for K-tile ``t`` and in-tile row ``r = j*(KT/4) + i``,
``code(t*KT + r, n)`` is bits ``[2j+1:2j]`` of byte ``i`` of the tile.

**Device storage is int32 words** [Kp/16, N]: word ``s`` packs byte rows
``4s..4s+3`` little-endian.  This is bit-identical to the byte layout but
lets Pallas kernels unpack 4 codes per lane per shift plane:
``(word >> 2p) & 0x03030303`` extracts plane ``p`` of all 4 bytes at once,
and a cross-size ``pltpu.bitcast`` (i32 -> i8, sublane-major little-endian
— verified on v5e) splits the bytes back into rows ``4s+j``.  Output row
``p*64 + 4s + j`` of a 256-subtile is exactly logical row ``p*(KT/4) + i``
with ``i = 4s+j`` — i.e. the SAME interleave as the byte layout, so the
two views share one packer (experiments/exp_w2a8.py P1/P4).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import QuantizationError

# K-tile granularity of the interleaved layout; BitNet dims (2560, 6912,
# head_dim multiples of 128) are all multiples of 256.
KT_PACK = 256


# --------------------------------------------------------------------------
# Host-side repacking (numpy, load time)
# --------------------------------------------------------------------------
def pad_k(k: int, kt: int = KT_PACK) -> int:
    return -(-k // kt) * kt


def repack_codes_for_tpu(codes_kn: np.ndarray, kt: int = KT_PACK) -> np.ndarray:
    """Repack logical codes [K, N] (uint2 in uint8) into [Kp/4, N] bytes.

    Rows are zero-padded to a multiple of ``kt``; padded rows hold code 0
    (value -2) — harmless because callers zero-pad activations along K.
    """
    K, N = codes_kn.shape
    Kp = pad_k(K, kt)
    if Kp != K:
        codes_kn = np.concatenate(
            [codes_kn, np.zeros((Kp - K, N), dtype=np.uint8)], axis=0
        )
    tiles = codes_kn.reshape(Kp // kt, 4, kt // 4, N).astype(np.uint8)
    packed = (
        tiles[:, 0]
        | (tiles[:, 1] << 2)
        | (tiles[:, 2] << 4)
        | (tiles[:, 3] << 6)
    )
    return packed.reshape(Kp // 4, N)


def unpack_codes_host(packed: np.ndarray, k: int, kt: int = KT_PACK) -> np.ndarray:
    """Inverse of :func:`repack_codes_for_tpu` (host/numpy, for tests)."""
    Kp4, N = packed.shape
    ntiles = Kp4 // (kt // 4)
    p = packed.reshape(ntiles, kt // 4, N)
    parts = np.stack([(p >> (2 * j)) & 3 for j in range(4)], axis=1)
    return parts.reshape(ntiles * kt, N)[:k]


def fold_packed_words(packed_bytes: np.ndarray) -> np.ndarray:
    """[Kp/4, N] uint8 bytes -> [Kp/16, N] int32 words (device storage).

    Word ``s`` = byte rows ``4s..4s+3`` little-endian; bit-identical view
    of the same interleave (see module docstring).  On little-endian
    hosts one transposed copy + a dtype view beats the shift/or route
    (which widens the whole array to uint32 and walks strided slices —
    ~6 passes over 4x the bytes).
    """
    import sys

    Kp4, N = packed_bytes.shape
    if sys.byteorder == "little":
        b = np.ascontiguousarray(
            packed_bytes.reshape(Kp4 // 4, 4, N).transpose(0, 2, 1))
        return b.view(np.uint32).reshape(Kp4 // 4, N).view(np.int32)
    b = packed_bytes.reshape(Kp4 // 4, 4, N).astype(np.uint32)
    words = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    return words.view(np.int32)


def unpack_words_host(words: np.ndarray, k: int, kt: int = KT_PACK) -> np.ndarray:
    """[Kp/16, N] int32 words -> [K, N] uint8 codes (host/numpy)."""
    w = words.view(np.uint32)
    R, N = w.shape
    by = np.stack([(w >> (8 * j)) & 0xFF for j in range(4)],
                  axis=1).reshape(R * 4, N).astype(np.uint8)
    return unpack_codes_host(by, k, kt)


# --------------------------------------------------------------------------
# Parameter pytree
# --------------------------------------------------------------------------
@partial(
    jax.tree_util.register_dataclass,
    data_fields=["weight", "packed", "scales"],
    meta_fields=["kind", "k", "n"],
)
@dataclasses.dataclass
class TernaryLinear:
    """One linear layer's parameters (or a [L, ...]-stacked set of them).

    kind:
      'dense'    — ``weight`` [K, N] floats, plain matmul
      'qk256'    — ``packed`` [Kp/16, N] int32 words; value = LUT[code]
                   (scales is a broadcastable per-tensor scalar array,
                   usually 1.0)
      'bitnet32' — ``packed`` [Kp/16, N] int32 words; ``scales``
                   [K/32, N] f32; value = LUT[code] * scale
      'tl'       — TL1/TL2 table-lookup layout (runtime weight quant,
                   reference bitnet-quantization/src/tl1.rs:19-82):
                   ``packed`` like bitnet32 but value = (code - 2) *
                   scale (levels {-2,-1,0,1}, zero-point 2 — the kernels
                   reuse the same zero-point identity with the
                   (code>>1) LUT-bias add dropped).  TL per-block scales
                   (block 64/128) arrive EXPANDED to [K/32, N].
    """

    kind: str
    k: int
    n: int
    weight: Optional[jnp.ndarray] = None
    packed: Optional[jnp.ndarray] = None
    scales: Optional[jnp.ndarray] = None


# code → value via arithmetic (no gather): v = c + (c >= 2) - 2
# maps {0,1,2,3} → {-2,-1,1,2}, the GGML-verified LUT (quant/ternary.py).
def _codes_to_values(codes: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    c = codes.astype(jnp.int8)
    return (c + (c >= 2).astype(jnp.int8) - 2).astype(dtype)


def _unpack_packed(packed: jnp.ndarray, kt: int = KT_PACK) -> jnp.ndarray:
    """[Kp/16, N] int32 words → [Kp, N] uint8 codes (XLA fallback path).

    Word ``s``, byte ``j``, bit-plane ``p`` → logical row ``p*64 + 4s + j``
    within each 256-row subtile (matches the Pallas word unpack).
    """
    R, N = packed.shape
    ntiles = R // (kt // 16)
    w = packed.reshape(ntiles, kt // 16, N)
    # [ntiles, plane(4), word(kt/16), byte(4), N] → row = p*64 + 4s + j
    parts = jnp.stack(
        [jnp.stack([(w >> (8 * j + 2 * p)) & 3 for j in range(4)], axis=2)
         for p in range(4)], axis=1)
    return parts.reshape(ntiles * kt, N).astype(jnp.uint8)


def dequantize_weight(lin: TernaryLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the dense [K, N] weight (XLA fallback path)."""
    if lin.kind == "dense":
        return lin.weight.astype(dtype)
    codes = _unpack_packed(lin.packed)[: lin.k, : lin.n]
    if lin.kind == "tl":
        # TL reverse table: value = (code - 2) * scale (tl1.rs:49-82)
        vals = (codes.astype(jnp.int8) - 2).astype(jnp.float32)
        s = jnp.repeat(lin.scales.astype(jnp.float32), 32, axis=0)
        return (vals * s[: lin.k, : lin.n]).astype(dtype)
    vals = _codes_to_values(codes, jnp.float32)
    if lin.kind == "bitnet32":
        # scales [K/32, Np] broadcast over 32-row blocks
        s = jnp.repeat(lin.scales.astype(jnp.float32), 32, axis=0)
        vals = vals * s[: lin.k, : lin.n]
    elif lin.kind == "qk256":
        if lin.scales is not None:
            s = lin.scales.astype(jnp.float32)
            if s.ndim >= 2:               # fused per-column vector [1, Np]
                s = s[..., :, : lin.n]
            vals = vals * s
    else:
        raise QuantizationError(f"unknown TernaryLinear kind {lin.kind!r}")
    return vals.astype(dtype)


def linear_apply(
    lin: TernaryLinear,
    x: jnp.ndarray,
    path: str = "xla",
) -> jnp.ndarray:
    """``y = x @ W`` for [..., K] activations.

    ``path``:
      'xla'    — dequantize-then-matmul (XLA fuses the unpack);
      'pallas' — fused unpack+MXU kernel, bf16 activations (exact);
      'w2a8'   — fused kernel with int8-quantized activations feeding the
                 int8 MXU (per-token absmax — the TPU translation of the
                 reference's W2A8 ``matmul_i2s_avx2``,
                 bitnet-kernels/src/cpu/x86.rs:417).  qk256 only;
                 bitnet32 falls back to the exact bf16 kernel.
    """
    if lin.kind == "dense":
        return jnp.matmul(
            x, lin.weight.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if path in ("pallas", "w2a8"):
        from .ternary_matmul import ternary_matmul_pallas

        return ternary_matmul_pallas(lin, x, variant=path)
    w = dequantize_weight(lin, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def linear_apply_normed(
    lin: TernaryLinear,
    x: jnp.ndarray,
    gamma: jnp.ndarray | None = None,
    eps: float = 1e-5,
    path: str = "xla",
    glu: bool = False,
    resid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``y = rms_norm(x, gamma) @ W`` (or plain ``x @ W`` when ``gamma``
    is None) with the norm + activation quantization fused into the
    Pallas kernel preamble on eligible w2a8 decode shapes.

    Every BitNet matmul is preceded by an RMSNorm (attn_norm→qkv,
    attn_sub_norm→o, ffn_norm→gate/up, ffn_sub_norm→down), so fusing the
    norm into the kernel removes ALL standalone norm fusions from the
    decode step (exp_fixed_ops.py S1: ~8 µs/layer at B=1).
    """
    if lin.kind != "dense" and path in ("pallas", "w2a8"):
        from .ternary_matmul import ternary_matmul_pallas

        return ternary_matmul_pallas(lin, x, variant=path, gamma=gamma,
                                     eps=eps, glu=glu, resid=resid)
    if glu:
        import jax

        K = x.shape[-1] // 2
        x = jax.nn.silu(x[..., :K]) * x[..., K:]
    if gamma is not None:
        from .rmsnorm import rms_norm

        x = rms_norm(x, gamma, eps)
    y = linear_apply(lin, x, path=path)
    return y if resid is None else y + resid


# --------------------------------------------------------------------------
# Projection fusion (kernel-launch reduction)
# --------------------------------------------------------------------------
def concat_linears(lins: list[TernaryLinear]) -> TernaryLinear:
    """Concatenate linears along N into ONE kernel call (decode is
    launch-overhead- and DMA-efficiency-bound at M=1; fusing QKV / gate+up
    cuts per-layer launches from 7 to 4 and triples the N-block width).

    Requirements: same kind, same K, every N a 128 multiple (true for all
    BitNet dims).  Works on stacked ([L, ...]) linears too.  qk256
    per-tensor scalar scales become a per-column vector ([..., 1, Ntot]),
    applied inside the kernel.
    """
    kinds = {l.kind for l in lins}
    if len(kinds) != 1:
        raise QuantizationError(f"cannot fuse mixed kinds {kinds}")
    kind = kinds.pop()
    if kind == "dense":
        weight = jnp.concatenate([l.weight for l in lins], axis=-1)
        return TernaryLinear(kind="dense", k=lins[0].k,
                             n=sum(l.n for l in lins), weight=weight)
    if any(l.n % LANE != 0 for l in lins):
        raise QuantizationError(
            f"fusion needs 128-aligned widths, got {[l.n for l in lins]}")
    if len({l.k for l in lins}) != 1:
        raise QuantizationError("fusion needs equal K")
    packed = jnp.concatenate([l.packed for l in lins], axis=-1)
    n_total = sum(l.n for l in lins)
    if kind in ("bitnet32", "tl"):   # per-K-block scales concat along N
        scales = jnp.concatenate([l.scales for l in lins], axis=-1)
    else:  # qk256: scalar-per-tensor → per-column vector [..., 1, Ntot]
        cols = []
        for l in lins:
            s = jnp.asarray(l.scales, jnp.float32)
            tile = (*s.shape, 1, l.n)          # ([L,] 1, n)
            cols.append(jnp.broadcast_to(
                s.reshape(*s.shape, 1, 1), tile))
        scales = jnp.concatenate(cols, axis=-1)
    return TernaryLinear(kind=kind, k=lins[0].k, n=n_total,
                         packed=packed, scales=scales)


# --------------------------------------------------------------------------
# Constructors
# --------------------------------------------------------------------------
def dense_linear(weight_kn: np.ndarray | jnp.ndarray) -> TernaryLinear:
    k, n = weight_kn.shape
    return TernaryLinear(kind="dense", k=k, n=n, weight=jnp.asarray(weight_kn))


# lane width: packed/scales columns are padded to a 128 multiple so Pallas
# tiles are always legal (real BitNet dims are already 128-aligned).
LANE = 128


def _pad_cols(a: np.ndarray, mult: int = LANE) -> np.ndarray:
    n = a.shape[1]
    target = -(-n // mult) * mult
    if target == n:
        return a
    return np.concatenate(
        [a, np.zeros((a.shape[0], target - n), dtype=a.dtype)], axis=1
    )


def _repack_words(codes_kn: np.ndarray) -> np.ndarray:
    """Tile repack straight to device int32 words via the native codec
    when available (load-time hotspot; see native/bitnet_host.cpp),
    numpy otherwise."""
    from ..native import repack_codes_tpu_words

    return repack_codes_tpu_words(codes_kn)


def qk256_linear_from_codes(
    codes_kn: np.ndarray, scale: float | np.ndarray = 1.0
) -> TernaryLinear:
    k, n = codes_kn.shape
    packed = jnp.asarray(_pad_cols(_repack_words(codes_kn)))
    return TernaryLinear(
        kind="qk256", k=k, n=n, packed=packed,
        scales=jnp.asarray(np.float32(scale)),
    )


def qk256_linear_from_payload(
    payload: np.ndarray, out_dim: int, in_dim: int,
    scale: float | np.ndarray = 1.0,
) -> TernaryLinear:
    """QK256 GGUF payload (stored [out, in] output-major) → TernaryLinear,
    fused transpose+interleave+fold in one native pass — no [K, N] codes
    temporary (the 2B-model load went ~170 s → seconds with this path)."""
    from ..native import qk256_payload_to_tpu_words

    stride = -(-in_dim // 256) * 64
    if payload.size < out_dim * stride:
        raise QuantizationError(
            f"QK256 payload too small: {payload.size} < "
            f"{out_dim * stride} bytes for [{out_dim}, {in_dim}]")
    out_cols = -(-out_dim // LANE) * LANE
    packed = jnp.asarray(
        qk256_payload_to_tpu_words(payload, out_dim, in_dim, out_cols))
    return TernaryLinear(
        kind="qk256", k=in_dim, n=out_dim, packed=packed,
        scales=jnp.asarray(np.float32(scale)),
    )


def bitnet32_linear_from_codes(
    codes_kn: np.ndarray, scales_blocks_kn: np.ndarray
) -> TernaryLinear:
    """``codes_kn`` [K, N]; ``scales_blocks_kn`` [K/32, N] f32."""
    k, n = codes_kn.shape
    if k % 32 != 0:
        raise QuantizationError(f"bitnet32 needs K % 32 == 0, got {k}")
    packed = jnp.asarray(_pad_cols(_repack_words(codes_kn)))
    scales = _pad_cols(np.asarray(scales_blocks_kn, dtype=np.float32))
    return TernaryLinear(
        kind="bitnet32", k=k, n=n, packed=packed,
        scales=jnp.asarray(scales),
    )


def tl_linear_from_codes(
    codes_kn: np.ndarray, scales_blocks_kn: np.ndarray, block: int
) -> TernaryLinear:
    """TL1/TL2 runtime-quantized linear in the kernel layout.

    ``codes_kn`` [K, N] unsigned 2-bit LUT indices (value = code - 2);
    ``scales_blocks_kn`` [K/block, N] f32 per-block scales with ``block``
    ∈ {64 (TL1), 128 (TL2)} — expanded here to the kernels' 32-row scale
    granularity (exact: a TL block is a whole number of 32-rows)."""
    k, n = codes_kn.shape
    if k % block != 0:
        raise QuantizationError(f"TL needs K % {block} == 0, got {k}")
    packed = jnp.asarray(_pad_cols(_repack_words(codes_kn)))
    s32 = np.repeat(np.asarray(scales_blocks_kn, np.float32),
                    block // 32, axis=0)
    return TernaryLinear(
        kind="tl", k=k, n=n, packed=packed,
        scales=jnp.asarray(_pad_cols(s32)),
    )
