"""TL1 / TL2 table-lookup codecs.

In the reference these are platform-tuned LUT formats
(``crates/bitnet-quantization/src/tl1.rs`` ARM/NEON block=64,
``src/tl2.rs`` x86/AVX block=128).  Both are symmetric 2-bit codecs whose
codes are *unsigned* LUT indices (``pack_unsigned_2bit_values``,
``utils.rs:96``) with reverse table ``value = (code - 2) * scale`` and
``scale = absmax / (num_levels/2 - 1) = absmax`` (``tl1.rs:49-82``).

On TPU the platform distinction is meaningless — both decode through the
same vectorized numpy path; the block size is the only difference.
"""

from __future__ import annotations

import numpy as np

from ..errors import QuantizationError
from .ternary import pack_codes_lsb_first, unpack_codes_lsb_first

TL1_BLOCK = 64
TL2_BLOCK = 128
_NUM_LEVELS = 4  # 2-bit


def _tl_quantize(x: np.ndarray, block: int) -> tuple[bytes, np.ndarray]:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    nblocks = -(-x.size // block)
    padded = np.zeros(nblocks * block, dtype=np.float32)
    padded[: x.size] = x
    blocked = padded.reshape(nblocks, block)
    absmax = np.abs(blocked).max(axis=1)
    # symmetric scale: absmax / (num_levels/2 - 1) = absmax / 1
    scale = np.where(absmax == 0.0, 1.0, absmax).astype(np.float32)
    # code = clamp(round(x/scale) + 2, 0, 3)  (levels {-2,-1,0,1})
    q = np.round(blocked / scale[:, None]).astype(np.int32) + _NUM_LEVELS // 2
    codes = np.clip(q, 0, _NUM_LEVELS - 1).astype(np.uint8)
    packed = pack_codes_lsb_first(codes.reshape(-1))
    return packed.tobytes(), scale


def _tl_dequantize(
    payload: np.ndarray | bytes,
    nelems: int,
    scales: np.ndarray,
    block: int,
) -> np.ndarray:
    raw = np.frombuffer(payload, dtype=np.uint8) if isinstance(payload, bytes) \
        else np.ascontiguousarray(payload, dtype=np.uint8)
    nblocks = -(-nelems // block)
    need = nblocks * block // 4
    if raw.size < need:
        raise QuantizationError(f"TL: payload {raw.size} B < required {need} B")
    s = np.asarray(scales, dtype=np.float32).reshape(-1)
    if s.size < nblocks:
        raise QuantizationError(f"TL: {s.size} scales for {nblocks} blocks")
    codes = unpack_codes_lsb_first(raw[:need]).astype(np.int32)
    vals = (codes - _NUM_LEVELS // 2).reshape(nblocks, block) * s[:nblocks, None]
    return vals.reshape(-1)[:nelems].astype(np.float32)


def quantize_tl1(x: np.ndarray) -> tuple[bytes, np.ndarray]:
    """TL1 (block=64). Returns (packed bytes, per-block f32 scales)."""
    return _tl_quantize(x, TL1_BLOCK)


def dequantize_tl1(payload: np.ndarray | bytes, nelems: int,
                   scales: np.ndarray) -> np.ndarray:
    return _tl_dequantize(payload, nelems, scales, TL1_BLOCK)


def quantize_tl2(x: np.ndarray) -> tuple[bytes, np.ndarray]:
    """TL2 (block=128). Returns (packed bytes, per-block f32 scales)."""
    return _tl_quantize(x, TL2_BLOCK)


def dequantize_tl2(payload: np.ndarray | bytes, nelems: int,
                   scales: np.ndarray) -> np.ndarray:
    return _tl_dequantize(payload, nelems, scales, TL2_BLOCK)


# --------------------------------------------------------------------------
# Runtime weight quantization → TL kernel path
# (reference: TL1Quantizer::quantize, bitnet-quantization/src/tl1.rs:163 —
#  TL is a RUNTIME format there too, produced from loaded tensors, not a
#  GGUF storage type)
# --------------------------------------------------------------------------
def _dense_host_kn(lin) -> np.ndarray:
    """Materialize a 2-D TernaryLinear's [K, N] float weights on the HOST
    (numpy — keeps the conversion off the accelerator)."""
    from ..ops.linear import unpack_words_host

    if lin.kind == "dense":
        return np.asarray(lin.weight, np.float32)
    codes = unpack_words_host(np.asarray(lin.packed), lin.k)[:, : lin.n]
    c = codes.astype(np.int32)
    if lin.kind == "tl":
        vals = (c - 2).astype(np.float32)
        s = np.repeat(np.asarray(lin.scales, np.float32), 32, axis=0)
        return vals * s[: lin.k, : lin.n]
    vals = (c + (c >= 2) - 2).astype(np.float32)       # LUT {-2,-1,1,2}
    if lin.kind == "bitnet32":
        s = np.repeat(np.asarray(lin.scales, np.float32), 32, axis=0)
        return vals * s[: lin.k, : lin.n]
    s = np.asarray(lin.scales, np.float32) if lin.scales is not None else 1.0
    if np.ndim(s) >= 2:                                # per-column vector
        s = s.reshape(1, -1)[:, : lin.n]
    return vals * s


def quantize_linear_tl(lin, block: int):
    """Re-quantize a TernaryLinear (2-D or [L]-stacked) into the TL kernel
    layout: per-K-block absmax scales, codes = clamp(round(w/s)+2, 0, 3).

    Matches the flat TL codec exactly when K % block == 0 (a [out, in]
    row-major flat block IS a per-column K-block after the [K, N]
    transpose)."""
    from ..ops.linear import TernaryLinear, tl_linear_from_codes

    stacked = (lin.packed if lin.packed is not None
               else lin.weight).ndim == 3
    if not stacked:
        w = _dense_host_kn(lin)
        K, N = w.shape
        # layers narrower than the TL block (or not divisible) shrink the
        # block (finer scales — strictly more accurate); real BitNet dims
        # (2560/6912) divide both TL blocks exactly
        while block > 32 and K % block:
            block //= 2
        if K % block:
            raise QuantizationError(
                f"TL block must divide K={K} (got down to {block})")
        b = w.reshape(K // block, block, N)
        absmax = np.abs(b).max(axis=1)                 # [K/block, N]
        scale = np.where(absmax == 0.0, 1.0, absmax).astype(np.float32)
        codes = np.clip(
            np.round(w / np.repeat(scale, block, axis=0)) + _NUM_LEVELS // 2,
            0, _NUM_LEVELS - 1).astype(np.uint8)
        return tl_linear_from_codes(codes, scale, block)
    import dataclasses

    import jax.numpy as jnp

    layers = []
    for li in range(lin.packed.shape[0] if lin.packed is not None
                    else lin.weight.shape[0]):
        l2 = dataclasses.replace(
            lin,
            weight=None if lin.weight is None else lin.weight[li],
            packed=None if lin.packed is None else lin.packed[li],
            scales=None if lin.scales is None else (
                lin.scales[li] if np.ndim(lin.scales) >= 1 else lin.scales),
        )
        layers.append(quantize_linear_tl(l2, block))
    return TernaryLinear(
        kind="tl", k=layers[0].k, n=layers[0].n,
        packed=jnp.stack([l.packed for l in layers]),
        scales=jnp.stack([l.scales for l in layers]),
    )


def quantize_params_tl(params, variant: str = "tl1"):
    """Runtime-quantize every linear of a BitNetParams to TL1/TL2.

    The TPU parity of the reference's runtime TL quantizers + kernels
    (tl1.rs / tl2.rs + the AVX TL paths, cpu/x86.rs:541,655): models of
    any loadable format ride the per-K-block-scale kernel with the TL
    reverse table.  Embeddings/norms stay untouched (as in the
    reference)."""
    import dataclasses

    block = {"tl1": TL1_BLOCK, "tl2": TL2_BLOCK}.get(variant)
    if block is None:
        raise QuantizationError(f"unknown TL variant {variant!r}")
    b = params.blocks
    q = {}
    for role in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "wqkv", "w_gateup"):
        lin = getattr(b, role)
        q[role] = None if lin is None else quantize_linear_tl(lin, block)
    blocks = dataclasses.replace(b, **q)
    lm_head = (None if params.lm_head is None
               else quantize_linear_tl(params.lm_head, block))
    return dataclasses.replace(params, blocks=blocks, lm_head=lm_head)
