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
