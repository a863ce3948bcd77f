"""GGML 256-element-block codecs: I2_S QK256 (no scale) and IQ2_S (82 B).

Layouts:
- **QK256 no-scale** (MS BitNet GGUF): 64 B packed 2-bit codes per 256-elem
  block, value = ``LUT_SYM[code]`` directly
  (``crates/bitnet-quantization/src/i2s_qk256.rs:39-144``).
- **IQ2_S** (ggml type 24): 82 B/block = 2 B f16 ``d`` + 64 B ``qs`` +
  8 B ``qh`` + 8 B ``scales`` (qh/scales unused by the simplified reference
  codec); value = ``d * LUT_SYM[code]``
  (vendored ``ggml-quants.c`` ``dequantize_row_iq2_s``).

Rows: for a [rows, cols] weight, each row is padded independently to whole
blocks — ``row_stride_bytes = ceil(cols/256) * 64`` (``i2s_qk256.rs:53-67``).
"""

from __future__ import annotations

import numpy as np

from ..errors import QuantizationError
from .ternary import (
    LUT_SYM,
    pack_codes_lsb_first,
    ternary_quantize_codes,
    unpack_codes_lsb_first,
)

QK256_BLOCK = 256
QK256_PACKED_BYTES = 64
IQ2S_BLOCK_BYTES = 82
# byte tolerance for size checks (alignment padding) — reference uses 128
# (``i2s_qk256.rs`` TOLERANCE)
QK256_SIZE_TOLERANCE = 128


def row_stride_bytes(cols: int) -> int:
    return -(-cols // QK256_BLOCK) * QK256_PACKED_BYTES


# --------------------------------------------------------------------------
# QK256 no-scale
# --------------------------------------------------------------------------
def quantize_qk256(w: np.ndarray) -> bytes:
    """Quantize [rows, cols] floats to QK256 packed bytes (row-padded).

    Values should already be in LUT range ({-2,-1,1,2}-ish); the codec snaps
    each element to the nearest LUT level (threshold rule of GGML with d=1).
    """
    w = np.ascontiguousarray(w, dtype=np.float32)
    if w.ndim == 1:
        w = w[None, :]
    rows, cols = w.shape
    bpr = -(-cols // QK256_BLOCK)
    padded = np.zeros((rows, bpr * QK256_BLOCK), dtype=np.float32)
    padded[:, :cols] = w
    codes = ternary_quantize_codes(padded, np.float32(1.0))
    return pack_codes_lsb_first(codes.reshape(-1)).tobytes()


def dequantize_qk256(
    payload: np.ndarray | bytes, rows: int, cols: int
) -> np.ndarray:
    """Dequantize QK256 payload to [rows, cols] float32."""
    raw = np.frombuffer(payload, dtype=np.uint8) if isinstance(payload, bytes) \
        else np.ascontiguousarray(payload, dtype=np.uint8)
    stride = row_stride_bytes(cols)
    need = rows * stride
    if abs(raw.size - need) > QK256_SIZE_TOLERANCE and raw.size < need:
        raise QuantizationError(
            f"QK256: payload {raw.size} B, expected {need} B for "
            f"{rows}x{cols}. Check tensor orientation: QK256 requires "
            f"[out_dim, in_dim] layout."
        )
    codes = unpack_codes_lsb_first(raw[:need])
    vals = LUT_SYM[codes].reshape(rows, stride * 4)
    return vals[:, :cols].astype(np.float32)


def gemv_qk256(payload: np.ndarray | bytes, x: np.ndarray,
               rows: int, cols: int) -> np.ndarray:
    """Reference GEMV: ``y[r] = sum_k LUT[code[r,k]] * x[k]``.

    Numpy port of ``gemv_qk256_row`` (``i2s_qk256.rs:196``) — used as the
    golden model for kernel tests, not on the hot path.
    """
    w = dequantize_qk256(payload, rows, cols)
    return w @ np.asarray(x, dtype=np.float32)


# --------------------------------------------------------------------------
# IQ2_S (82 B blocks with f16 scale)
# --------------------------------------------------------------------------
def quantize_iq2s(x: np.ndarray) -> bytes:
    """Quantize flat/2-D floats to IQ2_S blocks (82 B each).

    Per vendored ``quantize_iq2_s``: d = absmax/2 per 256-block; qh and
    scales fields zeroed.
    """
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if x.size % QK256_BLOCK != 0:
        raise QuantizationError(
            f"IQ2_S requires nelems % 256 == 0, got {x.size}"
        )
    nblocks = x.size // QK256_BLOCK
    blocked = x.reshape(nblocks, QK256_BLOCK)
    absmax = np.abs(blocked).max(axis=1)
    absmax = np.where(absmax == 0.0, 1e-8, absmax)
    d = (absmax / 2.0).astype(np.float32)
    codes = ternary_quantize_codes(blocked, d[:, None])
    qs = pack_codes_lsb_first(codes.reshape(-1)).reshape(nblocks, QK256_PACKED_BYTES)
    out = np.zeros((nblocks, IQ2S_BLOCK_BYTES), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(nblocks, 2)
    out[:, 2 : 2 + QK256_PACKED_BYTES] = qs
    return out.tobytes()


def dequantize_iq2s(payload: np.ndarray | bytes, nelems: int) -> np.ndarray:
    """Dequantize IQ2_S payload to flat float32 (d * LUT[code])."""
    raw = np.frombuffer(payload, dtype=np.uint8) if isinstance(payload, bytes) \
        else np.ascontiguousarray(payload, dtype=np.uint8)
    if nelems % QK256_BLOCK != 0:
        raise QuantizationError(
            f"IQ2_S requires nelems % 256 == 0, got {nelems}"
        )
    nblocks = nelems // QK256_BLOCK
    need = nblocks * IQ2S_BLOCK_BYTES
    if raw.size < need:
        raise QuantizationError(
            f"IQ2_S: payload {raw.size} B < required {need} B"
        )
    blocks = raw[:need].reshape(nblocks, IQ2S_BLOCK_BYTES)
    d = np.ascontiguousarray(blocks[:, 0:2]).view(np.float16)
    d = d.reshape(nblocks).astype(np.float32)
    qs = blocks[:, 2 : 2 + QK256_PACKED_BYTES]
    codes = unpack_codes_lsb_first(qs.reshape(-1))
    vals = LUT_SYM[codes].reshape(nblocks, QK256_BLOCK) * d[:, None]
    return vals.reshape(-1).astype(np.float32)
