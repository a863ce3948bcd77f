"""Classic GGML block-quant codecs: Q8_0, Q4_0, Q4_1, Q5_0, Q5_1.

The reference *parses* these types but keeps the payloads as raw bytes —
"would need specific dequantizers for Q4_0, Q8_0, etc."
(``bitnet-models/src/formats/gguf/loader.rs:1622``).  We implement them,
so generic llama-family GGUFs (the most common llama.cpp exports) load
and run — capability beyond the reference.

Layouts (ggml-quants reference semantics, 32-element blocks):
- Q8_0: 34 B = f16 d + 32×i8 q;             v = q · d
- Q4_0: 18 B = f16 d + 16 B nibbles;        v = (q − 8) · d
- Q4_1: 20 B = f16 d + f16 m + 16 B;        v = q · d + m
- Q5_0: 22 B = f16 d + 4 B qh + 16 B;       v = (q5 − 16) · d
- Q5_1: 24 B = f16 d + f16 m + 4 B qh + 16 B; v = q5 · d + m
Nibble order: low nibbles of the 16 bytes are elements 0..15, high
nibbles are 16..31; qh holds each element's 5th bit (LSB-first).
"""

from __future__ import annotations

import numpy as np

from ..errors import QuantizationError

BLOCK = 32
BYTES = {"q8_0": 34, "q4_0": 18, "q4_1": 20, "q5_0": 22, "q5_1": 24}


def _blocks(payload, nelems: int, bpb: int, kind: str) -> np.ndarray:
    raw = np.frombuffer(payload, dtype=np.uint8) if isinstance(
        payload, (bytes, bytearray)) else np.ascontiguousarray(
        payload, np.uint8)
    if nelems % BLOCK != 0:
        raise QuantizationError(f"{kind}: nelems {nelems} % 32 != 0")
    nb = nelems // BLOCK
    if raw.size < nb * bpb:
        raise QuantizationError(
            f"{kind}: payload {raw.size} B < required {nb * bpb} B")
    return raw[: nb * bpb].reshape(nb, bpb)


def _f16(b: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(b).view(np.float16)[:, 0].astype(np.float32)


def _nibbles(qs: np.ndarray) -> np.ndarray:
    """[nb, 16] bytes → [nb, 32] values: low nibbles then high nibbles."""
    lo = qs & 0x0F
    hi = qs >> 4
    return np.concatenate([lo, hi], axis=1).astype(np.int32)


def _qh_bits(qh: np.ndarray) -> np.ndarray:
    """[nb, 4] bytes → [nb, 32] per-element 5th bits (LSB-first u32)."""
    u = np.ascontiguousarray(qh).view(np.uint32)[:, 0]
    return ((u[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
            ).astype(np.int32)


# -- dequantizers -------------------------------------------------------------
def dequantize_q8_0(payload, nelems: int) -> np.ndarray:
    b = _blocks(payload, nelems, 34, "Q8_0")
    d = _f16(b[:, 0:2])
    q = b[:, 2:34].view(np.int8).astype(np.float32)
    return (q * d[:, None]).reshape(-1)


def dequantize_q4_0(payload, nelems: int) -> np.ndarray:
    b = _blocks(payload, nelems, 18, "Q4_0")
    d = _f16(b[:, 0:2])
    q = _nibbles(b[:, 2:18])
    return ((q - 8).astype(np.float32) * d[:, None]).reshape(-1)


def dequantize_q4_1(payload, nelems: int) -> np.ndarray:
    b = _blocks(payload, nelems, 20, "Q4_1")
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    q = _nibbles(b[:, 4:20]).astype(np.float32)
    return (q * d[:, None] + m[:, None]).reshape(-1)


def dequantize_q5_0(payload, nelems: int) -> np.ndarray:
    b = _blocks(payload, nelems, 22, "Q5_0")
    d = _f16(b[:, 0:2])
    qh = _qh_bits(b[:, 2:6])
    q = _nibbles(b[:, 6:22]) | (qh << 4)
    return ((q - 16).astype(np.float32) * d[:, None]).reshape(-1)


def dequantize_q5_1(payload, nelems: int) -> np.ndarray:
    b = _blocks(payload, nelems, 24, "Q5_1")
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qh = _qh_bits(b[:, 4:8])
    q = (_nibbles(b[:, 8:24]) | (qh << 4)).astype(np.float32)
    return (q * d[:, None] + m[:, None]).reshape(-1)


# -- quantizers (converter + round-trip tests) --------------------------------
def quantize_q8_0(x: np.ndarray) -> bytes:
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    if x.size % BLOCK != 0:
        raise QuantizationError("Q8_0 needs nelems % 32 == 0")
    xb = x.reshape(-1, BLOCK)
    amax = np.abs(xb).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    scale = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = np.clip(np.round(xb * scale[:, None]), -127, 127).astype(np.int8)
    out = np.empty((xb.shape[0], 34), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:34] = q.view(np.uint8)
    return out.tobytes()


def quantize_q4_0(x: np.ndarray) -> bytes:
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    if x.size % BLOCK != 0:
        raise QuantizationError("Q4_0 needs nelems % 32 == 0")
    xb = x.reshape(-1, BLOCK)
    # ggml: d = max-by-|.| / -8 (sign kept), q = round(x/d) + 8
    idx = np.abs(xb).argmax(axis=1)
    maxv = xb[np.arange(xb.shape[0]), idx]
    d = (maxv / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    q = np.clip(np.round(xb * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    out = np.empty((xb.shape[0], 18), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:18] = q[:, :16] | (q[:, 16:] << 4)
    return out.tobytes()
