"""ctypes bindings for the native host codec (native/bitnet_host.cpp).

The loader and converter call these when the shared library is available
(built on demand with g++, cached in ``native/build/``); every entry point
has a numpy fallback, so the package works without a toolchain.  Strict
mode can require the native path via ``require_native()``.

Native components mirror the reference's non-Rust layer (SURVEY.md §2
"each native component needs a TPU-native equivalent"): bitnet-sys C shim,
vendored ggml-quants.c, and the scalar codec cores.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libbitnet_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "build/libbitnet_host.so"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / build failure → fallback
        warnings.warn(f"native codec build failed ({e}); using numpy "
                      "fallback", RuntimeWarning, stacklevel=2)
        return False


def get_lib():
    """The loaded library, building it on first use; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "bitnet_host.cpp")
            if not os.path.exists(src) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            warnings.warn(f"native codec load failed ({e})",
                          RuntimeWarning, stacklevel=2)
            return None
        if lib.bn_abi_version() != 2:
            warnings.warn("native codec ABI mismatch; rebuilding",
                          RuntimeWarning, stacklevel=2)
            os.unlink(_LIB_PATH)
            if not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
        _configure(lib)
        _lib = lib
        return _lib


def _configure(lib) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.bn_qk256_extract_codes.argtypes = [u8p, i64, i64, u8p]
    lib.bn_qk256_dequant_f32.argtypes = [u8p, i64, i64, ctypes.c_float, f32p]
    lib.bn_qk256_quantize.argtypes = [f32p, i64, i64, u8p]
    lib.bn_repack_codes_tpu.argtypes = [u8p, i64, i64, u8p]
    lib.bn_qk256_payload_to_tpu.argtypes = [u8p, i64, i64, u8p, i64]
    lib.bn_bitnet32_extract.argtypes = [u8p, i64, u8p, f32p]
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.bn_repack_codes_tpu_words.argtypes = [u8p, i64, i64, u32p]
    lib.bn_repack_codes_tpu_words_t.argtypes = [u8p, i64, i64, u32p]
    lib.bn_qk256_payload_to_tpu_words.argtypes = [u8p, i64, i64, u32p, i64]


def available() -> bool:
    return get_lib() is not None


def require_native() -> None:
    """Strict-mode gate: fail loudly when the native codec is absent."""
    from ..errors import ConfigError

    if get_lib() is None:
        raise ConfigError(
            "strict mode requires the native host codec "
            "(native/libbitnet_host.so); run `make -C native`")


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------------------------------------------------------------------
# public ops (native with numpy fallback)
# ---------------------------------------------------------------------------
def qk256_extract_codes(payload: np.ndarray, rows: int,
                        cols: int) -> np.ndarray:
    """QK256 payload → [rows, cols] uint8 codes."""
    lib = get_lib()
    payload = np.ascontiguousarray(payload, np.uint8)
    if lib is not None:
        out = np.empty((rows, cols), np.uint8)
        lib.bn_qk256_extract_codes(_u8(payload), rows, cols, _u8(out))
        return out
    from ..quant.qk256 import row_stride_bytes
    from ..quant.ternary import unpack_codes_lsb_first

    stride = row_stride_bytes(cols)
    codes = unpack_codes_lsb_first(payload[: rows * stride])
    return codes.reshape(rows, stride * 4)[:, :cols]


def qk256_dequant_f32(payload: np.ndarray, rows: int, cols: int,
                      scale: float = 1.0) -> np.ndarray:
    lib = get_lib()
    payload = np.ascontiguousarray(payload, np.uint8)
    if lib is not None:
        out = np.empty((rows, cols), np.float32)
        lib.bn_qk256_dequant_f32(_u8(payload), rows, cols,
                                 ctypes.c_float(scale), _f32(out))
        return out
    from ..quant.qk256 import dequantize_qk256

    return dequantize_qk256(payload, rows, cols) * np.float32(scale)


def qk256_quantize(w: np.ndarray) -> np.ndarray:
    """[rows, cols] f32 → QK256 payload bytes [rows, stride]."""
    lib = get_lib()
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    stride = (-(-cols // 256)) * 64
    if lib is not None:
        out = np.empty((rows, stride), np.uint8)
        lib.bn_qk256_quantize(_f32(w), rows, cols, _u8(out))
        return out
    from ..quant.qk256 import quantize_qk256

    return np.frombuffer(quantize_qk256(w), np.uint8).reshape(rows, stride)


def repack_codes_tpu(codes_kn: np.ndarray) -> np.ndarray:
    """[K, N] codes → [Kp/4, N] TPU tile-interleaved bytes."""
    lib = get_lib()
    codes_kn = np.ascontiguousarray(codes_kn, np.uint8)
    K, N = codes_kn.shape
    Kp = (-(-K // 256)) * 256
    if lib is not None:
        out = np.empty((Kp // 4, N), np.uint8)
        lib.bn_repack_codes_tpu(_u8(codes_kn), K, N, _u8(out))
        return out
    from ..ops.linear import repack_codes_for_tpu

    return repack_codes_for_tpu(codes_kn)


def qk256_payload_to_tpu(payload: np.ndarray, n_rows: int, k_cols: int,
                         out_cols: int | None = None) -> np.ndarray:
    """Fused payload([N,K] layout) → transpose → TPU interleave."""
    lib = get_lib()
    if out_cols is None:
        out_cols = (-(-n_rows // 128)) * 128
    Kp = (-(-k_cols // 256)) * 256
    payload = np.ascontiguousarray(payload, np.uint8)
    if lib is not None:
        out = np.empty((Kp // 4, out_cols), np.uint8)
        lib.bn_qk256_payload_to_tpu(_u8(payload), n_rows, k_cols, _u8(out),
                                    out_cols)
        return out
    # numpy fallback: extract → transpose → repack → pad cols
    codes = qk256_extract_codes(payload, n_rows, k_cols).T  # [K, N]
    packed = repack_codes_tpu(codes)
    if packed.shape[1] < out_cols:
        packed = np.concatenate(
            [packed, np.zeros((packed.shape[0], out_cols - packed.shape[1]),
                              np.uint8)], axis=1)
    return packed


def _u32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def repack_codes_tpu_words(codes_kn: np.ndarray) -> np.ndarray:
    """[K, N] codes → device int32 words [Kp/16, N] (repack + fold fused;
    the 2B-load hotspot — the numpy route is ~100 s of strided passes).

    Accepts a transposed VIEW (``codes_nk.T``) without copying: the
    native pass has a transposed-input kernel, so loaders can hand over
    GGUF's output-major codes directly (saves a ~10 s strided
    ``.T.copy()`` per 2B model on a 1-core host)."""
    lib = get_lib()
    codes_kn = np.asarray(codes_kn, np.uint8)
    K, N = codes_kn.shape
    Kp = (-(-K // 256)) * 256
    if lib is not None:
        out = np.empty((Kp // 16, N), np.uint32)
        if (not codes_kn.flags.c_contiguous
                and codes_kn.T.flags.c_contiguous):
            # [N, K] base buffer viewed as [K, N]: transpose in-kernel
            lib.bn_repack_codes_tpu_words_t(
                _u8(codes_kn.T), K, N, _u32(out))
        else:
            codes_kn = np.ascontiguousarray(codes_kn)
            lib.bn_repack_codes_tpu_words(_u8(codes_kn), K, N, _u32(out))
        return out.view(np.int32)
    from ..ops.linear import fold_packed_words

    return fold_packed_words(repack_codes_tpu(np.ascontiguousarray(codes_kn)))


def qk256_payload_to_tpu_words(payload: np.ndarray, n_rows: int,
                               k_cols: int,
                               out_cols: int | None = None) -> np.ndarray:
    """Fused QK256 payload ([N, K] output-major as stored in GGUF) →
    transpose → TPU interleave → int32 words [Kp/16, out_cols]."""
    lib = get_lib()
    if out_cols is None:
        out_cols = (-(-n_rows // 128)) * 128
    Kp = (-(-k_cols // 256)) * 256
    payload = np.ascontiguousarray(payload, np.uint8)
    if lib is not None:
        out = np.empty((Kp // 16, out_cols), np.uint32)
        lib.bn_qk256_payload_to_tpu_words(_u8(payload), n_rows, k_cols,
                                          _u32(out), out_cols)
        return out.view(np.int32)
    from ..ops.linear import fold_packed_words

    packed = qk256_payload_to_tpu(payload, n_rows, k_cols, out_cols)
    return fold_packed_words(packed)


def bitnet32_extract(payload: np.ndarray,
                     nblocks: int) -> tuple[np.ndarray, np.ndarray]:
    """I2_S 32/10B payload → (codes [nblocks*32], scales [nblocks] f32)."""
    lib = get_lib()
    payload = np.ascontiguousarray(payload, np.uint8)
    if lib is not None:
        codes = np.empty(nblocks * 32, np.uint8)
        scales = np.empty(nblocks, np.float32)
        lib.bn_bitnet32_extract(_u8(payload), nblocks, _u8(codes),
                                _f32(scales))
        return codes, scales
    from ..quant.ternary import unpack_codes_lsb_first

    blocks = payload[: nblocks * 10].reshape(nblocks, 10)
    codes = unpack_codes_lsb_first(blocks[:, :8].reshape(-1))
    scales = np.ascontiguousarray(blocks[:, 8:10]).view(np.float16)
    return codes, scales.reshape(nblocks).astype(np.float32)
