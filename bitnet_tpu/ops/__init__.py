"""TPU compute ops: XLA reference implementations + Pallas kernels."""

from .attention import attention
from .linear import (
    TernaryLinear,
    bitnet32_linear_from_codes,
    dense_linear,
    dequantize_weight,
    linear_apply,
    fold_packed_words,
    qk256_linear_from_codes,
    repack_codes_for_tpu,
    unpack_codes_host,
    unpack_words_host,
)
from .rmsnorm import rms_norm
from .rope import apply_rope, build_rope_tables

__all__ = [
    "attention",
    "TernaryLinear",
    "bitnet32_linear_from_codes",
    "dense_linear",
    "dequantize_weight",
    "linear_apply",
    "fold_packed_words",
    "qk256_linear_from_codes",
    "repack_codes_for_tpu",
    "unpack_codes_host",
    "unpack_words_host",
    "rms_norm",
    "apply_rope",
    "build_rope_tables",
]
