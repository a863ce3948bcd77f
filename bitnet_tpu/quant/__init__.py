"""Quantization codecs for BitNet ternary formats.

Host-side (numpy) pack/unpack for every format the reference supports
(``crates/bitnet-quantization/``):

- I2_S **BitNet32F16** — 32-elem blocks, 10 B/block (8 B packed 2-bit codes +
  2 B inline f16 scale)                       → :mod:`.i2s`
- I2_S **Split32WithSibling** — 32-elem blocks, 8 B/block, scales in a
  sibling tensor                              → :mod:`.i2s`
- I2_S **GgmlQk256NoScale** — 256-elem blocks, 64 B/block, no scales
  (MS BitNet GGUF)                            → :mod:`.qk256`
- **IQ2_S** — full GGML 82 B/256-elem blocks with f16 ``d`` scale
  (ggml type 24)                              → :mod:`.qk256`
- **TL1 / TL2** — table-lookup formats (ARM/x86 in the reference; on TPU both
  decode through the same LUT path)           → :mod:`.tl`

Device-side layouts for the Pallas kernels are produced by :mod:`.packing`.
Activation (int8) quantization lives in :mod:`.int8`.
"""

from .ternary import (
    LUT_SYM,
    code_to_value,
    ternary_quantize_codes,
    unpack_codes_lsb_first,
    pack_codes_lsb_first,
)
from .flavor import I2SFlavor, detect_i2s_flavor
from .i2s import (
    quantize_bitnet32,
    dequantize_bitnet32,
    quantize_split32,
    dequantize_split32,
)
from .qk256 import (
    QK256_BLOCK,
    QK256_PACKED_BYTES,
    quantize_qk256,
    dequantize_qk256,
    gemv_qk256,
    quantize_iq2s,
    dequantize_iq2s,
)
from .tl import quantize_tl1, dequantize_tl1, quantize_tl2, dequantize_tl2
from .int8 import quantize_activations_int8, dequantize_activations_int8

__all__ = [
    "LUT_SYM",
    "code_to_value",
    "ternary_quantize_codes",
    "unpack_codes_lsb_first",
    "pack_codes_lsb_first",
    "I2SFlavor",
    "detect_i2s_flavor",
    "quantize_bitnet32",
    "dequantize_bitnet32",
    "quantize_split32",
    "dequantize_split32",
    "QK256_BLOCK",
    "QK256_PACKED_BYTES",
    "quantize_qk256",
    "dequantize_qk256",
    "gemv_qk256",
    "quantize_iq2s",
    "dequantize_iq2s",
    "quantize_tl1",
    "dequantize_tl1",
    "quantize_tl2",
    "dequantize_tl2",
    "quantize_activations_int8",
    "dequantize_activations_int8",
]
