"""bitnet_tpu — a TPU-native BitNet b1.58 inference framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
EffortlessMetrics/BitNet-rs reference engine: GGUF loading with I2_S
dual-flavor autodetection, fused ternary Pallas matmul kernels on the MXU,
an autoregressive decode engine with quantized KV cache, sampling/stop/
template pipelines, mesh-sharded multi-chip execution, serving, and
honest-compute receipts.

Package map (SURVEY.md §7 design stance):
- ``gguf``      — format parse/write + fixtures
- ``quant``     — ternary codecs (I2_S BitNet32/QK256, IQ2_S, TL1/TL2)
- ``ops``       — Pallas TPU kernels + XLA reference ops
- ``models``    — model config + functional transformer + loader
- ``engine``    — decode loop, KV cache, sampling, streaming, batching
- ``parallel``  — mesh/shardings/collectives (TP/DP/SP)
- ``tokenizer`` — GGUF-embedded vocab, HF tokenizers, mock
- ``templates`` — prompt templates (detect/apply/chat)
- ``verify``    — receipts, activation tracing, logits parity
- ``obs``       — metrics and profiling
"""

from .version import __version__
from .config import (
    EngineConfig,
    GenerationConfig,
    ModelConfig,
    StrictMode,
)
from . import errors

__all__ = [
    "__version__",
    "EngineConfig",
    "GenerationConfig",
    "ModelConfig",
    "StrictMode",
    "errors",
]
