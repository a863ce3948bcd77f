"""Inference engine: decode loop, KV cache, sampling, stop criteria."""

from .cache import KVCache, allocate_cache, reset_cache, reset_slot
from .engine import (
    GenerationResult,
    InferenceEngine,
    PerformanceMetrics,
    TokenEvent,
    prefill_buckets,
)
from .sampling import (
    MirostatState,
    SamplerChain,
    apply_min_p,
    apply_repetition_penalty,
    apply_temperature,
    apply_top_k,
    apply_top_p,
    apply_typical_p,
    argmax,
    softmax,
)
from .stop import StopCriteria, StopReason

__all__ = [
    "KVCache",
    "allocate_cache",
    "reset_cache",
    "reset_slot",
    "GenerationResult",
    "InferenceEngine",
    "PerformanceMetrics",
    "TokenEvent",
    "prefill_buckets",
    "MirostatState",
    "SamplerChain",
    "apply_min_p",
    "apply_repetition_penalty",
    "apply_temperature",
    "apply_top_k",
    "apply_top_p",
    "apply_typical_p",
    "argmax",
    "softmax",
    "StopCriteria",
    "StopReason",
]
