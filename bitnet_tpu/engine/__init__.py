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

# feature modules (import on use; re-exported for a stable public surface)
from . import checkpoint
from .context import ContextWindowConfig, EvictionPolicy, evict
from .paged_cache import PagedKVCache, PagePool, allocate_paged_cache
from .prefix_cache import PrefixCache, PrefixSnapshot
from .session import Session, SessionConfig, SessionState
from .speculative import (
    EngineDraft,
    NgramDraft,
    SpeculativeConfig,
    SpeculativeDecoder,
)
from .windowed_cache import WindowedKVCache, allocate_windowed_cache

__all__ = [
    "checkpoint",
    "ContextWindowConfig",
    "EvictionPolicy",
    "evict",
    "PagedKVCache",
    "PagePool",
    "allocate_paged_cache",
    "PrefixCache",
    "PrefixSnapshot",
    "Session",
    "SessionConfig",
    "SessionState",
    "EngineDraft",
    "NgramDraft",
    "SpeculativeConfig",
    "SpeculativeDecoder",
    "WindowedKVCache",
    "allocate_windowed_cache",
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
