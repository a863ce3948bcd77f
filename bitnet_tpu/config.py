"""Typed configuration for bitnet_tpu.

One dataclass-based config layer with environment-variable overrides replaces
the reference's three-tier system (cargo features / env vars / clap+TOML —
see SURVEY.md §5 "Config / flag system").  There is a single platform (TPU),
so no compile-time feature matrix is needed.

Reference parity:
- ``BitNetConfig``      ≙ ``crates/bitnet-common/src/config.rs``
- ``GenerationConfig``  ≙ ``crates/bitnet-common/src/types.rs:127`` and
  ``crates/bitnet-generation/src/lib.rs:173``
- ``StrictMode``        ≙ ``crates/bitnet-common/src/strict_mode.rs:15-166``
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

from .errors import ConfigError

# --------------------------------------------------------------------------
# Environment variables (catalog mirrors docs/environment-variables.md in the
# reference, renamed BITNET_* -> BITNET_TPU_* kept identical where sensible).
# --------------------------------------------------------------------------
ENV_STRICT_MODE = "BITNET_STRICT_MODE"
ENV_ALLOW_MOCK = "BITNET_ALLOW_MOCK"
ENV_DETERMINISTIC = "BITNET_DETERMINISTIC"
ENV_TRACE = "BITNET_TRACE"
ENV_DEBUG_LOGITS = "BITNET_DEBUG_LOGITS"
ENV_KERNEL_PATH = "BITNET_KERNEL_PATH"  # force 'pallas' | 'xla' | 'interpret'


def _env_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


@dataclass(frozen=True)
class StrictMode:
    """Honest-compute guard flags.

    Strict mode bans any mock/fallback path that could silently produce fake
    results — the reference uses it to guarantee "real compute" receipts
    (``bitnet-common/src/strict_mode.rs:28-72``).
    """

    enabled: bool = False
    allow_mock: bool = True       # mock tokenizer / synthetic weights allowed?
    allow_fallback: bool = True   # XLA dequant fallback (vs fused Pallas) allowed?
    deterministic: bool = False   # fixed PRNG key, no autotuning

    @classmethod
    def from_env(cls) -> "StrictMode":
        strict = _env_flag(ENV_STRICT_MODE)
        return cls(
            enabled=strict,
            allow_mock=_env_flag(ENV_ALLOW_MOCK, default=not strict),
            allow_fallback=not strict or _env_flag("BITNET_STRICT_ALLOW_FALLBACK"),
            deterministic=_env_flag(ENV_DETERMINISTIC),
        )


# --------------------------------------------------------------------------
# Model architecture config
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class ModelConfig:
    """Transformer hyperparameters.

    Populated from GGUF metadata keys (``<arch>.embedding_length`` etc.) by
    :mod:`bitnet_tpu.models.loader`; mirrors the reference's ``BitNetConfig``
    (``crates/bitnet-common/src/config.rs``) and the GGUF key handling in
    ``crates/bitnet-models/src/formats/gguf/loader.rs``.
    """

    vocab_size: int = 32000
    hidden_size: int = 2560
    intermediate_size: int = 6912
    num_layers: int = 30
    num_heads: int = 20
    num_kv_heads: int = 5
    head_dim: int = 128
    max_seq_len: int = 4096
    rope_base: float = 500000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    architecture: str = "bitnet-b1.58"
    # activation function of the FFN gate path; BitNet b1.58 uses squared relu
    # in some variants and silu in others — GGUF metadata decides.
    hidden_act: str = "silu"
    # BitNet b1.58 layernorm variant: attention sub-norm used by 2B-4T model.
    use_sub_norm: bool = False

    def __post_init__(self) -> None:
        if self.num_heads % max(self.num_kv_heads, 1) != 0:
            raise ConfigError(
                f"num_heads ({self.num_heads}) must be divisible by "
                f"num_kv_heads ({self.num_kv_heads})"
            )
        if self.head_dim <= 0 or self.hidden_size <= 0:
            raise ConfigError("head_dim and hidden_size must be positive")

    @property
    def gqa_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    def validate(self) -> None:
        """Sanity gates mirroring InferenceEngine::new hyperparameter checks
        (``bitnet-inference/src/engine.rs:786-792``)."""
        if self.vocab_size <= 0:
            raise ConfigError("vocab_size must be positive")
        if self.num_layers <= 0:
            raise ConfigError("num_layers must be positive")
        if self.max_seq_len <= 0:
            raise ConfigError("max_seq_len must be positive")

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------
# Generation config
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class GenerationConfig:
    """Sampling / decoding parameters.

    Field set mirrors the reference CLI flags
    (``crates/bitnet-cli/src/main.rs:178-260``) and ``GenerationConfig``
    (``crates/bitnet-common/src/types.rs:127``).
    """

    max_new_tokens: int = 128
    # suppress EOS / stop triggers (and ban the EOS logit) until this
    # many tokens are emitted (vLLM min_tokens)
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_k: int = 0                 # 0 = disabled
    top_p: float = 1.0             # 1.0 = disabled
    min_p: float = 0.0             # 0.0 = disabled
    typical_p: float = 1.0         # 1.0 = disabled
    repetition_penalty: float = 1.0
    repetition_window: int = 64
    frequency_penalty: float = 0.0  # OpenAI-style: -= count * penalty
    presence_penalty: float = 0.0   # OpenAI-style: -= (count > 0) * penalty
    logit_bias: tuple[tuple[int, float], ...] = ()  # (token_id, bias) pairs
    mirostat: int = 0              # 0 = off, 1 = v1, 2 = v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    seed: int | None = None
    greedy: bool = False
    stop_sequences: tuple[str, ...] = ()
    stop_token_ids: tuple[int, ...] = ()
    add_bos: bool = True
    # GBNF grammar source constraining the output (grammar-constrained
    # decoding; compile JSON schemas via grammar.json_schema_grammar).
    # Host-routed per step like mirostat.  None/"" = unconstrained.
    grammar: str | None = None
    # None = off; N >= 0 = return the sampled token's log-probability
    # plus the top-N alternatives per step (OpenAI ``logprobs``).  The
    # reference stubs this field (``bitnet-server/src/sse.rs:102``
    # always None); here it is computed from the raw model distribution.
    # Host-routed per step like mirostat (forces K=1 segments).
    logprobs: int | None = None

    def __post_init__(self) -> None:
        if self.max_new_tokens <= 0:
            raise ConfigError("max_new_tokens must be positive")
        if not isinstance(self.min_new_tokens, int) \
                or isinstance(self.min_new_tokens, bool) \
                or not (0 <= self.min_new_tokens <= self.max_new_tokens):
            raise ConfigError(
                "min_new_tokens must be an int in [0, max_new_tokens]")
        if self.temperature < 0.0:
            raise ConfigError("temperature must be >= 0")
        if not (0.0 <= self.top_p <= 1.0):
            raise ConfigError("top_p must be in [0, 1]")
        if self.top_k < 0:
            raise ConfigError("top_k must be >= 0")
        if self.repetition_penalty <= 0.0:
            raise ConfigError("repetition_penalty must be > 0")
        if self.mirostat not in (0, 1, 2):
            raise ConfigError("mirostat must be 0, 1 or 2")
        for p, name in ((self.frequency_penalty, "frequency_penalty"),
                        (self.presence_penalty, "presence_penalty")):
            if not (-2.0 <= p <= 2.0):
                raise ConfigError(f"{name} must be in [-2, 2]")
        if not isinstance(self.logit_bias, tuple):
            # accept dict / list at the call site, store hashably
            object.__setattr__(
                self, "logit_bias",
                tuple(sorted(dict(self.logit_bias).items())))
        for tok, _b in self.logit_bias:
            if not isinstance(tok, int) or tok < 0:
                raise ConfigError("logit_bias keys must be token ids >= 0")
        if self.grammar is not None and not isinstance(self.grammar, str):
            raise ConfigError("grammar must be GBNF source text")
        if self.grammar == "":
            object.__setattr__(self, "grammar", None)
        if self.logprobs is not None and not (
                isinstance(self.logprobs, int) and 0 <= self.logprobs <= 32):
            raise ConfigError("logprobs must be None or an int in [0, 32]")
        if self.seed is not None:
            # a non-integer seed would crash jax.random.PRNGKey deep in
            # the decode loop (scheduler thread death = wedged server)
            try:
                import operator

                object.__setattr__(self, "seed", operator.index(self.seed))
            except TypeError:
                raise ConfigError("seed must be an integer") from None
        for s in self.stop_sequences:
            if not isinstance(s, str):
                raise ConfigError("stop_sequences must be strings")

    @property
    def is_greedy(self) -> bool:
        return self.greedy or self.temperature == 0.0

    def replace(self, **kw: Any) -> "GenerationConfig":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------
# Engine config
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class EngineConfig:
    """Runtime engine knobs (KV cache sizing, batching, kernel path)."""

    max_seq_len: int = 2048          # KV-cache capacity (static shape)
    max_batch_size: int = 1
    # 'auto' = int8 at long contexts (measured v5e crossover: the in-kernel
    # int8 stream wins 12% at S=4096 but loses 14% at S=1024 — the fixed
    # quantize/scale overhead only amortizes once the KV read dominates),
    # bf16 otherwise.
    kv_cache_dtype: str = "bf16"     # 'auto' | 'bf16' | 'int8' | 'fp8'
    # 'auto' picks fused Pallas kernels on TPU, XLA dequant elsewhere.
    kernel_path: str = "auto"        # 'auto' | 'w2a8' | 'pallas' | 'xla'
    # dtype used for dequantized weights on the XLA fallback path
    compute_dtype: str = "bf16"      # 'bf16' | 'f32'
    logits_dtype: str = "auto"       # 'auto' | 'bf16' | 'int8' tied head
    prefill_chunk: int = 512         # prefill bucketing granularity
    donate_cache: bool = True
    # host-side prompt-prefix KV cache budget in tokens (0 = disabled);
    # reference: bitnet-inference/src/prefix_cache.rs
    prefix_cache_tokens: int = 0
    # fuse q|k|v and gate|up into single kernel calls (fewer launches,
    # wider DMA blocks); single-chip engines only — sharded paths keep
    # the unfused layout for clean column-parallel PartitionSpecs
    fuse_projections: bool = False
    # runtime weight re-quantization: 'tl1'/'tl2' convert every linear to
    # the TL table-lookup kernel layout at engine init (reference runtime
    # TL quantizers, bitnet-quantization/src/tl1.rs:163)
    weight_quant: str = "none"       # 'none' | 'tl1' | 'tl2'
    # decode tokens per host round-trip in generate_stream (engine/loop.py
    # K-step lax.scan segments; tokens are bit-identical to K=1).
    # 0 = auto: 8 on TPU (host sync >> device step), 1 elsewhere.
    decode_steps_per_dispatch: int = 0
    # at pos >= max_seq_len: 'shift' trims to the last half of the context
    # and re-prefills (reference keep-half truncation, engine.rs:1222-1227);
    # 'stop' ends generation with StopReason.CONTEXT_FULL
    context_overflow: str = "shift"
    # sliding-window attention over a ring-buffer KV cache (reference
    # WindowedKVCache, bitnet-gpu-hal/src/sliding_window.rs:238-441):
    # > 0 allocates a [L, B, W, KV, D] ring instead of the [.., S, ..]
    # dense cache — HBM is O(window) while streams run to max_seq_len
    # (the rope/position bound).  Each query attends to the last
    # ``sliding_window`` positions only.  0 = full (dense) attention.
    sliding_window: int = 0
    strict: StrictMode = field(default_factory=StrictMode)

    def resolve_kv_cache_dtype(self) -> str:
        """'auto' → int8 when the KV read dominates the decode step.

        On-chip A/B: B=1 S=4096 int8 2.89 vs bf16 3.27 ms/token but
        B=1 S=1024 int8 1.61 vs bf16 1.19 (exp_round3b / exp_r4) —
        crossover gated at the measured winning point.  Batched pools
        (B>2) ride the flat-cache whole-batch v2 kernels where int8
        wins already at S=1024 (1.72 vs 2.00 ms/step at B=8, round 4)."""
        if self.kv_cache_dtype != "auto":
            return self.kv_cache_dtype
        if self.sliding_window > 0:
            # the windowed ring rides the generic (einsum) decode path,
            # where the quantize/dequantize glue never amortizes
            return "bf16"
        if self.max_batch_size > 2:
            return "int8"
        return "int8" if self.max_seq_len >= 4096 else "bf16"

    def __post_init__(self) -> None:
        if self.kv_cache_dtype not in ("auto", "bf16", "f32", "int8",
                                       "fp8"):
            raise ConfigError(f"bad kv_cache_dtype {self.kv_cache_dtype!r}")
        if self.context_overflow not in ("shift", "stop"):
            raise ConfigError(
                f"bad context_overflow {self.context_overflow!r}")
        if self.weight_quant not in ("none", "tl1", "tl2"):
            raise ConfigError(f"bad weight_quant {self.weight_quant!r}")
        if self.decode_steps_per_dispatch < 0:
            raise ConfigError("decode_steps_per_dispatch must be >= 0")
        if self.sliding_window < 0:
            raise ConfigError("sliding_window must be >= 0")
        if self.sliding_window > 0:
            if self.sliding_window < 16:
                raise ConfigError("sliding_window must be >= 16 tokens")
            if self.sliding_window > self.max_seq_len:
                raise ConfigError(
                    "sliding_window exceeds max_seq_len (a window wider "
                    "than the stream bound is just a dense cache)")
            if self.prefix_cache_tokens > 0:
                raise ConfigError(
                    "prefix_cache_tokens requires the dense cache "
                    "(prefix snapshots are position-indexed slices)")
            if self.kv_cache_dtype in ("int8", "fp8"):
                raise ConfigError(
                    "sliding_window supports bf16/f32 KV only (the ring "
                    "rides the generic attention path)")
        if self.logits_dtype not in ("auto", "bf16", "int8"):
            raise ConfigError(f"bad logits_dtype {self.logits_dtype!r}")
        if self.kernel_path not in ("auto", "w2a8", "pallas", "xla"):
            raise ConfigError(f"bad kernel_path {self.kernel_path!r}")
        if self.compute_dtype not in ("bf16", "f32"):
            raise ConfigError(f"bad compute_dtype {self.compute_dtype!r}")

    def replace(self, **kw: Any) -> "EngineConfig":
        return dataclasses.replace(self, **kw)
