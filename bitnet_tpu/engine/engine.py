"""InferenceEngine: jitted prefill/decode with streaming generation.

Capability parity with ``InferenceEngine``
(``bitnet-inference/src/engine.rs:710-1312``): model+tokenizer binding,
hyperparameter sanity gates at init, prompt → prefill → per-token decode
with KV cache, last-position logit extraction, stop handling, streaming,
``eval_ids`` for cross-validation, and performance metrics.

TPU-first differences from the reference design:
- prefill and decode are two **compiled programs** (static shapes); prompts
  are padded to power-of-two buckets so recompiles are rare
  (``prefill_buckets``);
- the KV cache is donated through the jit boundary → XLA in-place updates,
  no host-side lock (the reference wraps its cache in tokio RwLock);
- sampling runs **on device** inside the decode step (reference samples on
  host from a Vec<f32>);
- one host sync per token only to run tokenizer/stop logic.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, GenerationConfig, ModelConfig
from ..errors import ConfigError, InferenceError
from ..models.bitnet import BitNetParams, forward, logits as model_logits
from .cache import KVCache, allocate_cache, is_flat, reset_cache
from .sampling import NEG_INF, MirostatState, SamplerChain, logprob_entry
from .stop import StopCriteria, StopReason


@dataclasses.dataclass
class TokenEvent:
    """One streamed token (reference: ``bitnet-generation/src/lib.rs:196``)."""

    token_id: int
    text: str
    index: int
    logprob: float | None = None
    # [(token_id, logprob)] of the top-N alternatives, highest first
    # (populated when GenerationConfig.logprobs >= 1)
    top_logprobs: list[tuple[int, float]] | None = None


@dataclasses.dataclass
class GenerationResult:
    text: str
    token_ids: list[int]
    stop_reason: StopReason
    prompt_tokens: int
    metrics: dict
    # acceptance stats when produced by engine.speculative (else None)
    spec_stats: dict | None = None
    # per emitted token: {"token_id", "text", "logprob", "top": [(id, lp)]}
    # when GenerationConfig.logprobs is set (else None)
    logprobs: list[dict] | None = None


@dataclasses.dataclass
class PerformanceMetrics:
    """tok/s, TTFT, timing breakdown (engine.rs:541-707)."""

    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_s: float = 0.0
    decode_s: float = 0.0
    ttft_s: float = 0.0

    @property
    def decode_tok_s(self) -> float:
        return self.generated_tokens / self.decode_s if self.decode_s > 0 else 0.0

    @property
    def prefill_tok_s(self) -> float:
        return self.prompt_tokens / self.prefill_s if self.prefill_s > 0 else 0.0

    def as_dict(self) -> dict:
        return {
            "prompt_tokens": self.prompt_tokens,
            "generated_tokens": self.generated_tokens,
            "prefill_s": round(self.prefill_s, 4),
            "decode_s": round(self.decode_s, 4),
            "ttft_s": round(self.ttft_s, 4),
            "decode_tok_s": round(self.decode_tok_s, 2),
            "prefill_tok_s": round(self.prefill_tok_s, 2),
        }


def prefill_buckets(max_seq_len: int, smallest: int = 8) -> list[int]:
    out, b = [], smallest
    while b < max_seq_len:
        out.append(b)
        b *= 2
    out.append(max_seq_len)
    return out


class InferenceEngine:
    """Single-host engine (batch dim present; multi-host lives in parallel/)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: BitNetParams,
        engine_cfg: EngineConfig | None = None,
        tokenizer=None,
    ):
        self.cfg = cfg
        self.params = params
        self.engine_cfg = engine_cfg or EngineConfig()
        self.tokenizer = tokenizer
        tl_quantized = None
        if self.engine_cfg.weight_quant in ("tl1", "tl2"):
            # runtime TL re-quantization (reference tl1.rs/tl2.rs): every
            # linear moves to the TL table-lookup kernel layout
            from ..quant.tl import quantize_params_tl

            params = quantize_params_tl(params,
                                        self.engine_cfg.weight_quant)
            self.params = params
            tl_quantized = self.engine_cfg.weight_quant
        fuse_fell_back = False
        if (self.engine_cfg.fuse_projections
                and params.blocks.wqkv is None):
            from ..models.bitnet import fuse_block_params
            import dataclasses as _dc

            fused = fuse_block_params(params.blocks)
            fuse_fell_back = fused.wqkv is None
            self.params = _dc.replace(params, blocks=fused)
        # hyperparameter sanity gates (engine.rs:786-792)
        cfg.validate()
        if self.engine_cfg.max_seq_len > cfg.max_seq_len:
            raise ConfigError(
                f"engine max_seq_len {self.engine_cfg.max_seq_len} exceeds "
                f"model context {cfg.max_seq_len}"
            )
        self._kernel_path = self._resolve_kernel_path()
        if (self.engine_cfg.logits_dtype == "int8"
                and self._kernel_path == "w2a8"):
            from ..models.bitnet import quantize_head

            self.params = quantize_head(self.params)
        self.windowed = self.engine_cfg.sliding_window > 0
        # windowed engines chunk prefill at the ring width (two tokens a
        # window apart may not scatter to the same slot in one call)
        self._buckets = prefill_buckets(
            min(self.engine_cfg.sliding_window, self.engine_cfg.max_seq_len)
            if self.windowed else self.engine_cfg.max_seq_len)
        self._prefill_jit = {}
        self._decode_jit = None
        self._sample_jit = {}
        if self.windowed:
            from .windowed_cache import allocate_windowed_cache

            self.cache = allocate_windowed_cache(
                cfg, self.engine_cfg.max_batch_size,
                self.engine_cfg.sliding_window,
                self.engine_cfg.resolve_kv_cache_dtype())
        else:
            self.cache = allocate_cache(
                cfg, self.engine_cfg.max_batch_size,
                self.engine_cfg.max_seq_len,
                self.engine_cfg.resolve_kv_cache_dtype(), layout="auto",
            )
        self.kernel_recorder: list[str] = []
        if tl_quantized:
            self.kernel_recorder.append(f"weight_quant_{tl_quantized}")
        blk = getattr(self.params.blocks, "wqkv", None)
        if (blk is not None and blk.kind in ("tl", "bitnet32")
                and self._kernel_path == "w2a8"):
            import os as _os

            if (_os.environ.get("BITNET_TL_W2A8", "1") == "1"
                    and blk.k % 256 == 0):
                self.kernel_recorder.append("ternary_matmul_tl_w2a8_stacked")
        if fuse_fell_back:
            # surfaced in honest-compute receipts: the engine asked for
            # fused projections but runs the unfused 7-call path
            self.kernel_recorder.append("fuse_projections_fallback")
        self.prefix_cache = None
        if self.engine_cfg.prefix_cache_tokens > 0:
            from .prefix_cache import PrefixCache

            self.prefix_cache = PrefixCache(
                self.engine_cfg.prefix_cache_tokens)
        self._restore_jit = {}

    # -- kernel path --------------------------------------------------------
    def _resolve_kernel_path(self) -> str:
        kp = self.engine_cfg.kernel_path
        if kp != "auto":
            return kp
        # w2a8 = fused unpack + int8 MXU with per-token int8 activations —
        # the shipped TPU configuration (and the reference's own numerics:
        # its CPU/GPU kernels compute on quantized activations too,
        # bitnet-kernels/src/cpu/x86.rs:417)
        return "w2a8" if jax.default_backend() == "tpu" else "xla"

    # -- compiled steps ------------------------------------------------------
    def _get_prefill(self, T: int) -> Callable:
        if T not in self._prefill_jit:
            kp = self._kernel_path
            S = self.engine_cfg.max_seq_len

            if self.windowed:
                @partial(jax.jit, donate_argnums=(3,))
                def _prefill(params, tokens, positions, cache, n_real,
                             last_idx):
                    from .windowed_cache import forward_windowed

                    h, cache = forward_windowed(
                        self.cfg, params, tokens, positions, cache,
                        n_real, kp, pad_marker=S)
                    B = h.shape[0]
                    h_last = h[jnp.arange(B), last_idx][:, None, :]
                    lg = model_logits(self.cfg, params, h_last, kp)[:, 0, :]
                    return lg, h, cache
            else:
                @partial(jax.jit, donate_argnums=(3,))
                def _prefill(params, tokens, positions, cache, n_real,
                             last_idx):
                    from ..models.bitnet import forward_cache

                    h, cache = forward_cache(
                        self.cfg, params, tokens, positions, cache,
                        n_real, kp)
                    # last-real-position logits, fused into the program
                    B = h.shape[0]
                    h_last = h[jnp.arange(B), last_idx][:, None, :]
                    lg = model_logits(self.cfg, params, h_last, kp)[:, 0, :]
                    return lg, h, cache

            self._prefill_jit[T] = _prefill
        return self._prefill_jit[T]

    def _get_decode(self) -> Callable:
        if self._decode_jit is None:
            kp = self._kernel_path
            S = self.engine_cfg.max_seq_len

            if self.windowed:
                @partial(jax.jit, donate_argnums=(2,))
                def _decode(params, token, cache, positions):
                    from .windowed_cache import forward_windowed

                    h, cache = forward_windowed(
                        self.cfg, params, token, positions, cache, 1, kp,
                        pad_marker=S)
                    lg = model_logits(self.cfg, params, h, kp)
                    return lg[:, -1, :], cache
            else:
                @partial(jax.jit, donate_argnums=(2,))
                def _decode(params, token, cache, positions):
                    from ..models.bitnet import forward_cache

                    h, cache = forward_cache(
                        self.cfg, params, token, positions, cache, 1, kp)
                    lg = model_logits(self.cfg, params, h, kp)  # [B, 1, V]
                    return lg[:, -1, :], cache

            self._decode_jit = _decode
        return self._decode_jit

    def _get_sampler(self, gen_cfg: GenerationConfig) -> Callable:
        key = (gen_cfg.temperature, gen_cfg.top_k, gen_cfg.top_p,
               gen_cfg.min_p, gen_cfg.typical_p, gen_cfg.repetition_penalty,
               gen_cfg.frequency_penalty, gen_cfg.presence_penalty,
               gen_cfg.logit_bias, gen_cfg.is_greedy)
        if key not in self._sample_jit:
            chain = SamplerChain(gen_cfg)
            self._sample_jit[key] = jax.jit(chain.sample)
        return self._sample_jit[key]

    def _grammar_matcher(self, gen_cfg: GenerationConfig):
        """Build the per-request constrained-decoding state (grammar
        compilation cached by source; the vocab trie built once)."""
        if not gen_cfg.grammar:
            return None
        if self.tokenizer is None:
            raise InferenceError("grammar decoding requires a tokenizer")
        from ..grammar import Grammar, TokenVocab, VocabMatcher

        if not hasattr(self, "_grammar_vocab"):
            self._grammar_vocab = TokenVocab.from_tokenizer(self.tokenizer)
            self._grammar_cache: dict[str, Grammar] = {}
        g = self._grammar_cache.get(gen_cfg.grammar)
        if g is None:
            g = Grammar.from_gbnf(gen_cfg.grammar)
            if len(self._grammar_cache) >= 32:    # bound per-source cache
                self._grammar_cache.pop(next(iter(self._grammar_cache)))
            self._grammar_cache[gen_cfg.grammar] = g
        return VocabMatcher(g, self._grammar_vocab)

    def _segment_steps(self) -> int:
        k = self.engine_cfg.decode_steps_per_dispatch
        if k == 0:
            return 8 if jax.default_backend() == "tpu" else 1
        return k

    def _get_segment(self, gen_cfg: GenerationConfig, n_steps: int):
        """K-step decode segment program (engine/loop.py) keyed by the
        sampler config + K."""
        key = ("seg", n_steps, gen_cfg.temperature, gen_cfg.top_k,
               gen_cfg.top_p, gen_cfg.min_p, gen_cfg.typical_p,
               gen_cfg.repetition_penalty, gen_cfg.frequency_penalty,
               gen_cfg.presence_penalty, gen_cfg.logit_bias,
               gen_cfg.is_greedy)
        if key not in self._sample_jit:
            from .loop import build_decode_segment

            self._sample_jit[key] = build_decode_segment(
                self.cfg, self._kernel_path, SamplerChain(gen_cfg), n_steps,
                self.engine_cfg.max_seq_len)
        return self._sample_jit[key]

    # -- helpers -------------------------------------------------------------
    def _reset_cache(self):
        """Logical cache reset, windowed-aware (stale ring positions
        must go back to -1 — lengths alone don't gate windowed reads)."""
        if self.windowed:
            from .windowed_cache import reset_windowed_cache

            return reset_windowed_cache(self.cache)
        return reset_cache(self.cache)

    def _bucket(self, T: int) -> int:
        for b in self._buckets:
            if T <= b:
                return b
        raise InferenceError(
            f"prompt of {T} tokens exceeds max_seq_len "
            f"{self.engine_cfg.max_seq_len}"
        )

    # -- prefix-cache restore --------------------------------------------------
    def _get_restore(self, Mp: int) -> Callable:
        if Mp not in self._restore_jit:

            @partial(jax.jit, donate_argnums=(0,))
            def _restore(cache, k_snap, v_snap, ks_snap, vs_snap, m):
                import jax.lax as lax

                from .cache import pool_rows, splice_origin

                # snaps arrive canonical [L, Mp, KV, D]; the layout seam
                # maps them into the pool's layout at slot 0
                ksn = pool_rows(k_snap, cache)[:, None]
                vsn = pool_rows(v_snap, cache)[:, None]
                zeros5 = splice_origin(cache, 0)
                k = lax.dynamic_update_slice(cache.k, ksn, zeros5)
                v = lax.dynamic_update_slice(cache.v, vsn, zeros5)
                ks, vs = cache.k_scale, cache.v_scale
                if ks is not None:
                    z4 = (0, 0, 0, 0)
                    ks = lax.dynamic_update_slice(ks, ks_snap[:, None], z4)
                    vs = lax.dynamic_update_slice(vs, vs_snap[:, None], z4)
                import dataclasses as _dc

                return _dc.replace(
                    cache, k=k, v=v, k_scale=ks, v_scale=vs,
                    lengths=cache.lengths.at[0].set(m))

            self._restore_jit[Mp] = _restore
        return self._restore_jit[Mp]

    def _restore_prefix(self, snap, m: int) -> None:
        """Write snapshot[:m] into cache slot 0 and set lengths[0]=m."""
        Mp = self._bucket(m)
        L, KV, D = (self.cfg.num_layers, self.cfg.num_kv_heads,
                    self.cfg.head_dim)
        kd = self.cache.k.dtype

        def padk(a):
            out = np.zeros((L, Mp, KV, D), a.dtype)
            out[:, :m] = a[:, :m]
            return jnp.asarray(out, kd)

        ks_snap = vs_snap = None
        if self.cache.k_scale is not None:
            def pads(a):
                out = np.zeros((L, Mp, KV), a.dtype)
                out[:, :m] = a[:, :m]
                return jnp.asarray(out, jnp.float32)

            ks_snap, vs_snap = pads(snap.k_scale), pads(snap.v_scale)
        self.cache = self._get_restore(Mp)(
            self.cache, padk(snap.k), padk(snap.v), ks_snap, vs_snap,
            jnp.int32(m))

    # -- prefill -------------------------------------------------------------
    def prefill(self, token_ids: list[int]) -> jnp.ndarray:
        """Run the prompt through the model; returns last-token logits [B, V].

        Resets the cache (single-sequence engine semantics, like
        ``InferenceEngine::prefill`` engine.rs:1022).  With a prefix cache
        enabled, the longest previously-seen prompt prefix is restored from
        a host snapshot and only the suffix runs through the model.
        """
        T = len(token_ids)
        if T == 0:
            raise InferenceError("empty prompt")
        S = self.engine_cfg.max_seq_len
        if T > S:
            raise InferenceError(f"prompt {T} tokens > max_seq_len {S}")
        if self.windowed:
            return self._prefill_windowed(token_ids)
        self.cache = self._reset_cache()

        m = 0
        if self.prefix_cache is not None:
            m, snap = self.prefix_cache.lookup(token_ids)
            m = min(m, T - 1)   # always run ≥1 token for last-pos logits
            if m > 0:
                self._restore_prefix(snap, m)
                self.kernel_recorder.append(f"prefix_restore_m{m}")

        B = self.engine_cfg.max_batch_size
        Ts = T - m
        Tp = self._bucket(Ts)
        toks = np.zeros((B, Tp), np.int32)
        toks[0, :Ts] = token_ids[m:]
        pos = np.full((B, Tp), S, np.int32)  # padding → OOB drop
        pos[0, :Ts] = np.arange(m, T)
        fn = self._get_prefill(Tp)
        lg, _h, self.cache = fn(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray([Ts] + [0] * (B - 1), jnp.int32),
            jnp.asarray([Ts - 1] + [0] * (B - 1), jnp.int32),
        )
        self.kernel_recorder.append(
            f"prefill_{self._kernel_path}_T{Tp}")
        if self.prefix_cache is not None and T > m:
            from .prefix_cache import snapshot_from_cache

            self.prefix_cache.insert(
                list(token_ids), snapshot_from_cache(
                    self.cache, T, kv_heads=self.cfg.num_kv_heads))
        return lg

    def _prefill_windowed(self, token_ids: list[int]) -> jnp.ndarray:
        """Ring-buffer prefill: the prompt runs through the model in
        ≤ window-token chunks (two tokens a window apart would collide
        on a ring slot inside one call — forward_windowed refuses).
        Only the trailing ``sliding_window`` positions stay resident;
        earlier KV rows are overwritten, exactly the sliding-window
        attention semantics (sliding_window.rs:238-441)."""
        from .windowed_cache import reset_windowed_cache

        self.cache = reset_windowed_cache(self.cache)
        T = len(token_ids)
        S = self.engine_cfg.max_seq_len
        B = self.engine_cfg.max_batch_size
        cap = self._buckets[-1]
        lg = None
        done = 0
        n_chunks = 0
        while done < T:
            piece = token_ids[done:done + cap]
            Ts = len(piece)
            Tp = self._bucket(Ts)
            toks = np.zeros((B, Tp), np.int32)
            toks[0, :Ts] = piece
            pos = np.full((B, Tp), S, np.int32)   # pad_marker → dropped
            pos[0, :Ts] = np.arange(done, done + Ts)
            fn = self._get_prefill(Tp)
            lg, _h, self.cache = fn(
                self.params, jnp.asarray(toks), jnp.asarray(pos),
                self.cache,
                jnp.asarray([Ts] + [0] * (B - 1), jnp.int32),
                jnp.asarray([Ts - 1] + [0] * (B - 1), jnp.int32),
            )
            done += Ts
            n_chunks += 1
        self.kernel_recorder.append(
            f"prefill_windowed_{self._kernel_path}"
            f"_W{self.engine_cfg.sliding_window}_chunks{n_chunks}")
        return lg

    def _relogit_last(self, token_ids: list[int]) -> jnp.ndarray:
        """Recover last-token logits from a restored cache: rewind the
        valid length by one and re-run the final token through decode
        (its KV row is simply overwritten in place)."""
        import dataclasses as _dc

        T = len(token_ids)
        B = self.engine_cfg.max_batch_size
        S = self.engine_cfg.max_seq_len
        self.cache = _dc.replace(
            self.cache, lengths=self.cache.lengths.at[0].set(T - 1))
        tok = np.zeros((B, 1), np.int32)
        tok[0, 0] = token_ids[-1]
        pos = np.full((B, 1), S, np.int32)
        pos[0, 0] = T - 1
        lg, self.cache = self._get_decode()(
            self.params, jnp.asarray(tok), self.cache, jnp.asarray(pos))
        self.kernel_recorder.append("resume_relogit")
        return lg

    def generate_from_state(
        self,
        token_ids: list[int],
        already_generated: int = 0,
        gen_cfg: GenerationConfig | None = None,
    ) -> GenerationResult:
        """Continue generation after a checkpoint restore
        (engine.checkpoint.resume_generation).  ``token_ids`` is the FULL
        context (prompt + previously generated); only newly generated
        tokens are returned."""
        gen_cfg = gen_cfg or GenerationConfig()
        remaining = gen_cfg.max_new_tokens - already_generated
        if remaining <= 0:
            return GenerationResult(
                text="", token_ids=[], stop_reason=StopReason.MAX_TOKENS,
                prompt_tokens=len(token_ids), metrics={})
        gen_cfg = gen_cfg.replace(max_new_tokens=remaining)
        if gen_cfg.grammar and already_generated:
            # the pushdown state must match the generation point: replay
            # the previously generated tokens through a fresh matcher
            # (scheduler checkpoint restore does the same)
            self._grammar_replay = token_ids[-already_generated:]
        out_ids = [ev.token_id for ev in
                   self.generate_stream(token_ids, gen_cfg, resume=True)]
        text = (self.tokenizer.decode(out_ids)
                if self.tokenizer is not None else "")
        return GenerationResult(
            text=text, token_ids=out_ids,
            stop_reason=self._last_stop_reason,
            prompt_tokens=len(token_ids),
            metrics=self._last_metrics.as_dict())

    # -- generation ----------------------------------------------------------
    def generate_stream(
        self,
        token_ids: list[int],
        gen_cfg: GenerationConfig | None = None,
        resume: bool = False,
    ) -> Iterator[TokenEvent]:
        """Stream tokens (reference: ``bitnet-inference/src/streaming.rs``).

        ``resume=True`` skips prefill: the KV cache already holds
        ``len(token_ids)`` entries (checkpoint restore); the last token is
        re-scored through one decode step to recover its logits.
        """
        gen_cfg = gen_cfg or GenerationConfig()
        metrics = PerformanceMetrics(prompt_tokens=len(token_ids))
        self._last_metrics = metrics

        eos_id = None
        if self.tokenizer is not None:
            eos_id = getattr(self.tokenizer, "eos_token_id", None)
        stop = StopCriteria(
            max_new_tokens=gen_cfg.max_new_tokens,
            eos_token_id=eos_id,
            stop_token_ids=frozenset(gen_cfg.stop_token_ids),
            stop_sequences=tuple(gen_cfg.stop_sequences),
            min_new_tokens=gen_cfg.min_new_tokens,
        )
        # min_new_tokens: EOS rides the logit-bias machinery so device
        # sampling stays exact — a second compiled chain with EOS banned
        # is used while generated < min (vLLM min_tokens semantics)
        sampler_ban = None
        if gen_cfg.min_new_tokens > 0:
            d = dict(gen_cfg.logit_bias)
            if eos_id is not None:
                d[int(eos_id)] = -1e30
            for t in gen_cfg.stop_token_ids:     # vLLM bans these too
                d[int(t)] = -1e30
            if d != dict(gen_cfg.logit_bias):
                sampler_ban = self._get_sampler(gen_cfg.replace(
                    logit_bias=tuple(sorted(d.items())),
                    min_new_tokens=0))
        self._last_stop_reason = StopReason.MAX_TOKENS

        seed = gen_cfg.seed if gen_cfg.seed is not None else (
            0 if self.engine_cfg.strict.deterministic else time.time_ns() % (2**31)
        )
        key = jax.random.PRNGKey(seed)
        sampler = self._get_sampler(gen_cfg)
        mirostat = (MirostatState.from_config(gen_cfg)
                    if gen_cfg.mirostat else None)
        grammar = self._grammar_matcher(gen_cfg)
        replay = self.__dict__.pop("_grammar_replay", None)
        if grammar is not None and replay:
            for t in replay:
                grammar.accept(int(t))

        t0 = time.perf_counter()
        if resume:
            if self.windowed:
                raise InferenceError(
                    "checkpoint resume requires the dense cache "
                    "(DecodeState snapshots are position-indexed rows)")
            logits = self._relogit_last(token_ids)
        else:
            logits = self.prefill(token_ids)
        logits.block_until_ready()
        metrics.prefill_s = time.perf_counter() - t0
        metrics.ttft_s = metrics.prefill_s

        B = self.engine_cfg.max_batch_size
        S = self.engine_cfg.max_seq_len
        W = gen_cfg.repetition_window
        history = np.full((B, W), -1, np.int32)
        hist_ids = token_ids[-W:]
        history[0, : len(hist_ids)] = hist_ids
        history_dev = jnp.asarray(history)

        decode = self._get_decode()
        pos = len(token_ids)
        t_dec = time.perf_counter()
        generated = 0
        emitted: list[int] = []
        # K-step segments: sample→forward K times in ONE dispatch
        # (engine/loop.py); mirostat, grammar and logprobs keep K=1
        # (host-side per-step state / per-step logits reads)
        lp_n = gen_cfg.logprobs
        K = (self._segment_steps()
             if mirostat is None and grammar is None and lp_n is None
             and not self.windowed
             else 1)
        active = jnp.asarray([True] + [False] * (B - 1))
        stopped = False
        while not stopped:
            if pos >= S:
                if self.engine_cfg.context_overflow == "shift":
                    # keep-half truncation + re-prefill (reference
                    # engine.rs:1222-1227): generation continues on the
                    # trimmed context
                    keep = max(1, S // 2)
                    kept = (list(token_ids) + emitted)[-keep:]
                    logits = self.prefill(kept)
                    pos = keep
                    self.kernel_recorder.append(f"context_shift_keep{keep}")
                    continue
                self._last_stop_reason = StopReason.CONTEXT_FULL
                break
            remaining = gen_cfg.max_new_tokens - generated
            in_min = generated < gen_cfg.min_new_tokens
            if K > 1 and remaining >= K and pos + K <= S and not in_min:
                seg = self._get_segment(gen_cfg, K)
                toks, logits, self.cache, _pos_dev, history_dev, key = seg(
                    self.params, logits, self.cache,
                    jnp.where(active, pos, S).astype(jnp.int32),
                    history_dev, key, active)
                step_toks = [int(t) for t in np.asarray(toks[0])]
                pos_delta = K
            else:
                key, sub = jax.random.split(key)
                step_logits = logits
                if grammar is not None:
                    mask = grammar.allowed_mask()
                    stoppable = mask
                    if in_min and eos_id is not None and mask.any():
                        # min phase bans EOS: stop NOW if the grammar
                        # admits nothing else (can't continue)
                        stoppable = mask.copy()
                        stoppable[eos_id] = False
                    if not stoppable.any():
                        # grammar dead end and EOS illegal: stop cleanly
                        self._last_stop_reason = StopReason.EOS
                        self.kernel_recorder.append("grammar_dead_end")
                        break
                    step_logits = jnp.where(
                        jnp.asarray(mask)[None, :], logits,
                        jnp.asarray(NEG_INF, logits.dtype))
                if mirostat is not None:
                    row = step_logits[0]
                    if in_min:
                        for t in ({eos_id} if eos_id is not None
                                  else set()) | set(gen_cfg.stop_token_ids):
                            row = row.at[int(t)].set(NEG_INF)
                    tok_id = mirostat.sample(row, sub)
                    token = jnp.full((B, 1), tok_id, jnp.int32)
                else:
                    chain = (sampler_ban if in_min and sampler_ban
                             is not None else sampler)
                    sampled = chain(step_logits, history_dev, sub)  # [B]
                    token = sampled[:, None]
                    tok_id = int(sampled[0])
                if grammar is not None:
                    grammar.accept(tok_id)
                step_toks = None
                pos_delta = 1

            if step_toks is None:
                # single-step path: sample → stop-check → decode
                generated += 1
                metrics.generated_tokens = generated
                text = (self.tokenizer.token_to_piece(tok_id)
                        if self.tokenizer is not None else "")
                ev = TokenEvent(token_id=tok_id, text=text,
                                index=generated - 1)
                if lp_n is not None:
                    # raw model distribution (pre-mask/penalty), the
                    # OpenAI/llama.cpp logprobs convention
                    ev.logprob, ev.top_logprobs = logprob_entry(
                        np.asarray(logits[0]), tok_id, lp_n)
                reason = stop.check(tok_id, text)
                if reason in (StopReason.STOP_TOKEN, StopReason.EOS):
                    # stop tokens are not emitted (engine.rs stop handling)
                    self._last_stop_reason = reason
                    break
                emitted.append(tok_id)
                yield ev
                if reason is not None:
                    self._last_stop_reason = reason
                    break
                positions = np.full((B, 1), S, np.int32)
                positions[0, 0] = pos
                logits, self.cache = decode(
                    self.params, token, self.cache, jnp.asarray(positions))
                history_dev = jnp.roll(
                    history_dev, -1, axis=1).at[:, -1].set(token[:, 0])
                pos += pos_delta
            else:
                # segment path: all K tokens are already decoded on device;
                # the host replays stop logic and discards any overshoot
                for tok_id in step_toks:
                    generated += 1
                    metrics.generated_tokens = generated
                    text = (self.tokenizer.token_to_piece(tok_id)
                            if self.tokenizer is not None else "")
                    ev = TokenEvent(token_id=tok_id, text=text,
                                    index=generated - 1)
                    reason = stop.check(tok_id, text)
                    if reason in (StopReason.STOP_TOKEN, StopReason.EOS):
                        self._last_stop_reason = reason
                        stopped = True
                        break
                    emitted.append(tok_id)
                    yield ev
                    if reason is not None:
                        self._last_stop_reason = reason
                        stopped = True
                        break
                pos += pos_delta
        metrics.decode_s = time.perf_counter() - t_dec
        # record WHICH attention kernel the stacked loop selected (one
        # source of truth: models.bitnet.decode_attn_plan) so receipts
        # state the real compute path — ONLY when the stacked rows-mode
        # loop actually runs (dense/non-stackable weights, B>32, or
        # ys-mode take the generic path and must not claim a plan)
        import os as _os

        from ..models.bitnet import _stacked_decode_ok, decode_attn_plan

        stacked = (self._kernel_path == "w2a8"
                   and not self.windowed
                   and _os.environ.get("BITNET_CACHE_YS", "0") != "1"
                   and _stacked_decode_ok(
                       self.cfg, self.params, 1, B, self.cache.k_scale,
                       None, None, None, self._kernel_path))
        if self.windowed:
            # ring-buffer decode rides the generic masked-attention path
            self.kernel_recorder.append(
                f"decode_{self._kernel_path}_attn_windowed"
                f"_W{self.engine_cfg.sliding_window}_x{generated}")
        elif stacked:
            plan = decode_attn_plan(
                B, self.cache.k.dtype if self.cache.k_scale is not None
                else None, flat=is_flat(self.cache))
            self.kernel_recorder.append(
                f"decode_{self._kernel_path}_attn_{plan}_x{generated}")
        else:
            self.kernel_recorder.append(
                f"decode_{self._kernel_path}_x{generated}")

    def generate(
        self,
        prompt: str | list[int],
        gen_cfg: GenerationConfig | None = None,
    ) -> GenerationResult:
        """Tokenize → generate → decode (engine.rs:866 generate_with_config)."""
        gen_cfg = gen_cfg or GenerationConfig()
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise InferenceError("string prompt requires a tokenizer")
            token_ids = self.tokenizer.encode(prompt, add_bos=gen_cfg.add_bos)
        else:
            token_ids = list(prompt)

        out_ids: list[int] = []
        lps: list[dict] | None = ([] if gen_cfg.logprobs is not None
                                  else None)
        for ev in self.generate_stream(token_ids, gen_cfg):
            out_ids.append(ev.token_id)
            if lps is not None:
                lps.append({"token_id": ev.token_id, "text": ev.text,
                            "logprob": ev.logprob,
                            "top": ev.top_logprobs or []})
        text = (self.tokenizer.decode(out_ids)
                if self.tokenizer is not None else "")
        # recorded for deterministic replay via honest-compute receipts
        self._last_request = {
            "prompt_ids": list(token_ids),
            "output_ids": list(out_ids),
            "gen": {
                "max_new_tokens": gen_cfg.max_new_tokens,
                "temperature": gen_cfg.temperature,
                "top_k": gen_cfg.top_k,
                "top_p": gen_cfg.top_p,
                "min_p": gen_cfg.min_p,
                "repetition_penalty": gen_cfg.repetition_penalty,
                "seed": gen_cfg.seed,
                "greedy": gen_cfg.greedy,
            },
        }
        return GenerationResult(
            text=text,
            token_ids=out_ids,
            stop_reason=self._last_stop_reason,
            prompt_tokens=len(token_ids),
            metrics=self._last_metrics.as_dict(),
            logprobs=lps,
        )

    def generate_batch(
        self,
        prompts: list[list[int]],
        gen_cfg: GenerationConfig | None = None,
    ) -> list[GenerationResult]:
        """Batched generation: ONE prefill call over all slots, lockstep
        decode with per-slot stopping (reference batch API,
        ``bitnet-inference/src/batch.rs:35-121``).

        ``len(prompts)`` must be ≤ ``max_batch_size``.  Finished slots keep
        riding the compiled step (static shapes); their output is ignored.
        """
        gen_cfg = gen_cfg or GenerationConfig()
        if gen_cfg.grammar:
            raise InferenceError(
                "grammar decoding is per-sequence host-side state; use "
                "generate/generate_stream or the scheduler, not the "
                "lockstep batch API")
        if gen_cfg.logprobs is not None:
            raise InferenceError(
                "logprobs need per-step host logits reads; use "
                "generate/generate_stream or the scheduler, not the "
                "lockstep batch API")
        B = self.engine_cfg.max_batch_size
        S = self.engine_cfg.max_seq_len
        nb = len(prompts)
        if nb == 0:
            return []
        if nb > B:
            raise InferenceError(
                f"{nb} prompts > max_batch_size {B}; raise EngineConfig."
                "max_batch_size or use serve.ContinuousBatchingScheduler")
        lens = [len(p) for p in prompts]
        if any(l == 0 for l in lens):
            raise InferenceError("empty prompt in batch")
        if max(lens) >= S:
            raise InferenceError(f"prompt of {max(lens)} tokens ≥ "
                                 f"max_seq_len {S}")

        # --- one prefill over all slots ---
        self.cache = self._reset_cache()
        Tp = self._bucket(max(lens))
        toks = np.zeros((B, Tp), np.int32)
        pos = np.full((B, Tp), S, np.int32)
        n_real = np.zeros((B,), np.int32)
        last_idx = np.zeros((B,), np.int32)
        for i, p in enumerate(prompts):
            toks[i, : lens[i]] = p
            pos[i, : lens[i]] = np.arange(lens[i])
            n_real[i] = lens[i]
            last_idx[i] = lens[i] - 1
        fn = self._get_prefill(Tp)
        logits, _h, self.cache = fn(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray(n_real), jnp.asarray(last_idx))
        self.kernel_recorder.append(f"prefill_batch{nb}_T{Tp}")

        # --- lockstep decode ---
        eos_id = None
        if self.tokenizer is not None:
            eos_id = getattr(self.tokenizer, "eos_token_id", None)
        stops = [StopCriteria(
            max_new_tokens=gen_cfg.max_new_tokens,
            eos_token_id=eos_id,
            stop_token_ids=frozenset(gen_cfg.stop_token_ids),
            stop_sequences=tuple(gen_cfg.stop_sequences),
        ) for _ in range(nb)]
        done = [False] * nb
        reasons = [StopReason.MAX_TOKENS] * nb
        outs: list[list[int]] = [[] for _ in range(nb)]

        seed = gen_cfg.seed if gen_cfg.seed is not None else (
            0 if self.engine_cfg.strict.deterministic
            else time.time_ns() % (2**31))
        key = jax.random.PRNGKey(seed)
        sampler = self._get_sampler(gen_cfg)
        W = gen_cfg.repetition_window
        history = np.full((B, W), -1, np.int32)
        for i, p in enumerate(prompts):
            h = p[-W:]
            history[i, : len(h)] = h
        history_dev = jnp.asarray(history)

        decode = self._get_decode()
        positions_host = np.array(lens + [0] * (B - nb), np.int32)
        while not all(done):
            if positions_host[:nb].max() >= S:
                break
            key, sub = jax.random.split(key)
            sampled = sampler(logits, history_dev, sub)       # [B]
            samp_host = np.asarray(sampled)
            for i in range(nb):
                if done[i]:
                    continue
                t = int(samp_host[i])
                piece = (self.tokenizer.token_to_piece(t)
                         if self.tokenizer is not None else "")
                r = stops[i].check(t, piece)
                if r in (StopReason.STOP_TOKEN, StopReason.EOS):
                    done[i], reasons[i] = True, r
                    continue
                outs[i].append(t)
                if r is not None:
                    done[i], reasons[i] = True, r
            if all(done):
                break
            positions = np.full((B, 1), S, np.int32)
            for i in range(nb):
                if not done[i] and positions_host[i] < S:
                    positions[i, 0] = positions_host[i]
                    positions_host[i] += 1
            logits, self.cache = decode(
                self.params, sampled[:, None].astype(jnp.int32), self.cache,
                jnp.asarray(positions))
            history_dev = jnp.roll(history_dev, -1, axis=1).at[:, -1].set(
                sampled)
        self.kernel_recorder.append(f"decode_batch{nb}")

        results = []
        for i in range(nb):
            text = (self.tokenizer.decode(outs[i])
                    if self.tokenizer is not None else "")
            results.append(GenerationResult(
                text=text, token_ids=outs[i], stop_reason=reasons[i],
                prompt_tokens=lens[i], metrics={}))
        return results

    # -- multi-chip ------------------------------------------------------------
    def shard_to_mesh(self, mesh=None, dp: int | None = None,
                      tp: int | None = None) -> "InferenceEngine":
        """Re-place parameters and KV cache on a (data, model) mesh.

        The compiled step functions are pure functions of (params, cache),
        so GSPMD transparently partitions them once the inputs carry
        NamedShardings: column-parallel qkv/gate/up, row-parallel o/down
        with psum over ICI, KV heads on the model axis, batch on data
        (parallel/sharding.py).  This is the real version of the
        reference's simulated distributed engine
        (bitnet-gpu-hal/src/distributed_inference.rs).

        Constraints: max_batch_size must be divisible by the data axis and
        num_kv_heads by the model axis.  Returns self (chainable).
        """
        from ..parallel import make_mesh, shard_cache, shard_params
        from ..parallel.sharding import validate_mesh_for

        if mesh is None:
            mesh = make_mesh(dp=dp, tp=tp)
        validate_mesh_for(self.cfg, self.engine_cfg.max_batch_size, mesh,
                          self.params)
        self.params = shard_params(mesh, self.cfg, self.params)
        # TP shards the KV-heads axis — the flat single-chip layout
        # merges it away, so sharded engines run the 5D cache (the
        # sharded decode plan is einsum, which wants 5D anyway)
        from .cache import as_5d

        self.cache = shard_cache(mesh, as_5d(self.cache, self.cfg))
        self.mesh = mesh
        # drop compiled programs traced with unsharded inputs
        self._prefill_jit = {}
        self._decode_jit = None
        self._restore_jit = {}
        return self

    def embed_ids(self, token_ids: list[int]) -> np.ndarray:
        """Final-hidden-state embeddings for a sequence, [T, H] float32
        (the llama-cpp ``embedding=True`` path; reference exposes it via
        ``context.get_embeddings``, bitnet-py/src/llama_compat.py:275)."""
        T = len(token_ids)
        S = self.engine_cfg.max_seq_len
        self.cache = self._reset_cache()
        B = self.engine_cfg.max_batch_size
        Tp = self._bucket(T)
        toks = np.zeros((B, Tp), np.int32)
        toks[0, :T] = token_ids
        pos = np.full((B, Tp), S, np.int32)
        pos[0, :T] = np.arange(T)
        fn = self._get_prefill(Tp)
        _lg, h, self.cache = fn(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray([T] + [0] * (B - 1), jnp.int32),
            jnp.asarray([T - 1] + [0] * (B - 1), jnp.int32),
        )
        return np.asarray(h[0, :T], dtype=np.float32)

    # -- cross-validation ------------------------------------------------------
    def eval_ids(self, token_ids: list[int]) -> np.ndarray:
        """Per-position logits for the whole sequence (engine.rs:852
        ``eval_ids`` — the crossval entry point). Returns [T, V] float32."""
        T = len(token_ids)
        S = self.engine_cfg.max_seq_len
        self.cache = self._reset_cache()
        B = self.engine_cfg.max_batch_size
        Tp = self._bucket(T)
        toks = np.zeros((B, Tp), np.int32)
        toks[0, :T] = token_ids
        pos = np.full((B, Tp), S, np.int32)
        pos[0, :T] = np.arange(T)
        fn = self._get_prefill(Tp)
        _lg, h, self.cache = fn(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray([T] + [0] * (B - 1), jnp.int32),
            jnp.asarray([T - 1] + [0] * (B - 1), jnp.int32),
        )
        lg = model_logits(self.cfg, self.params, h, self._kernel_path)
        return np.asarray(lg[0, :T], dtype=np.float32)

    @classmethod
    def from_gguf(
        cls,
        path: str,
        engine_cfg: EngineConfig | None = None,
        tokenizer=None,
        mode: str = "auto",
    ) -> "InferenceEngine":
        from ..models.loader import load_model
        from ..tokenizer import load_tokenizer

        engine_cfg = engine_cfg or EngineConfig()
        dtype = jnp.float32 if engine_cfg.compute_dtype == "f32" else jnp.bfloat16
        cfg, params, report = load_model(path, mode=mode, param_dtype=dtype)
        if engine_cfg.max_seq_len > cfg.max_seq_len:
            engine_cfg = engine_cfg.replace(max_seq_len=cfg.max_seq_len)
        if tokenizer is None:
            tokenizer = load_tokenizer(path)
        eng = cls(cfg, params, engine_cfg, tokenizer)
        eng.load_report = report
        return eng
