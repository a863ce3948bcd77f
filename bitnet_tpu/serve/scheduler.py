"""Continuous-batching scheduler.

Supersedes the reference's request-level ``BatchEngine``
(``bitnet-server/src/batch_engine.rs:17-164``) with per-decode-step
insertion/eviction (SURVEY.md §7 P5): a fixed pool of B cache slots; every
engine step advances ALL active sequences one token in a single batched
forward; finished sequences free their slot immediately and pending
requests are prefilled into free slots between steps.

TPU-first details:
- one compiled decode program for the whole pool (static B), per-slot
  absolute positions + valid lengths make ragged batches exact;
- prefill runs at B=1 and the fresh KV rows are spliced into the pool
  cache at the assigned slot (cache rows are independent);
- per-slot sampling parameters (temperature / top-k / top-p / min-p /
  repetition-penalty) ride through the compiled sampler as traced arrays,
  and each slot carries its own PRNG key stream — scheduler output is
  token-for-token identical to ``engine.generate`` for the same seed;
- mirostat is stateful and per-sequence, so mirostat slots sample on host
  from the raw logits with the slot's key stream (same split sequence as
  the engine's mirostat path).

Request lifecycle extras (reference ``batch_engine.rs:17-103`` priorities/
timeouts, ``streaming.rs:499`` cancellation): ``Request.cancel()`` frees
the slot within one step, ``timeout_s`` bounds total latency, queued
requests that outwait ``queue_timeout_s`` are rejected at admission, and
``max_admissions_per_step`` caps how many B=1 prefills may stall the
decode loop between steps (head-of-line-blocking bound).

Chunked prefill (``chunked_prefill=N``; exceeds the reference, which
prefills whole prompts request-at-a-time): prompts longer than N are
prefilled N tokens per scheduler step into a staging carry (dense mode)
or directly into the slot's pre-reserved pages (paged mode), interleaved
with decode dispatches — inter-token latency of in-flight streams is
bounded by one chunk forward instead of one whole-prompt forward.
Token output is bit-identical to whole-prompt prefill (the chunk
continuation path is the same incremental ``forward`` the decode step
uses, just T=chunk instead of T=1).
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from functools import partial
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, GenerationConfig, ModelConfig
from ..engine.cache import (KVCache, allocate_cache, canonical_rows,
                            pool_rows, splice_origin, staging_shape)
from ..engine.sampling import (NEG_INF, MirostatState, SamplerChain,
                               logprob_entry)
from ..engine.stop import StopCriteria, StopReason
from ..errors import InferenceError
from ..models.bitnet import BitNetParams, forward, logits as model_logits

# static width of the pooled repetition-penalty history (tokens); per-slot
# windows are clamped to this (engine default repetition_window is 64)
HISTORY_W = 64


@dataclasses.dataclass
class Request:
    token_ids: list[int]
    gen: GenerationConfig
    # results are streamed through this queue as (token_id, text, done, reason)
    out: "queue.Queue[tuple[int | None, str, bool, StopReason | None]]" = \
        dataclasses.field(default_factory=queue.Queue)
    id: int = 0
    submitted_at: float = dataclasses.field(default_factory=time.time)
    priority: int = 0           # lower = sooner (batch_engine.rs priorities)
    timeout_s: float | None = None        # total deadline from submission
    queue_timeout_s: float | None = None  # max wait before admission
    # per emitted token {"token_id","text","logprob","top"} when
    # gen.logprobs is set; appended before the matching out.put so a
    # consumer that just dequeued token i may read logprobs[i]
    logprobs: list[dict] | None = None
    _cancel: threading.Event = dataclasses.field(
        default_factory=threading.Event)

    def cancel(self) -> None:
        """Request the generation to stop; the slot frees within one
        decode step (reference streaming.rs:499 cancellation)."""
        self._cancel.set()

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()


@dataclasses.dataclass
class _Slot:
    active: bool = False
    req: Request | None = None
    stop: StopCriteria | None = None
    generated: int = 0
    pos: int = 0
    # every emitted token id (needed for preemption checkpoint/resume)
    out_ids: list = dataclasses.field(default_factory=list)
    key: Any = None                       # per-slot PRNG key stream
    mirostat: MirostatState | None = None
    deadline: float | None = None
    pages: list = dataclasses.field(default_factory=list)  # paged mode
    admitted_at: float = 0.0
    # chunked-prefill staging (active stays False until the last chunk)
    prefilling: bool = False
    pf_done: int = 0              # suffix tokens prefilled so far
    pf_base: int = 0              # forked-prefix length (paged mode)
    pf_carry: Any = None          # dense mode: (kc, vc, ks, vs) B=1 buffers
    # grammar-constrained decoding state (host-routed like mirostat)
    grammar: Any = None           # VocabMatcher | None
    # logprob entry of the just-sampled token, appended to req.logprobs
    # by _emit iff the token is actually emitted
    lp_pending: Any = None
    # min_new_tokens phase: EOS/stop-token logits are banned via the
    # slot bias row until `generated` reaches stop.min_new_tokens
    min_ban: bool = False
    # occupancy epoch: bumped at every activation so pipelined reads can
    # discard window tokens that belong to a previous occupant
    epoch: int = 0

    @property
    def hostside(self) -> bool:
        """Sampling needs host-side per-step state or per-step logits
        reads (forces K=1)."""
        return (self.mirostat is not None or self.grammar is not None
                or (self.req is not None
                    and self.req.gen.logprobs is not None))

    @property
    def occupied(self) -> bool:
        return self.active or self.prefilling


def _request_seed(gen: GenerationConfig) -> int:
    """Same seed rule as the engine (engine.py generate_stream)."""
    if gen.seed is not None:
        return gen.seed
    return time.time_ns() % (2 ** 31)


def _host_key(seed: int) -> np.ndarray:
    """jax.random.PRNGKey computed ON THE HOST CPU, returned as numpy.

    Slot keys used to live as TPU device arrays; fetching one back
    (np.asarray per slot per dispatch) costs a full relay round-trip —
    measured ~25 ms x B slots ≈ 400 ms/window at B=16, the round-5
    serving bottleneck.  Threefry is platform-independent, so host keys
    are bit-identical to device keys."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(jax.random.PRNGKey(seed), np.uint32)


def _host_split(key) -> tuple[np.ndarray, np.ndarray]:
    """jax.random.split on the host CPU (numpy in, numpy out)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ks = jax.random.split(jnp.asarray(np.asarray(key, np.uint32)))
    ks = np.asarray(ks, np.uint32)
    return ks[0], ks[1]


class ContinuousBatchingScheduler:
    """Owns the model + pool cache; runs the decode loop in its own thread."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: BitNetParams,
        tokenizer,
        engine_cfg: EngineConfig | None = None,
        num_slots: int = 4,
        mesh=None,
        max_admissions_per_step: int = 2,
        paged: bool = False,
        num_pages: int | None = None,
        page_size: int = 16,
        channel=None,
        start_loop: bool = True,
        decode_steps_per_dispatch: int = 1,
        chunked_prefill: int | None = None,
        speculative_k: int = 0,
        pipeline_depth: int = 1,
    ):
        """``mesh``: optional (data, model) jax Mesh — the slot pool's
        batch axis shards across ``data`` and attention heads / FFN
        columns across ``model``, so ONE scheduler drives a whole slice
        (SURVEY §2.3 "continuous batching across hosts" made real;
        GSPMD owns the collectives).

        ``paged=True`` backs the slots with the shared page pool
        (engine/paged_cache.py — ``kv_cache_optimized.rs`` parity): HBM is
        sized by ``num_pages × page_size`` total live tokens instead of
        ``B × max_seq_len``; pages are allocated at admission and at
        page-boundary crossings, shared-prefix prompts fork refcounted
        pages, finished requests release them.  When the pool runs dry at
        a decode boundary, the youngest slot is finished CONTEXT_FULL
        (documented eviction policy, mirroring the reference's cache
        eviction)."""
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.engine_cfg = engine_cfg or EngineConfig()
        self.B = num_slots
        self.S = self.engine_cfg.max_seq_len
        # multi-host control plane (serve/follower.py): the frontend
        # broadcasts every global device call; workers replay in follow()
        self._channel = channel
        if channel is not None:
            if mesh is None:
                raise InferenceError(
                    "multi-host scheduling requires a mesh spanning all "
                    "processes (parallel.multihost.host_mesh)")
            if paged:
                raise InferenceError(
                    "multi-host scheduling does not support the paged "
                    "pool yet (host-side block-table updates are global "
                    "ops that would need mirroring)")
        self.mesh = mesh
        self.max_admissions_per_step = max(1, max_admissions_per_step)
        # >1: run K decode steps per device dispatch (lax.scan) — decode
        # is otherwise one host round-trip per token.  Trade-offs: stop/
        # cancel/admission latency and overshoot are bounded by K.
        self.decode_steps_per_dispatch = max(1, decode_steps_per_dispatch)
        # >1: pipelined issue-ahead serving (round-5 measurement: the
        # per-dispatch FIXED host cost through the dev relay is ~250 ms
        # vs ~2 ms/step device compute — K-step windows alone cannot
        # amortize that without huge stop-latency K).  The decode state
        # (tokens/positions/history/keys/params) lives ON DEVICE; the
        # loop keeps up to ``pipeline_depth`` windows in flight and reads
        # the oldest, so the fixed cost overlaps device compute.  Slots
        # that stop mid-pipeline overshoot ≤ depth·K tokens (discarded
        # via occupancy epochs; the stray cache rows are unreachable
        # after the next splice).  Sampling-parameter semantics match
        # the sync path except repetition_window, which is pinned to the
        # pooled HISTORY_W (device history is never re-truncated).
        # Dense single-host pools only; hostside samplers (mirostat/
        # grammar/logprobs) and min_new_tokens phases fall back to the
        # sync step until those slots finish.
        self.pipeline_depth = max(1, int(pipeline_depth))
        if self.pipeline_depth > 1 and (paged or channel is not None
                                        or speculative_k):
            raise InferenceError(
                "pipeline_depth > 1 requires a dense single-host pool "
                "without serving-level speculation")
        # serving-level speculative decoding (engine/speculative.py's
        # n-gram draft + greedy verify, folded into the pool): k draft
        # tokens verified in ONE forward per eligible slot.  Dense
        # single-host pools only; the reference has no serving-level
        # speculation at all (speculative.rs is engine-only).
        self.speculative_k = max(0, int(speculative_k))
        self._spec_verify_jit: dict[int, Any] = {}
        if self.speculative_k:
            from ..engine.speculative import NgramDraft

            self._spec_draft = NgramDraft()
            if paged or channel is not None:
                raise InferenceError(
                    "speculative_k requires a dense single-host pool")
        # chunked prefill (vLLM-style; the reference prefills whole
        # prompts request-at-a-time, batch_engine.rs:52): prompts longer
        # than ``chunked_prefill`` are prefilled that many tokens per
        # scheduler step, interleaved with decode steps of active slots,
        # so a long admission never stalls in-flight streams for more
        # than one chunk forward.  None = whole-prompt prefill.
        self.chunked_prefill = chunked_prefill
        if chunked_prefill is not None and chunked_prefill < 8:
            raise InferenceError("chunked_prefill must be ≥ 8 tokens")
        self.paged = paged
        self.page_size = page_size
        self._kp = (
            "w2a8" if (self.engine_cfg.kernel_path == "auto"
                       and jax.default_backend() == "tpu")
            else ("xla" if self.engine_cfg.kernel_path == "auto"
                  else self.engine_cfg.kernel_path)
        )
        if self.engine_cfg.logits_dtype == "int8" and self._kp == "w2a8":
            from ..models.bitnet import quantize_head

            self.params = quantize_head(self.params)
        kv_dtype = self.engine_cfg.resolve_kv_cache_dtype()
        if paged:
            from ..engine.paged_cache import allocate_paged_cache

            if kv_dtype not in ("bf16", "f32"):
                raise InferenceError(
                    "paged scheduler: quantized KV pages not supported")
            nb = -(-self.S // page_size)
            if mesh is not None:
                from ..parallel.sharding import (
                    allocate_sharded_paged_cache,
                    shard_params,
                    validate_mesh_for,
                )

                validate_mesh_for(cfg, self.B, mesh, self.params)
                self.params = shard_params(mesh, cfg, self.params)
                self.cache, self.pool = allocate_sharded_paged_cache(
                    mesh, cfg, self.B, num_pages or self.B * nb,
                    page_size, nb, kv_dtype)
            else:
                self.cache, self.pool = allocate_paged_cache(
                    cfg, self.B, num_pages or self.B * nb, page_size, nb,
                    kv_dtype)
            self.S_view = nb * page_size
        elif mesh is not None:
            from ..parallel.sharding import (
                allocate_sharded_cache,
                shard_params,
                validate_mesh_for,
            )

            validate_mesh_for(cfg, self.B, mesh, self.params)
            self.params = shard_params(mesh, cfg, self.params)
            # allocate WITH shardings: a big pool must never land whole
            # on one device first
            self.cache = allocate_sharded_cache(
                mesh, cfg, self.B, self.S, kv_dtype)
        else:
            # layout='auto' -> flat [L,B,S,KV*D] when the pool's
            # decode plan rides the whole-batch v2 kernels (round 4:
            # B=8 2.00 vs einsum's 2.78 ms/step; int8 1.72)
            self.cache = allocate_cache(cfg, self.B, self.S, kv_dtype,
                                        layout="auto")
        self.slots = [_Slot() for _ in range(self.B)]
        self.pending: "queue.PriorityQueue[tuple[int, float, int, Request]]" \
            = queue.PriorityQueue()
        self._tokens = np.zeros(self.B, np.int32)     # next input per slot
        # per-slot logit-bias rows: device-resident [B, V] matrix,
        # allocated lazily on the first biased request (bias-free serving
        # never pays the [B, V] HBM or the per-step pass — use_bias is a
        # static flag on the decode programs); _dummy_bias keeps the jit
        # signature stable when bias is off
        self._bias_rows = None
        self._bias_live = np.zeros(self.B, bool)
        self._dummy_bias = jnp.zeros((1, 1), jnp.float32)
        self._wake = threading.Event()
        self._stopping = False
        self._req_counter = 0
        self._lock = threading.Lock()
        self.stats = {
            "requests": 0, "completed": 0, "tokens_generated": 0,
            "decode_steps": 0, "active_slots": 0, "queue_depth": 0,
            "cancelled": 0, "timeouts": 0,
        }
        # pipelined-mode runtime state (see pipeline_depth above)
        self._pl_state = None              # device 7-tuple or None
        self._pl_mirror = [False] * self.B  # device-side active view
        # occupancy epoch the device state row was admitted with: a slot
        # freed AND re-admitted between two loop iterations never shows
        # an inactive interval to the mirror diff — the epoch does
        self._pl_mirror_epoch = [-1] * self.B
        self._pl_inflight: collections.deque = collections.deque()
        self._pl_issued = np.zeros(self.B, np.int64)  # tokens in flight
        self._build_programs()
        self._thread = None
        if start_loop:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    # ------------------------------------------------------------------ jit
    def _build_programs(self) -> None:
        cfg, kp = self.cfg, self._kp

        if self._channel is not None:
            # multi-controller: host-read outputs must be fully replicated
            # or their shards are non-addressable on the frontend
            from jax.sharding import NamedSharding, PartitionSpec as P

            _rep_sh = NamedSharding(self.mesh, P())

            def rep(x):
                return jax.lax.with_sharding_constraint(x, _rep_sh)
        else:
            def rep(x):
                return x

        def pooled_sample(raw, temps, top_ks, top_ps, min_ps, typ_ps,
                          rep_pens, freq_pens, pres_pens, bias_rows,
                          history, keys, use_typical, use_bias):
            """Per-slot sampling replicating ``engine.sampling.SamplerChain``
            exactly (logit bias → repetition penalty → frequency/presence
            penalties → temperature → top-k → top-p → min-p →
            [typical-p] → per-slot categorical), with every parameter
            traced per slot and an independent PRNG stream per slot — so
            a request produces the same tokens here as via
            ``InferenceEngine.generate`` with the same seed.

            ``bias_rows`` is the device-resident per-slot [B, V] logit
            bias matrix (maintained at admit time, NOT shipped per
            dispatch); ``use_bias`` is a static flag so bias-free serving
            compiles without the [B, V] pass.  A bias value <= -100 is a
            hard ban (OpenAI contract; engine apply_logit_bias parity)."""
            B, V = raw.shape
            if use_bias:
                raw = jnp.where(bias_rows <= -100.0, NEG_INF,
                                raw + bias_rows)
            # repetition penalty over the live per-slot history
            hist = jnp.where(history < 0, V, history)
            counts = jnp.zeros((B, V + 1), raw.dtype).at[
                jnp.arange(B)[:, None], hist].add(1.0)[:, :V]
            seen = counts > 0
            pen = jnp.where(raw > 0, raw / rep_pens[:, None],
                            raw * rep_pens[:, None])
            lg = jnp.where(seen, pen, raw)
            # OpenAI-style additive penalties (engine
            # apply_presence_frequency parity; counts reused)
            lg = (lg - freq_pens[:, None] * counts
                  - pres_pens[:, None] * seen)
            greedy_tok = jnp.argmax(lg, -1).astype(jnp.int32)

            t = jnp.maximum(temps[:, None], 1e-6)
            lt = lg / t
            # ONE descending sort serves traced top-k AND top-p
            sort = jnp.sort(lt, axis=-1)[:, ::-1]
            k_eff = jnp.where((top_ks <= 0) | (top_ks >= V), V,
                              jnp.clip(top_ks, 1, V))
            kth = jnp.take_along_axis(sort, (k_eff - 1)[:, None], axis=1)
            masked_sorted = jnp.where(sort < kth, NEG_INF, sort)
            lt = jnp.where(lt < kth, NEG_INF, lt)
            # top-p on the top-k-masked distribution (engine order)
            probs = jax.nn.softmax(masked_sorted, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < top_ps[:, None]
            thr = jnp.min(jnp.where(keep, masked_sorted, jnp.inf), -1,
                          keepdims=True)
            lt = jnp.where(lt < thr, NEG_INF, lt)
            # min-p with traced per-slot threshold
            sp = jax.nn.softmax(lt, -1)
            lt = jnp.where(
                sp < min_ps[:, None] * jnp.max(sp, -1, keepdims=True),
                NEG_INF, lt)
            if use_typical:
                logp = jax.nn.log_softmax(lt, axis=-1)
                p_t = jnp.exp(logp)
                ent = -jnp.sum(p_t * logp, axis=-1, keepdims=True)
                dev = jnp.abs(-logp - ent)
                order = jnp.argsort(dev, axis=-1)
                p_sorted = jnp.take_along_axis(p_t, order, axis=-1)
                cum_t = jnp.cumsum(p_sorted, axis=-1)
                keep_s = (cum_t - p_sorted) < typ_ps[:, None]
                keep_t = jnp.zeros_like(keep_s).at[
                    jnp.arange(B)[:, None], order].set(keep_s)
                lt = jnp.where(keep_t, lt, NEG_INF)

            # per-slot key streams: key, sub = split(key) — engine order
            splits = jax.vmap(lambda kk: jax.random.split(kk, 2))(keys)
            new_keys, subs = splits[:, 0], splits[:, 1]
            sampled = jax.vmap(
                lambda kk, row: jax.random.categorical(kk, row[None, :])[0]
            )(subs, lt).astype(jnp.int32)
            nxt = jnp.where(temps <= 0.0, greedy_tok, sampled)
            return nxt, subs, new_keys

        @partial(jax.jit, donate_argnums=(3,),
                 static_argnames=("use_typical", "use_bias", "rep_logits"))
        def decode_step(params, tokens, positions, cache: KVCache,
                        active, temps, top_ks, top_ps, min_ps, typ_ps,
                        rep_pens, freq_pens, pres_pens, bias_rows,
                        history, keys, use_typical=False, use_bias=False,
                        rep_logits=False):
            """One batched decode step + per-slot sampling.

            ``rep_logits``: replicate the full-vocab raw logits and
            sub-keys across hosts (multi-host + mirostat slots only —
            an unconditional replication would all-gather [B, V] f32
            over DCN every step for nothing)."""
            pos_in = jnp.where(active, positions, self.S)
            h, k, v, ks, vs = forward(
                cfg, params, tokens[:, None], pos_in[:, None],
                cache.k, cache.v, positions,
                num_real_tokens=active.astype(jnp.int32),
                kernel_path=kp, k_scale=cache.k_scale, v_scale=cache.v_scale,
            )
            cache = dataclasses.replace(
                cache, k=k, v=v, k_scale=ks, v_scale=vs,
                lengths=cache.lengths + active.astype(jnp.int32))
            raw = model_logits(cfg, params, h, kp)[:, 0, :].astype(jnp.float32)
            nxt, subs, new_keys = pooled_sample(
                raw, temps, top_ks, top_ps, min_ps, typ_ps, rep_pens,
                freq_pens, pres_pens, bias_rows, history, keys,
                use_typical, use_bias)
            if rep_logits:
                raw, subs = rep(raw), rep(subs)
            return rep(nxt), raw, subs, rep(new_keys), cache

        self._decode_step = decode_step

        @partial(jax.jit, donate_argnums=(3,),
                 static_argnames=("use_typical", "use_bias", "n_steps"))
        def decode_multi(params, tokens, positions, cache: KVCache,
                         active, temps, top_ks, top_ps, min_ps, typ_ps,
                         rep_pens, freq_pens, pres_pens, bias_rows,
                         history, keys, use_typical=False, use_bias=False,
                         n_steps=1):
            """``n_steps`` decode steps in ONE dispatch (lax.scan).

            Every decoded token otherwise costs a host→device round trip
            (measured end-to-end through the dev relay: ~0.4 s/step vs
            the 4 ms device step; ~1 ms even colocated).  Sampling
            threads the per-slot key streams and appends each token to
            the repetition history IN-SCAN, so tokens are identical to
            ``n_steps`` single dispatches.  The host discards tokens a
            slot generated past its stop point (bounded overshoot —
            freed slots are re-prefilled by splice, so the stray cache
            rows are unreachable).  Mirostat slots force n_steps=1
            (host-side stateful sampling)."""
            def one(carry, _):
                tokens, positions, cache, history, keys = carry
                pos_in = jnp.where(active, positions, self.S)
                h, k, v, ks, vs = forward(
                    cfg, params, tokens[:, None], pos_in[:, None],
                    cache.k, cache.v, positions,
                    num_real_tokens=active.astype(jnp.int32),
                    kernel_path=kp, k_scale=cache.k_scale,
                    v_scale=cache.v_scale,
                )
                cache = dataclasses.replace(
                    cache, k=k, v=v, k_scale=ks, v_scale=vs,
                    lengths=cache.lengths + active.astype(jnp.int32))
                raw = model_logits(cfg, params, h, kp)[:, 0, :].astype(
                    jnp.float32)
                nxt, _, new_keys = pooled_sample(
                    raw, temps, top_ks, top_ps, min_ps, typ_ps, rep_pens,
                    freq_pens, pres_pens, bias_rows, history, keys,
                    use_typical, use_bias)
                history = jnp.where(
                    active[:, None],
                    jnp.concatenate([history[:, 1:], nxt[:, None]], axis=1),
                    history)
                positions = positions + active.astype(positions.dtype)
                tokens = jnp.where(active, nxt, tokens)
                return (tokens, positions, cache, history, new_keys), nxt

            (tokens, positions, cache, history, keys), nxt_seq = \
                jax.lax.scan(
                    one, (tokens, positions, cache, history, keys),
                    None, length=n_steps)
            # ONE packed [n_steps+2, B] int32 output: tokens then the
            # bitcast key rows — each extra device→host read through the
            # relay costs a full round-trip (round-5 probe: 49.5 ms for
            # two reads vs 25.8 for one packed)
            keys_i32 = jax.lax.bitcast_convert_type(keys, jnp.int32).T
            return rep(jnp.concatenate([nxt_seq, keys_i32], axis=0)), cache

        self._decode_multi = decode_multi

        if self.pipeline_depth > 1:
            # ---------------------------------------------- pipelined mode
            # Decode state lives ON DEVICE as a 7-tuple
            #   (tokens[B]i32, positions[B]i32, history[B,W]i32,
            #    keys[B,2]u32, active[B]bool, fpar[B,7]f32, ipar[B,1]i32)
            # chained window→window without host round-trips; the host
            # touches it only at slot lifecycle events.
            @partial(jax.jit, donate_argnums=(1, 2),
                     static_argnames=("use_typical", "use_bias",
                                      "n_steps"))
            def decode_window(params, state, cache: KVCache, bias_rows,
                              use_typical=False, use_bias=False,
                              n_steps=1):
                (tokens, positions, history, keys, active, fpar,
                 ipar) = state
                temps, top_ps, min_ps, typ_ps, reps, freqs, press = (
                    fpar[:, 0], fpar[:, 1], fpar[:, 2], fpar[:, 3],
                    fpar[:, 4], fpar[:, 5], fpar[:, 6])
                top_ks = ipar[:, 0]

                def one(carry, _):
                    tokens, positions, cache, history, keys = carry
                    pos_in = jnp.where(active, positions, self.S)
                    h, k, v, ks, vs = forward(
                        cfg, params, tokens[:, None], pos_in[:, None],
                        cache.k, cache.v, positions,
                        num_real_tokens=active.astype(jnp.int32),
                        kernel_path=kp, k_scale=cache.k_scale,
                        v_scale=cache.v_scale,
                    )
                    cache = dataclasses.replace(
                        cache, k=k, v=v, k_scale=ks, v_scale=vs,
                        lengths=cache.lengths + active.astype(jnp.int32))
                    raw = model_logits(cfg, params, h, kp)[:, 0, :].astype(
                        jnp.float32)
                    nxt, _, new_keys = pooled_sample(
                        raw, temps, top_ks, top_ps, min_ps, typ_ps, reps,
                        freqs, press, bias_rows, history, keys,
                        use_typical, use_bias)
                    history = jnp.where(
                        active[:, None],
                        jnp.concatenate([history[:, 1:], nxt[:, None]],
                                        axis=1),
                        history)
                    positions = positions + active.astype(positions.dtype)
                    tokens = jnp.where(active, nxt, tokens)
                    return (tokens, positions, cache, history,
                            new_keys), nxt

                (tokens, positions, cache, history, keys), nxt_seq = \
                    jax.lax.scan(
                        one, (tokens, positions, cache, history, keys),
                        None, length=n_steps)
                new_state = (tokens, positions, history, keys, active,
                             fpar, ipar)
                return nxt_seq, new_state, cache

            self._decode_window = decode_window

            @partial(jax.jit, donate_argnums=(0,))
            def state_admit(state, i, token, pos, hist_row, key,
                            fpar_row, top_k):
                (tokens, positions, history, keys, active, fpar,
                 ipar) = state
                return (tokens.at[i].set(token),
                        positions.at[i].set(pos),
                        history.at[i].set(hist_row),
                        keys.at[i].set(key),
                        active.at[i].set(True),
                        fpar.at[i].set(fpar_row),
                        ipar.at[i, 0].set(top_k))

            self._state_admit = state_admit

            @partial(jax.jit, donate_argnums=(0,))
            def state_finish(state, i):
                (tokens, positions, history, keys, active, fpar,
                 ipar) = state
                return (tokens, positions, history, keys,
                        active.at[i].set(False), fpar, ipar)

            self._state_finish = state_finish

        if self.paged:
            from ..engine.paged_cache import PagedKVCache, paged_forward

            S_view, page = self.S_view, self.page_size

            @partial(jax.jit, donate_argnums=(3,),
                     static_argnames=("use_typical", "use_bias",
                                      "rep_logits"))
            def decode_step_paged(params, tokens, positions, cache,
                                  active, temps, top_ks, top_ps, min_ps,
                                  typ_ps, rep_pens, freq_pens, pres_pens,
                                  bias_rows, history, keys,
                                  use_typical=False, use_bias=False,
                                  rep_logits=False):
                pos_in = jnp.where(active, positions, S_view)
                h, cache = paged_forward(
                    cfg, params, tokens[:, None], pos_in[:, None], cache,
                    num_real_tokens=active.astype(jnp.int32),
                    kernel_path=kp, pad_marker=S_view)
                raw = model_logits(cfg, params, h, kp)[:, 0, :].astype(
                    jnp.float32)
                nxt, subs, new_keys = pooled_sample(
                    raw, temps, top_ks, top_ps, min_ps, typ_ps, rep_pens,
                    freq_pens, pres_pens, bias_rows, history, keys,
                    use_typical, use_bias)
                return nxt, raw, subs, new_keys, cache

            self._decode_step_paged = decode_step_paged

            @partial(jax.jit, donate_argnums=(3,),
                     static_argnames=("use_typical", "use_bias", "n_steps"))
            def decode_multi_paged(params, tokens, positions, cache,
                                   active, temps, top_ks, top_ps, min_ps,
                                   typ_ps, rep_pens, freq_pens, pres_pens,
                                   bias_rows, history, keys,
                                   use_typical=False, use_bias=False,
                                   n_steps=1):
                """``n_steps`` paged decode steps in ONE dispatch — the
                paged twin of ``decode_multi``.  The host pre-allocates
                the window's page-boundary pages (``_paged_grow(steps)``)
                so every in-scan write lands in mapped pages; stopped
                slots overshoot into pages they still hold (released
                wholesale at finish, same semantics as the dense path)."""
                def one(carry, _):
                    tokens, positions, cache, history, keys = carry
                    pos_in = jnp.where(active, positions, S_view)
                    h, cache = paged_forward(
                        cfg, params, tokens[:, None], pos_in[:, None],
                        cache, num_real_tokens=active.astype(jnp.int32),
                        kernel_path=kp, pad_marker=S_view)
                    raw = model_logits(cfg, params, h, kp)[:, 0, :].astype(
                        jnp.float32)
                    nxt, _, new_keys = pooled_sample(
                        raw, temps, top_ks, top_ps, min_ps, typ_ps,
                        rep_pens, freq_pens, pres_pens, bias_rows,
                        history, keys, use_typical, use_bias)
                    history = jnp.where(
                        active[:, None],
                        jnp.concatenate([history[:, 1:], nxt[:, None]],
                                        axis=1),
                        history)
                    positions = positions + active.astype(positions.dtype)
                    tokens = jnp.where(active, nxt, tokens)
                    return (tokens, positions, cache, history, new_keys), nxt

                (tokens, positions, cache, history, keys), nxt_seq = \
                    jax.lax.scan(
                        one, (tokens, positions, cache, history, keys),
                        None, length=n_steps)
                keys_i32 = jax.lax.bitcast_convert_type(
                    keys, jnp.int32).T
                return jnp.concatenate([nxt_seq, keys_i32], axis=0), cache

            self._decode_multi_paged = decode_multi_paged

            def make_prefill_paged(T: int):
                @partial(jax.jit, donate_argnums=(1, 2))
                def prefill(params, pool_k, pool_v, table_row, tokens,
                            positions, prefix_len, n_real, last_idx):
                    """B=1 prefill straight into the slot's pages: a
                    one-row PagedKVCache VIEW shares the pool arrays, so
                    paged_forward's scatter lands in the pool — no dense
                    splice, and forked prefix pages are attended to via
                    ``prefix_len``."""
                    sub = PagedKVCache(
                        k=pool_k, v=pool_v, tables=table_row[None],
                        lengths=prefix_len[None], page_size=page)
                    h, sub = paged_forward(
                        cfg, params, tokens, positions, sub, n_real, kp,
                        pad_marker=S_view)
                    h_last = h[jnp.arange(1), last_idx][:, None, :]
                    lg = model_logits(cfg, params, h_last, kp)[:, 0, :]
                    return lg, sub.k, sub.v
                return prefill

            self._make_prefill_paged = make_prefill_paged
            self._prefill_paged_cache: dict[int, Callable] = {}

            @partial(jax.jit, donate_argnums=(0, 1))
            def splice_paged(pool_k, pool_v, table_row, k_rows, v_rows,
                             length):
                """Scatter restored KV rows [L, S_view, KV, D] into the
                slot's pages (rows ≥ length drop via OOB page id)."""
                local = jnp.arange(S_view, dtype=jnp.int32)
                gpage = jnp.take(table_row, local // page)
                gpage = jnp.where((local < length) & (gpage >= 0), gpage,
                                  pool_k.shape[1])
                goff = local % page
                l_idx = jnp.arange(pool_k.shape[0])[:, None]
                k = pool_k.at[l_idx, gpage[None], goff[None]].set(
                    k_rows.astype(pool_k.dtype), mode="drop")
                v = pool_v.at[l_idx, gpage[None], goff[None]].set(
                    v_rows.astype(pool_v.dtype), mode="drop")
                return k, v

            self._splice_paged = splice_paged

        def make_prefill(T: int):
            @jax.jit
            def prefill(params, tokens, positions, n_real, last_idx):
                B1, S = 1, self.S
                # staging cache matches the POOL layout so splice is a
                # straight dynamic_update_slice either way
                kc = jnp.zeros(staging_shape(cfg, S, self.cache),
                               self.cache.k.dtype)
                vc = jnp.zeros_like(kc)
                ks = vs = None
                if self.cache.k_scale is not None:
                    ks = jnp.ones((cfg.num_layers, B1, S, cfg.num_kv_heads),
                                  jnp.float32)
                    vs = jnp.ones_like(ks)
                h, kc, vc, ks, vs = forward(
                    cfg, params, tokens, positions, kc, vc,
                    jnp.zeros((B1,), jnp.int32), n_real, kp, ks, vs)
                h_last = h[jnp.arange(B1), last_idx][:, None, :]
                lg = model_logits(cfg, params, h_last, kp)[:, 0, :]
                return rep(lg), kc, vc, ks, vs
            return prefill

        self._prefill_cache: dict[int, Callable] = {}
        self._make_prefill = make_prefill

        def make_prefill_chunk(T: int):
            """Continuation chunk: same contract as ``make_prefill`` but
            the B=1 staging cache is a donated carry and attention sees
            the ``pre_len`` tokens already written by earlier chunks."""
            @partial(jax.jit, donate_argnums=(1, 2))
            def chunk(params, kc, vc, ks, vs, tokens, positions,
                      pre_len, n_real, last_idx):
                h, kc, vc, ks, vs = forward(
                    cfg, params, tokens, positions, kc, vc,
                    pre_len, n_real, kp, ks, vs)
                h_last = h[jnp.arange(1), last_idx][:, None, :]
                lg = model_logits(cfg, params, h_last, kp)[:, 0, :]
                return rep(lg), kc, vc, ks, vs
            return chunk

        self._prefill_chunk_cache: dict[int, Callable] = {}
        self._make_prefill_chunk = make_prefill_chunk

        @partial(jax.jit, donate_argnums=(0,))
        def splice(cache: KVCache, kc, vc, ks, vs, slot, length):
            """Insert a prefilled B=1 sequence into pool slot ``slot``
            (kc/vc arrive in the pool's layout, 5D or flat)."""
            at = splice_origin(cache, slot)
            k = jax.lax.dynamic_update_slice(
                cache.k, kc.astype(cache.k.dtype), at)
            v = jax.lax.dynamic_update_slice(
                cache.v, vc.astype(cache.v.dtype), at)
            new = dataclasses.replace(
                cache, k=k, v=v,
                lengths=jax.lax.dynamic_update_slice(
                    cache.lengths, length[None], (slot,)))
            if cache.k_scale is not None:
                new = dataclasses.replace(
                    new,
                    k_scale=jax.lax.dynamic_update_slice(
                        cache.k_scale, ks, (0, slot, 0, 0)),
                    v_scale=jax.lax.dynamic_update_slice(
                        cache.v_scale, vs, (0, slot, 0, 0)),
                )
            return new

        self._splice = splice

    # ------------------------------------------------------------- public
    def submit(self, token_ids: list[int],
               gen: GenerationConfig | None = None,
               priority: int = 0,
               timeout_s: float | None = None,
               queue_timeout_s: float | None = None) -> Request:
        gen = gen or GenerationConfig()
        with self._lock:
            self._req_counter += 1
            rid = self._req_counter
        req = Request(token_ids=list(token_ids), gen=gen, id=rid,
                      priority=priority, timeout_s=timeout_s,
                      queue_timeout_s=queue_timeout_s,
                      logprobs=[] if gen.logprobs is not None else None)
        self.pending.put((priority, req.submitted_at, rid, req))
        self.stats["requests"] += 1
        self._wake.set()
        return req

    def stream(self, req: Request, timeout: float = 300.0
               ) -> Iterator[tuple[int, str]]:
        """Yield (token_id, text) until the request finishes."""
        while True:
            tok, text, done, reason = req.out.get(timeout=timeout)
            if tok is not None:
                yield tok, text
            if done:
                return

    def shutdown(self) -> None:
        self._stopping = True
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def pause(self, timeout: float = 30.0) -> None:
        """Quiesce the decode loop at the next step boundary (for live
        checkpointing); :meth:`unpause` resumes it.  No-op without a
        running loop thread."""
        self._pause_req = True
        self._wake.set()
        if self._thread is None or not self._thread.is_alive():
            return
        deadline = time.time() + timeout
        while not getattr(self, "_paused_at_barrier", False):
            if time.time() > deadline:
                # roll back the request: a failed pause must not leave
                # the loop quiescing forever (serving would wedge)
                self._pause_req = False
                self._wake.set()
                raise InferenceError("scheduler pause timed out")
            time.sleep(0.005)

    def unpause(self) -> None:
        self._pause_req = False
        self._wake.set()

    # ----------------------------------------------------- multi-host
    def follow(self) -> None:
        """Worker follower loop (serve/follower.py): replay the frontend's
        control stream so every process executes the same global device
        programs in the same order.  Blocks until a ``stop`` record."""
        ch = self._channel
        if ch is None or ch.primary:
            raise InferenceError(
                "follow() runs on non-primary processes with a channel")
        last_prefill = None
        pf_carries: dict[int, tuple] = {}   # chunked-prefill staging
        while True:
            rec = ch.recv()
            op = rec[0]
            if op == "stop":
                return
            if op == "noop":
                continue
            if op == "prefill":
                _, Tp, toks, pos, T = rec
                if Tp not in self._prefill_cache:
                    self._prefill_cache[Tp] = self._make_prefill(Tp)
                last_prefill = self._prefill_cache[Tp](
                    self.params, jnp.asarray(toks), jnp.asarray(pos),
                    jnp.asarray([T], jnp.int32),
                    jnp.asarray([T - 1], jnp.int32))
            elif op == "pfc0":
                # chunk 0 of a staged prefill (slot-keyed carry)
                _, slot_idx, Tp, toks, pos, Tc = rec
                if Tp not in self._prefill_cache:
                    self._prefill_cache[Tp] = self._make_prefill(Tp)
                out = self._prefill_cache[Tp](
                    self.params, jnp.asarray(toks), jnp.asarray(pos),
                    jnp.asarray([Tc], jnp.int32),
                    jnp.asarray([Tc - 1], jnp.int32))
                pf_carries[slot_idx] = out[1:]
            elif op == "pfc":
                _, slot_idx, Tp, toks, pos, pre, Tc = rec
                if Tp not in self._prefill_chunk_cache:
                    self._prefill_chunk_cache[Tp] = \
                        self._make_prefill_chunk(Tp)
                kc, vc, ks, vs = pf_carries[slot_idx]
                out = self._prefill_chunk_cache[Tp](
                    self.params, kc, vc, ks, vs,
                    jnp.asarray(toks), jnp.asarray(pos),
                    jnp.asarray([pre], jnp.int32),
                    jnp.asarray([Tc], jnp.int32),
                    jnp.asarray([Tc - 1], jnp.int32))
                pf_carries[slot_idx] = out[1:]
            elif op == "splice":
                _, slot_idx, T = rec
                if slot_idx in pf_carries:
                    kc, vc, ks, vs = pf_carries.pop(slot_idx)
                else:
                    lg, kc, vc, ks, vs = last_prefill
                    last_prefill = None
                self.cache = self._splice(
                    self.cache, kc, vc, ks, vs,
                    slot_idx, jnp.asarray(T, jnp.int32))
            elif op == "bias":
                # mirror the frontend's admit-time bias row (never sent
                # per dispatch — each process keeps its own [B, V] matrix)
                _, slot_idx, bias = rec
                self._set_slot_bias(slot_idx, bias)
            elif op == "decode_multi":
                (_, tokens, positions, active, temps, top_ks, top_ps,
                 min_ps, typ_ps, reps, freqs, press, hist, keys,
                 use_typical, use_bias, n_steps) = rec
                bias_rows = (self._bias_rows if use_bias
                             else self._dummy_bias)
                out = self._decode_multi(
                    self.params, jnp.asarray(tokens),
                    jnp.asarray(positions), self.cache,
                    jnp.asarray(active), jnp.asarray(temps),
                    jnp.asarray(top_ks), jnp.asarray(top_ps),
                    jnp.asarray(min_ps), jnp.asarray(typ_ps),
                    jnp.asarray(reps), jnp.asarray(freqs),
                    jnp.asarray(press), bias_rows, jnp.asarray(hist),
                    jnp.asarray(keys), use_typical=use_typical,
                    use_bias=use_bias, n_steps=n_steps)
                self.cache = out[2]
            elif op == "decode":
                (_, tokens, positions, active, temps, top_ks, top_ps,
                 min_ps, typ_ps, reps, freqs, press, hist, keys,
                 use_typical, use_bias, rep_logits) = rec
                bias_rows = (self._bias_rows if use_bias
                             else self._dummy_bias)
                out = self._decode_step(
                    self.params, jnp.asarray(tokens),
                    jnp.asarray(positions), self.cache,
                    jnp.asarray(active), jnp.asarray(temps),
                    jnp.asarray(top_ks), jnp.asarray(top_ps),
                    jnp.asarray(min_ps), jnp.asarray(typ_ps),
                    jnp.asarray(reps), jnp.asarray(freqs),
                    jnp.asarray(press), bias_rows, jnp.asarray(hist),
                    jnp.asarray(keys), use_typical=use_typical,
                    use_bias=use_bias, rep_logits=rep_logits)
                self.cache = out[4]
            else:  # pragma: no cover - protocol guard
                raise InferenceError(f"unknown control record {op!r}")

    # ------------------------------------------------- preemption recovery
    def checkpoint_requests(self, directory: str) -> list[str]:
        """Snapshot every in-flight request's decode state to disk
        (SURVEY.md §5: decode-loop checkpoint + restart on preemption).

        Call after :meth:`shutdown` (or while the loop is paused) — the
        loop must not be mutating the cache concurrently.  Returns the
        manifest paths written.
        """
        import json as _json
        import os as _os

        from ..engine import checkpoint as ckpt

        if self._channel is not None:
            raise InferenceError(
                "checkpoint/resume is frontend-local and not mirrored to "
                "followers; drain requests before stopping a multi-host "
                "serve instead")
        _os.makedirs(directory, exist_ok=True)
        written = []
        for i, slot in enumerate(self.slots):
            if not slot.active or slot.req is None:
                continue
            kv_len = slot.pos
            if self.paged:
                # gather the slot's pages into contiguous rows
                nb = -(-kv_len // self.page_size)
                pages = slot.pages[:nb]
                kr = np.asarray(self.cache.k[:, pages]).reshape(
                    self.cfg.num_layers, -1,
                    self.cfg.num_kv_heads, self.cfg.head_dim)[:, :kv_len]
                vr = np.asarray(self.cache.v[:, pages]).reshape(
                    self.cfg.num_layers, -1,
                    self.cfg.num_kv_heads, self.cfg.head_dim)[:, :kv_len]
                ks = vs = None
            else:
                # snapshots stay canonical [L, T, KV, D] whatever the
                # pool layout (engine/cache.py layout seam)
                kr = canonical_rows(np.asarray(self.cache.k[:, i, :kv_len]),
                                    self.cfg, self.cache)
                vr = canonical_rows(np.asarray(self.cache.v[:, i, :kv_len]),
                                    self.cfg, self.cache)
                ks = (np.asarray(self.cache.k_scale[:, i, :kv_len])
                      if self.cache.k_scale is not None else None)
                vs = (np.asarray(self.cache.v_scale[:, i, :kv_len])
                      if self.cache.v_scale is not None else None)
            state = ckpt.DecodeState(
                prompt_ids=list(slot.req.token_ids),
                generated_ids=list(slot.out_ids),
                rng_key=None,
                kv_len=kv_len,
                k=kr,
                v=vr,
                k_scale=ks,
                v_scale=vs,
            )
            path = _os.path.join(directory, f"slot{i}_req{slot.req.id}")
            ckpt.save(state, path)
            g = slot.req.gen
            with open(path + ".req.json", "w") as f:
                _json.dump({
                    "request_id": slot.req.id,
                    "generated": slot.generated,
                    "gen": {
                        "max_new_tokens": g.max_new_tokens,
                        "temperature": g.temperature,
                        "top_k": g.top_k, "top_p": g.top_p,
                        "min_p": g.min_p,
                        "repetition_penalty": g.repetition_penalty,
                        "seed": g.seed, "greedy": g.greedy,
                        "stop_token_ids": list(g.stop_token_ids),
                        "grammar": g.grammar,
                        "logprobs": g.logprobs,
                        "min_new_tokens": g.min_new_tokens,
                    },
                }, f)
            written.append(path)
        # requests with no decoded tokens yet (mid-chunked-prefill or
        # still queued) restart from scratch on resume: persist prompt +
        # sampling config only (no KV snapshot exists for them)
        queued: list[Request] = []
        for slot in self.slots:
            if slot.prefilling and slot.req is not None:
                queued.append(slot.req)
        drained = []
        while True:
            try:
                drained.append(self.pending.get_nowait())
            except queue.Empty:
                break
        for item in drained:
            self.pending.put(item)
            queued.append(item[3])
        for req in queued:
            g = req.gen
            path = _os.path.join(directory,
                                 f"queued_req{req.id}.pending.json")
            with open(path, "w") as f:
                _json.dump({
                    "request_id": req.id,
                    "token_ids": list(req.token_ids),
                    "priority": req.priority,
                    "gen": {
                        "max_new_tokens": g.max_new_tokens,
                        "temperature": g.temperature,
                        "top_k": g.top_k, "top_p": g.top_p,
                        "min_p": g.min_p,
                        "repetition_penalty": g.repetition_penalty,
                        "seed": g.seed, "greedy": g.greedy,
                        "stop_token_ids": list(g.stop_token_ids),
                        "grammar": g.grammar,
                        "logprobs": g.logprobs,
                        "min_new_tokens": g.min_new_tokens,
                    },
                }, f)
            written.append(path)
        return written

    def resume_requests(self, directory: str) -> list[Request]:
        """Restore checkpointed requests into free slots; generation
        continues exactly where it stopped (the pending token that was
        emitted but not yet decoded resumes as the next decode input)."""
        import glob as _glob
        import json as _json

        from ..engine import checkpoint as ckpt

        if self._channel is not None:
            raise InferenceError(
                "checkpoint/resume is frontend-local and not mirrored to "
                "followers; resume before entering multi-host mode")
        restored = []
        for meta_path in sorted(_glob.glob(f"{directory}/*.req.json")):
            base = meta_path[: -len(".req.json")]
            with open(meta_path) as f:
                meta = _json.load(f)
            state = ckpt.load(base)
            slot_idx = next(
                (i for i, s in enumerate(self.slots) if not s.occupied),
                None)
            if slot_idx is None:
                raise InferenceError(
                    "no free slot to resume a checkpointed request")
            g = meta["gen"]
            remaining = int(g["max_new_tokens"]) - int(meta["generated"])
            if remaining <= 0 or not state.generated_ids:
                continue
            gen = GenerationConfig(
                max_new_tokens=remaining,
                temperature=g["temperature"], top_k=g["top_k"],
                top_p=g["top_p"], min_p=g["min_p"],
                repetition_penalty=g["repetition_penalty"],
                seed=g["seed"], greedy=g["greedy"],
                stop_token_ids=tuple(g.get("stop_token_ids", ())),
                grammar=g.get("grammar"),
                logprobs=g.get("logprobs"),
                min_new_tokens=int(g.get("min_new_tokens", 0)),
            )
            req = Request(token_ids=state.prompt_ids, gen=gen,
                          id=meta["request_id"],
                          logprobs=([] if gen.logprobs is not None
                                    else None))

            # write the snapshot into the pool slot
            L, KV, D = (self.cfg.num_layers, self.cfg.num_kv_heads,
                        self.cfg.head_dim)
            kd = np.dtype(self.cache.k.dtype)
            if self.paged:
                from ..engine.paged_cache import pages_needed

                pages = self.pool.alloc(
                    pages_needed(state.kv_len, self.page_size))
                self.slots[slot_idx].pages = pages
                self.cache = dataclasses.replace(
                    self.cache,
                    tables=self.cache.tables.at[
                        slot_idx, : len(pages)].set(
                        jnp.asarray(pages, jnp.int32)))
                kc = np.zeros((L, self.S_view, KV, D), kd)
                vc = np.zeros_like(kc)
                kc[:, : state.kv_len] = state.k
                vc[:, : state.kv_len] = state.v
                new_k, new_v = self._splice_paged(
                    self.cache.k, self.cache.v,
                    self.cache.tables[slot_idx],
                    jnp.asarray(kc), jnp.asarray(vc),
                    jnp.asarray(state.kv_len, jnp.int32))
                self.cache = dataclasses.replace(
                    self.cache, k=new_k, v=new_v,
                    lengths=self.cache.lengths.at[slot_idx].set(
                        state.kv_len))
            else:
                kc = np.zeros(staging_shape(self.cfg, self.S, self.cache),
                              kd)
                vc = np.zeros_like(kc)
                kc[:, 0, : state.kv_len] = pool_rows(state.k, self.cache)
                vc[:, 0, : state.kv_len] = pool_rows(state.v, self.cache)
                ks = vs = None
                if self.cache.k_scale is not None:
                    ks = np.ones((L, 1, self.S, KV), np.float32)
                    vs = np.ones_like(ks)
                    ks[:, 0, : state.kv_len] = state.k_scale
                    vs[:, 0, : state.kv_len] = state.v_scale
                self.cache = self._splice(
                    self.cache, jnp.asarray(kc), jnp.asarray(vc),
                    None if ks is None else jnp.asarray(ks),
                    None if vs is None else jnp.asarray(vs),
                    jnp.asarray(slot_idx, jnp.int32),
                    jnp.asarray(state.kv_len, jnp.int32))

            slot = self.slots[slot_idx]
            eos = getattr(self.tokenizer, "eos_token_id", None)
            slot.req = req
            slot.stop = StopCriteria(
                max_new_tokens=remaining,
                eos_token_id=eos,
                stop_token_ids=frozenset(gen.stop_token_ids),
                stop_sequences=tuple(gen.stop_sequences),
                min_new_tokens=max(0, gen.min_new_tokens
                                   - len(state.generated_ids)),
            )
            slot.generated = 0
            slot.pos = state.kv_len
            slot.out_ids = list(state.generated_ids)
            slot.key = _host_key(_request_seed(gen))
            slot.mirostat = (MirostatState.from_config(gen)
                             if gen.mirostat else None)
            slot.grammar = self._grammar_matcher(gen)
            if slot.grammar is not None:
                # replay the emitted text through the matcher so the
                # pushdown state matches the generation point
                for t in state.generated_ids:
                    slot.grammar.accept(int(t))
            slot.deadline = None
            slot.admitted_at = time.time()
            slot.active = True
            slot.epoch += 1
            # the interrupted pending token becomes the next decode input
            self._tokens[slot_idx] = state.generated_ids[-1]
            restored.append(req)
            self.stats["requests"] += 1
        # prompts that never produced a token (queued / mid-prefill at
        # checkpoint time) simply re-enter the queue
        for meta_path in sorted(_glob.glob(f"{directory}/*.pending.json")):
            with open(meta_path) as f:
                meta = _json.load(f)
            g = meta["gen"]
            gen = GenerationConfig(
                max_new_tokens=int(g["max_new_tokens"]),
                temperature=g["temperature"], top_k=g["top_k"],
                top_p=g["top_p"], min_p=g["min_p"],
                repetition_penalty=g["repetition_penalty"],
                seed=g["seed"], greedy=g["greedy"],
                stop_token_ids=tuple(g.get("stop_token_ids", ())),
                grammar=g.get("grammar"),
                logprobs=g.get("logprobs"),
                min_new_tokens=int(g.get("min_new_tokens", 0)),
            )
            restored.append(self.submit(
                meta["token_ids"], gen,
                priority=int(meta.get("priority", 0))))
        self._wake.set()
        return restored

    # -------------------------------------------------------------- loop
    def _bucket(self, T: int) -> int:
        b = 8
        while b < T:
            b *= 2
        return min(b, self.S)

    # ------------------------------------------------- speculative decode
    def _get_spec_verify(self, Tk: int):
        """Jitted verify forward: run Tk tokens for EVERY spec-eligible
        slot in ONE dispatch (non-spec slots masked via n_real=0 / pad
        positions) and return the per-position greedy argmax [B, Tk]
        (tiny host transfer — greedy acceptance never needs the full
        logits).  Draft rows land in the cache; rows past the accepted
        prefix are overwritten by later decode steps and never attended
        (explicit kv_valid positions)."""
        if Tk in self._spec_verify_jit:
            return self._spec_verify_jit[Tk]
        cfg, kp, S = self.cfg, self._kp, self.S

        @partial(jax.jit, donate_argnums=(2,))
        def spec_verify(params, toks, cache: KVCache, base, spec_mask):
            # toks [B, Tk]; base [B] start positions; spec_mask [B] bool
            pos_rows = base[:, None] + jnp.arange(Tk, dtype=jnp.int32)
            pos = jnp.where(spec_mask[:, None], pos_rows, S)
            n_real = jnp.where(spec_mask, Tk, 0).astype(jnp.int32)
            h, k, v, ks, vs = forward(
                cfg, params, toks, pos, cache.k, cache.v,
                jnp.where(spec_mask, base, 0).astype(jnp.int32),
                num_real_tokens=n_real, kernel_path=kp,
                k_scale=cache.k_scale, v_scale=cache.v_scale,
            )
            cache = dataclasses.replace(cache, k=k, v=v, k_scale=ks,
                                        v_scale=vs)
            lg = model_logits(cfg, params, h, kp)          # [B, Tk, V]
            return jnp.argmax(lg, axis=-1).astype(jnp.int32), cache

        self._spec_verify_jit[Tk] = spec_verify
        return spec_verify

    def _spec_eligible(self, slot: _Slot) -> bool:
        g = slot.req.gen
        return (g.is_greedy and not slot.hostside and not slot.min_ban
                and g.repetition_penalty == 1.0
                and g.frequency_penalty == 0.0
                and g.presence_penalty == 0.0
                and not g.logit_bias
                and slot.pos + self.speculative_k + 1 < self.S)

    def _run_spec_slots(self, active_idx: list[int]) -> list[int]:
        """Drive every eligible slot one draft+verify round in a single
        dispatch; returns the indices the normal dispatch must handle."""
        k = self.speculative_k
        Tk = k + 1
        spec_idx = [i for i in active_idx
                    if self._spec_eligible(self.slots[i])]
        rest = [i for i in active_idx if i not in spec_idx]
        if not spec_idx:
            return rest
        verify = self._get_spec_verify(Tk)
        toks = np.zeros((self.B, Tk), np.int32)
        base = np.zeros(self.B, np.int32)
        mask = np.zeros(self.B, bool)
        drafts: dict[int, list[int]] = {}
        for i in spec_idx:
            s = self.slots[i]
            draft = self._spec_draft.propose(
                s.req.token_ids + s.out_ids, k)
            drafts[i] = draft
            toks[i] = [int(self._tokens[i])] + list(draft)
            base[i] = s.pos
            mask[i] = True
        want, self.cache = verify(self.params, jnp.asarray(toks),
                                  self.cache, jnp.asarray(base),
                                  jnp.asarray(mask))
        want = np.asarray(want)                        # [B, Tk]
        self.stats["decode_steps"] += 1
        self.stats["spec_drafted"] = (
            self.stats.get("spec_drafted", 0) + k * len(spec_idx))
        new_lengths = None
        for i in spec_idx:
            s = self.slots[i]
            draft = drafts[i]
            emitted = 0
            for j in range(k):
                if int(want[i, j]) != draft[j]:
                    break
                s.pos += 1
                emitted += 1
                self._emit(i, draft[j])
                if not s.active:
                    break
            else:
                j = k
            self.stats["spec_accepted"] = (
                self.stats.get("spec_accepted", 0) + min(emitted, k))
            if s.active and emitted == j:
                # correction (on mismatch) or bonus (all k accepted)
                s.pos += 1
                self._emit(i, int(want[i, j]))
            if s.active:
                # hygiene: keep the pool's length bookkeeping exact
                new_lengths = (self.cache.lengths if new_lengths is None
                               else new_lengths).at[i].set(s.pos)
        if new_lengths is not None:
            self.cache = dataclasses.replace(self.cache,
                                             lengths=new_lengths)
        return rest

    def _maybe_preempt(self) -> None:
        """Priority preemption (recompute mode, the vLLM default): when
        a strictly higher-priority request waits and no slot is free,
        evict the lowest-priority ACTIVE slot.  Its generated tokens
        fold into the prompt and its sampler/grammar/stop state is
        stashed on the Request, so re-admission re-prefills once and
        continues the exact token stream (client streaming is seamless —
        already-delivered tokens are never re-emitted).  At most one
        eviction per step; requests keep their original priority, so a
        preempted request can never thrash a same-priority slot."""
        if self.pending.empty():
            return
        with self.pending.mutex:
            if not self.pending.queue:
                return
            best_prio = self.pending.queue[0][0]
        if any(not s.occupied for s in self.slots):
            return                      # normal admission will handle it
        worst_i, worst_p = None, best_prio
        for i, s in enumerate(self.slots):
            if s.active and not s.prefilling and s.req is not None \
                    and s.req.priority > worst_p:
                worst_p, worst_i = s.req.priority, i
        if worst_i is None:
            return
        slot = self.slots[worst_i]
        req = slot.req
        req.token_ids = list(req.token_ids) + list(slot.out_ids)
        req._preempt = {
            "key": slot.key, "mirostat": slot.mirostat,
            "grammar": slot.grammar, "stop": slot.stop,
            "generated": slot.generated,
        }
        # free the slot WITHOUT finishing the request
        slot.active = False
        slot.req = None
        slot.grammar = None
        slot.lp_pending = None
        slot.min_ban = False
        self._release_slot_pages(worst_i)
        self.pending.put((req.priority, req.submitted_at, req.id, req))
        self.stats["preempted"] = self.stats.get("preempted", 0) + 1
        self.stats["active_slots"] = sum(
            1 for s in self.slots if s.active)

    def _admit(self) -> None:
        """Admit pending requests into free slots.

        Pipelined mode defers each admission's first-token sampling: the
        prefill-logits fetch queues behind the in-flight windows (in-
        order device execution), so N immediate fetches pay N pipeline
        drains — instead the lg handles are stacked and fetched ONCE
        after the loop (``_flush_first_samples``)."""
        defer: list | None = ([] if self.pipeline_depth > 1
                              and self._channel is None else None)
        try:
            self._admit_loop(defer)
        finally:
            if defer:
                self._flush_first_samples(defer)

    def _flush_first_samples(self, batch: list) -> None:
        if len(batch) == 1:
            rows = np.asarray(batch[0][1])            # [1, V]
        else:
            rows = np.asarray(jnp.concatenate(
                [lg for _, lg in batch], axis=0))     # [n, V] — ONE read
        for (slot_idx, _), row in zip(batch, rows):
            slot = self.slots[slot_idx]
            if not slot.active:                       # raced a cancel
                continue
            first = self._sample_first(slot, row[None, :])
            if first is None:                         # grammar dead end
                self._finish(slot_idx, StopReason.EOS)
            else:
                self._emit(slot_idx, first)

    def _admit_loop(self, defer: list | None) -> None:
        admitted = 0
        for slot_idx, slot in enumerate(self.slots):
            if slot.occupied:
                continue
            if admitted >= self.max_admissions_per_step:
                return  # bound prefill head-of-line blocking per step
            try:
                _, _, _, req = self.pending.get_nowait()
            except queue.Empty:
                return
            now = time.time()
            if req.cancelled:
                req.out.put((None, "", True, StopReason.CANCELLED))
                self.stats["cancelled"] += 1
                self.stats["completed"] += 1
                continue
            if (req.queue_timeout_s is not None
                    and getattr(req, "_preempt", None) is None
                    and now - req.submitted_at > req.queue_timeout_s):
                # queue_timeout_s bounds QUEUE WAIT; a preempted request
                # already ran, so the pre-admission clock does not apply
                req.out.put((None, "", True, StopReason.TIMEOUT))
                self.stats["timeouts"] += 1
                self.stats["completed"] += 1
                continue
            T = len(req.token_ids)
            if T == 0 or T >= self.S:
                req.out.put((None, "", True, StopReason.CONTEXT_FULL))
                self.stats["completed"] += 1
                continue
            staged = (self.chunked_prefill is not None
                      and T > self.chunked_prefill)
            pf_base = 0
            lg = None
            if self.paged:
                if staged:
                    m = self._paged_alloc_slot(slot_idx, req, T)
                    if m is None:
                        self.pending.put(
                            (req.priority, req.submitted_at, req.id, req))
                        return
                    pf_base = m
                else:
                    lg = self._paged_prefill_slot(slot_idx, req, T)
                    if lg is None:
                        # pool exhausted: requeue, stop admitting this step
                        self.pending.put(
                            (req.priority, req.submitted_at, req.id, req))
                        return
            elif not staged:
                Tp = self._bucket(T)
                toks = np.zeros((1, Tp), np.int32)
                toks[0, :T] = req.token_ids
                pos = np.full((1, Tp), self.S, np.int32)
                pos[0, :T] = np.arange(T)
                if Tp not in self._prefill_cache:
                    self._prefill_cache[Tp] = self._make_prefill(Tp)
                if self._channel is not None:
                    self._channel.send(("prefill", Tp, toks, pos, T))
                lg, kc, vc, ks, vs = self._prefill_cache[Tp](
                    self.params, jnp.asarray(toks), jnp.asarray(pos),
                    jnp.asarray([T], jnp.int32),
                    jnp.asarray([T - 1], jnp.int32))
                if self._channel is not None:
                    self._channel.send(("splice", slot_idx, T))
                    # copy out so first-token sampling stays process-local
                    lg = np.asarray(lg)
                self.cache = self._splice(
                    self.cache, kc, vc, ks, vs,
                    slot_idx, jnp.asarray(T, jnp.int32))
            admitted += 1

            # first token comes from the prefill logits (greedy/sampled)
            eos = getattr(self.tokenizer, "eos_token_id", None)
            slot.req = req
            slot.stop = StopCriteria(
                max_new_tokens=req.gen.max_new_tokens,
                eos_token_id=eos,
                stop_token_ids=frozenset(req.gen.stop_token_ids),
                stop_sequences=tuple(req.gen.stop_sequences),
                min_new_tokens=req.gen.min_new_tokens,
            )
            slot.generated = 0
            slot.pos = T
            slot.out_ids = []
            slot.key = _host_key(_request_seed(req.gen))
            slot.mirostat = (MirostatState.from_config(req.gen)
                             if req.gen.mirostat else None)
            slot.grammar = self._grammar_matcher(req.gen)
            slot.deadline = (req.submitted_at + req.timeout_s
                             if req.timeout_s is not None else None)
            slot.admitted_at = time.time()
            res = req.__dict__.pop("_preempt", None)
            if res is not None:
                # preempted request resuming: continue its key stream,
                # stop budget, and grammar/mirostat state exactly where
                # the evicted slot left off (already-emitted tokens are
                # part of req.token_ids now; out_ids stays empty so
                # nothing is re-streamed to the client)
                slot.key = res["key"]
                slot.mirostat = res["mirostat"]
                slot.grammar = res["grammar"]
                slot.stop = res["stop"]
                slot.generated = res["generated"]
            if req.gen.logit_bias or self._bias_live[slot_idx]:
                self._set_slot_bias(slot_idx, req.gen.logit_bias)
                if self._channel is not None:
                    self._channel.send(
                        ("bias", slot_idx, req.gen.logit_bias))
            slot.min_ban = False
            mn = slot.stop.min_new_tokens
            if mn and slot.generated < mn:
                ban = self._min_ban_bias(req.gen)
                if ban != tuple(req.gen.logit_bias):
                    slot.min_ban = True
                    self._set_slot_bias(slot_idx, ban)
                    if self._channel is not None:
                        self._channel.send(("bias", slot_idx, ban))
            if staged:
                slot.prefilling = True
                slot.pf_done = 0
                slot.pf_base = pf_base
                slot.pf_carry = None
                slot.pos = 0
                self.stats["chunked_admissions"] = (
                    self.stats.get("chunked_admissions", 0) + 1)
                continue
            slot.active = True
            slot.epoch += 1
            if defer is not None and not isinstance(lg, np.ndarray):
                defer.append((slot_idx, lg))
                continue
            first = self._sample_first(slot, lg)
            if first is None:                      # grammar dead end
                self._finish(slot_idx, StopReason.EOS)
            else:
                self._emit(slot_idx, first)

    # ---------------------------------------------------- chunked prefill
    def _advance_prefills(self) -> bool:
        """Run ONE prompt chunk for up to ``max_admissions_per_step``
        staging slots; activate slots whose last chunk completed.  Returns
        True when any chunk work ran (the loop must not sleep)."""
        C = self.chunked_prefill
        worked = False
        advanced = 0
        for slot_idx, slot in enumerate(self.slots):
            if not slot.prefilling:
                continue
            if advanced >= self.max_admissions_per_step:
                return True      # more staging work remains next step
            req = slot.req
            if req is None or req.cancelled:
                self._finish(slot_idx, StopReason.CANCELLED)
                continue
            if slot.deadline is not None and time.time() > slot.deadline:
                self._finish(slot_idx, StopReason.TIMEOUT)
                continue
            worked = True
            advanced += 1
            total = len(req.token_ids) - slot.pf_base
            start = slot.pf_base + slot.pf_done
            Tc = min(C, len(req.token_ids) - start)
            Tp = self._bucket(Tc)
            toks = np.zeros((1, Tp), np.int32)
            toks[0, :Tc] = req.token_ids[start: start + Tc]
            if self.paged:
                pos = np.full((1, Tp), self.S_view, np.int32)
                pos[0, :Tc] = np.arange(start, start + Tc)
                if Tp not in self._prefill_paged_cache:
                    self._prefill_paged_cache[Tp] = \
                        self._make_prefill_paged(Tp)
                lg, new_k, new_v = self._prefill_paged_cache[Tp](
                    self.params, self.cache.k, self.cache.v,
                    self.cache.tables[slot_idx], jnp.asarray(toks),
                    jnp.asarray(pos), jnp.asarray(start, jnp.int32),
                    jnp.asarray([Tc], jnp.int32),
                    jnp.asarray([Tc - 1], jnp.int32))
                self.cache = dataclasses.replace(
                    self.cache, k=new_k, v=new_v)
            else:
                pos = np.full((1, Tp), self.S, np.int32)
                pos[0, :Tc] = np.arange(start, start + Tc)
                if slot.pf_carry is None:
                    # first chunk: the whole-prompt program doubles as the
                    # chunk-0 program (fresh zero cache, pre_len == 0)
                    if Tp not in self._prefill_cache:
                        self._prefill_cache[Tp] = self._make_prefill(Tp)
                    if self._channel is not None:
                        self._channel.send(
                            ("pfc0", slot_idx, Tp, toks, pos, Tc))
                    lg, kc, vc, ks, vs = self._prefill_cache[Tp](
                        self.params, jnp.asarray(toks), jnp.asarray(pos),
                        jnp.asarray([Tc], jnp.int32),
                        jnp.asarray([Tc - 1], jnp.int32))
                else:
                    if Tp not in self._prefill_chunk_cache:
                        self._prefill_chunk_cache[Tp] = \
                            self._make_prefill_chunk(Tp)
                    if self._channel is not None:
                        self._channel.send(
                            ("pfc", slot_idx, Tp, toks, pos,
                             slot.pf_done, Tc))
                    kc, vc, ks, vs = slot.pf_carry
                    lg, kc, vc, ks, vs = self._prefill_chunk_cache[Tp](
                        self.params, kc, vc, ks, vs,
                        jnp.asarray(toks), jnp.asarray(pos),
                        jnp.asarray([slot.pf_done], jnp.int32),
                        jnp.asarray([Tc], jnp.int32),
                        jnp.asarray([Tc - 1], jnp.int32))
                slot.pf_carry = (kc, vc, ks, vs)
            slot.pf_done += Tc
            self.stats["prefill_chunks"] = (
                self.stats.get("prefill_chunks", 0) + 1)
            if slot.pf_done < total:
                continue

            # last chunk done → install the KV rows and activate
            T = len(req.token_ids)
            if self.paged:
                self.cache = dataclasses.replace(
                    self.cache,
                    lengths=self.cache.lengths.at[slot_idx].set(T))
            else:
                kc, vc, ks, vs = slot.pf_carry
                if self._channel is not None:
                    self._channel.send(("splice", slot_idx, T))
                    lg = np.asarray(lg)
                self.cache = self._splice(
                    self.cache, kc, vc, ks, vs,
                    slot_idx, jnp.asarray(T, jnp.int32))
            slot.pf_carry = None
            slot.prefilling = False
            slot.pos = T
            slot.active = True
            slot.epoch += 1
            first = self._sample_first(slot, lg)
            if first is None:                      # grammar dead end
                self._finish(slot_idx, StopReason.EOS)
            else:
                self._emit(slot_idx, first)
        return worked

    # ------------------------------------------------------------ paged ops
    def _find_fork_source(self, prompt: list[int], T: int
                          ) -> tuple[int, int | None]:
        """Longest page-aligned common prefix with an active slot's prompt
        (shared system prompts → refcounted page fork, prefix_cache.rs /
        kv_cache_optimized.rs parity).  Returns (m, source_slot|None)."""
        page = self.page_size
        best_m, best_j = 0, None
        for j, s in enumerate(self.slots):
            if not s.active or s.req is None:
                continue
            sp = s.req.token_ids
            m = 0
            for a, b in zip(prompt, sp):
                if a != b:
                    break
                m += 1
            m = (m // page) * page
            m = min(m, ((T - 1) // page) * page)   # ≥1 suffix token
            if m >= page and m > best_m and s.pos >= m:
                best_m, best_j = m, j
        return best_m, best_j

    def _paged_alloc_slot(self, slot_idx: int, req: Request,
                          T: int) -> int | None:
        """Reserve the slot's pages for a ``T``-token prompt: fork
        shared-prefix pages, allocate the rest, write the block table.
        Returns the forked-prefix length ``m`` (0 if none), or None when
        the pool is exhausted."""
        from ..engine import paged_cache as pc

        page = self.page_size
        slot = self.slots[slot_idx]
        m, src = self._find_fork_source(req.token_ids, T)
        need_new = pc.pages_needed(T, page) - m // page
        if need_new > self.pool.free_pages:
            return None
        pages: list[int] = []
        if m > 0 and src is not None:
            shared = self.slots[src].pages[: m // page]
            self.pool.retain(shared)
            pages.extend(shared)
            self.stats["prefix_forked_pages"] = (
                self.stats.get("prefix_forked_pages", 0) + len(shared))
        else:
            m = 0
        pages.extend(self.pool.alloc(need_new))
        slot.pages = pages
        self.cache = dataclasses.replace(
            self.cache,
            tables=self.cache.tables.at[slot_idx, : len(pages)].set(
                jnp.asarray(pages, jnp.int32)))
        return m

    def _paged_prefill_slot(self, slot_idx: int, req: Request, T: int):
        """Admit one request into the page pool: fork shared-prefix pages,
        allocate the rest, prefill the suffix straight into the pages.
        Returns last-position logits, or None when the pool is exhausted.
        """
        m = self._paged_alloc_slot(slot_idx, req, T)
        if m is None:
            return None

        Ts = T - m
        Tp = self._bucket(Ts)
        toks = np.zeros((1, Tp), np.int32)
        toks[0, :Ts] = req.token_ids[m:]
        pos = np.full((1, Tp), self.S_view, np.int32)   # pad_marker
        pos[0, :Ts] = np.arange(m, T)
        if Tp not in self._prefill_paged_cache:
            self._prefill_paged_cache[Tp] = self._make_prefill_paged(Tp)
        lg, new_k, new_v = self._prefill_paged_cache[Tp](
            self.params, self.cache.k, self.cache.v,
            self.cache.tables[slot_idx], jnp.asarray(toks),
            jnp.asarray(pos), jnp.asarray(m, jnp.int32),
            jnp.asarray([Ts], jnp.int32), jnp.asarray([Ts - 1], jnp.int32))
        self.cache = dataclasses.replace(
            self.cache, k=new_k, v=new_v,
            lengths=self.cache.lengths.at[slot_idx].set(T))
        return lg

    def _release_slot_pages(self, slot_idx: int) -> None:
        slot = self.slots[slot_idx]
        if not self.paged or not slot.pages:
            return
        self.pool.release(slot.pages)
        slot.pages = []
        self.cache = dataclasses.replace(
            self.cache,
            tables=self.cache.tables.at[slot_idx].set(-1),
            lengths=self.cache.lengths.at[slot_idx].set(0))

    def _paged_grow(self, active_idx: list[int],
                    steps: int = 1) -> list[int]:
        """Allocate page-boundary pages for this dispatch window's writes
        (``steps`` decode tokens); when the pool is dry, evict the
        youngest slot(s) CONTEXT_FULL until the rest fit.  Returns the
        surviving active indices."""
        from ..engine import paged_cache as pc

        survivors = list(active_idx)
        # youngest last: eviction order
        survivors.sort(key=lambda i: self.slots[i].admitted_at)
        kept = []
        nb = self.cache.tables.shape[1]
        for i in survivors:
            slot = self.slots[i]
            # demand only what THIS slot can still emit: a slot one token
            # from max_new_tokens must not be evicted for window pages it
            # will never write (K=1 semantics under pool pressure)
            will_emit = steps
            if slot.req is not None:
                will_emit = max(1, min(
                    steps, slot.req.gen.max_new_tokens - slot.generated))
            need = min(pc.pages_needed(slot.pos + will_emit,
                                       self.page_size), nb)
            grow = need - len(slot.pages)
            if grow <= 0:
                kept.append(i)
                continue
            if grow > self.pool.free_pages:
                # evict: emit what we have and free the pages
                if slot.req is not None:
                    slot.req.out.put((None, "", True,
                                      StopReason.CONTEXT_FULL))
                slot.active = False
                slot.req = None
                self.stats["completed"] += 1
                self.stats["evictions"] = self.stats.get("evictions", 0) + 1
                self._release_slot_pages(i)
                continue
            new = self.pool.alloc(grow)
            self.cache = dataclasses.replace(
                self.cache,
                tables=self.cache.tables.at[
                    i, len(slot.pages): len(slot.pages) + grow].set(
                    jnp.asarray(new, jnp.int32)))
            slot.pages.extend(new)
            kept.append(i)
        kept.sort()
        return kept

    def _set_slot_bias(self, slot_idx: int,
                       bias: tuple[tuple[int, float], ...]) -> None:
        """Write one slot's logit-bias row into the device matrix
        (admit-time only — never shipped per dispatch)."""
        V = self.cfg.vocab_size
        if self._bias_rows is None:
            if not bias:
                return
            self._bias_rows = jnp.zeros((self.B, V), jnp.float32)
        row = np.zeros((V,), np.float32)
        for tok, val in bias:
            if 0 <= tok < V:
                row[tok] = val
        self._bias_rows = self._bias_rows.at[slot_idx].set(
            jnp.asarray(row))
        self._bias_live[slot_idx] = bool(bias)

    def _grammar_matcher(self, gen: GenerationConfig):
        """Per-request constrained-decoding state (grammar compile cached
        by source; one shared vocab trie per scheduler)."""
        if not gen.grammar:
            return None
        if self.tokenizer is None:
            raise InferenceError("grammar decoding requires a tokenizer")
        from ..grammar import Grammar, TokenVocab, VocabMatcher

        if not hasattr(self, "_grammar_vocab"):
            self._grammar_vocab = TokenVocab.from_tokenizer(self.tokenizer)
            self._grammar_cache: dict[str, Grammar] = {}
        g = self._grammar_cache.get(gen.grammar)
        if g is None:
            g = Grammar.from_gbnf(gen.grammar)
            if len(self._grammar_cache) >= 32:    # bound per-source cache
                self._grammar_cache.pop(next(iter(self._grammar_cache)))
            self._grammar_cache[gen.grammar] = g
        return VocabMatcher(g, self._grammar_vocab)

    def embed_ids(self, token_ids: list[int]) -> np.ndarray:
        """Final-hidden-state embeddings [T, H] f32 for /v1/embeddings
        (llama.cpp ``embedding=True`` semantics, mean-pool at the caller).

        Runs on a throwaway KV cache, never the serving pool, so decode
        state is untouched; sequence lengths bucket to powers of two to
        bound compile count."""
        if self._channel is not None:
            raise InferenceError(
                "embeddings are frontend-local; not supported on a "
                "multi-host scheduler")
        T = len(token_ids)
        if T == 0:
            raise InferenceError("empty input")
        if T > self.S:
            raise InferenceError(f"input {T} tokens > max_seq_len {self.S}")
        Tp = min(self.S, 1 << max(3, (T - 1).bit_length()))
        fn = getattr(self, "_embed_fns", None)
        if fn is None:
            fn = self._embed_fns = {}
        if Tp not in fn:
            from functools import partial

            from ..models.bitnet import forward_cache

            fn[Tp] = jax.jit(partial(
                forward_cache, self.cfg, kernel_path=self._kp))
        from ..engine.cache import allocate_cache

        cache = allocate_cache(self.cfg, 1, Tp)
        toks = np.zeros((1, Tp), np.int32)
        toks[0, :T] = token_ids
        pos = np.full((1, Tp), Tp, np.int32)
        pos[0, :T] = np.arange(T)
        h, _cache = fn[Tp](self.params, jnp.asarray(toks),
                           jnp.asarray(pos), cache,
                           jnp.asarray([T], jnp.int32))
        return np.asarray(h[0, :T], np.float32)

    def _min_ban_bias(self, gen: GenerationConfig) -> tuple:
        """Request bias merged with −1e30 on EOS + stop-token ids (the
        min_new_tokens phase; same merge as the engine's sampler_ban)."""
        d = dict(gen.logit_bias)
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            d[int(eos)] = -1e30
        for t in gen.stop_token_ids:
            d[int(t)] = -1e30
        return tuple(sorted(d.items()))

    def _ban_gen(self, gen: GenerationConfig) -> GenerationConfig:
        return gen.replace(logit_bias=self._min_ban_bias(gen),
                           min_new_tokens=0)

    def _stash_logprobs(self, slot: _Slot, lg_row, tok: int) -> None:
        """Compute the raw-distribution logprob entry for a just-sampled
        token; _emit appends it to req.logprobs iff the token is emitted."""
        gen = slot.req.gen
        if gen.logprobs is None:
            return
        lp, top = logprob_entry(lg_row, tok, gen.logprobs)
        piece = self.tokenizer.token_to_piece(tok) if self.tokenizer else ""
        tops = [{"token_id": i,
                 "token": (self.tokenizer.token_to_piece(i)
                           if self.tokenizer else ""),
                 "logprob": l} for i, l in top]
        slot.lp_pending = {"token_id": tok, "text": piece,
                           "logprob": lp, "top": tops}

    def _grammar_mask(self, slot: _Slot, lg):
        """Apply the slot's grammar mask to a [V] or [1, V] logits row
        (host numpy; NEG_INF outside the admissible set).  Returns None
        on a dead end — no admissible token AND EOS illegal — so the
        caller stops the slot cleanly (engine.py grammar_dead_end
        parity) instead of sampling from a uniform all-NEG_INF row."""
        mask = slot.grammar.allowed_mask()
        if not mask.any():
            return None
        lg = np.asarray(lg, np.float32)
        return np.where(mask, lg, NEG_INF) if lg.ndim == 1 else \
            np.where(mask[None, :], lg, NEG_INF)

    def _sample_first(self, slot: _Slot, lg: jnp.ndarray) -> int | None:
        """Sample the prefill token with the slot's key stream + the
        prompt-tail history — exactly the engine's first decode-loop
        iteration (engine.py generate_stream)."""
        gen = slot.req.gen
        slot.key, sub = _host_split(slot.key)
        raw = lg
        if (gen.is_greedy and slot.grammar is None
                and slot.mirostat is None and not slot.min_ban
                and gen.logprobs is None
                and gen.repetition_penalty == 1.0
                and gen.frequency_penalty == 0.0
                and gen.presence_penalty == 0.0
                and not gen.logit_bias):
            # pure-argmax requests sample on HOST numpy — the device
            # chain would cost one dispatch + one fetch round-trip per
            # admission (identical result: with neutral penalties the
            # compiled chain reduces to argmax; both argmaxes take the
            # first maximum)
            return int(np.asarray(lg)[0].argmax())
        if slot.grammar is not None:
            masked = self._grammar_mask(slot, lg)
            if masked is None:
                return None                        # grammar dead end
            lg = jnp.asarray(masked)
        if slot.mirostat is not None:
            row = lg[0].astype(jnp.float32)
            if slot.min_ban:
                for t, _b in self._min_ban_bias(gen):
                    row = row.at[t].set(NEG_INF)
            tok = slot.mirostat.sample(row, sub)
        else:
            W = max(1, min(gen.repetition_window, HISTORY_W))
            hist = np.full((1, W), -1, np.int32)
            tail = slot.req.token_ids[-W:]
            hist[0, : len(tail)] = tail
            chain = SamplerChain(self._ban_gen(gen) if slot.min_ban
                                 else gen)
            tok = int(chain.sample(lg.astype(jnp.float32)[:1],
                                   jnp.asarray(hist), sub)[0])
        if slot.grammar is not None:
            slot.grammar.accept(tok)
        self._stash_logprobs(slot, np.asarray(raw).reshape(-1), tok)
        return tok

    def _slot_history(self, slot: _Slot) -> np.ndarray:
        """Last ``repetition_window`` tokens of prompt+output ([-1]-padded,
        clamped to the pooled width)."""
        gen = slot.req.gen
        W = max(1, min(gen.repetition_window, HISTORY_W))
        seq = (slot.req.token_ids + slot.out_ids)[-W:]
        row = np.full(HISTORY_W, -1, np.int32)
        row[: len(seq)] = seq
        return row

    def _finish(self, slot_idx: int, reason: StopReason) -> None:
        """Evict a slot without a token (cancel / timeout)."""
        slot = self.slots[slot_idx]
        if slot.req is not None:
            slot.req.out.put((None, "", True, reason))
        slot.active = False
        slot.prefilling = False
        slot.pf_carry = None
        slot.pf_done = 0
        slot.grammar = None
        slot.lp_pending = None
        slot.min_ban = False
        slot.req = None
        self.stats["completed"] += 1
        self._release_slot_pages(slot_idx)
        if reason == StopReason.CANCELLED:
            self.stats["cancelled"] += 1
        elif reason == StopReason.TIMEOUT:
            self.stats["timeouts"] += 1

    def _emit(self, slot_idx: int, tok: int) -> None:
        """Record a generated token; handle stop + eviction."""
        slot = self.slots[slot_idx]
        req, stop = slot.req, slot.stop
        slot.out_ids.append(tok)
        text = self.tokenizer.token_to_piece(tok) if self.tokenizer else ""
        reason = stop.check(tok, text)
        slot.generated += 1
        self.stats["tokens_generated"] += 1
        if slot.min_ban and slot.generated >= stop.min_new_tokens:
            # min phase over: restore the request's own bias row
            slot.min_ban = False
            self._set_slot_bias(slot_idx, req.gen.logit_bias)
            if self._channel is not None:
                self._channel.send(("bias", slot_idx, req.gen.logit_bias))
        lp, slot.lp_pending = slot.lp_pending, None
        if req.logprobs is not None and lp is not None \
                and reason not in (StopReason.STOP_TOKEN, StopReason.EOS):
            # append BEFORE out.put so a consumer that dequeued token i
            # may read req.logprobs[i] (stop tokens are never emitted)
            req.logprobs.append(lp)
        if reason in (StopReason.STOP_TOKEN, StopReason.EOS):
            req.out.put((None, "", True, reason))
        elif reason is not None:
            req.out.put((tok, text, True, reason))
        elif slot.pos + 1 >= self.S:
            req.out.put((tok, text, True, StopReason.CONTEXT_FULL))
            reason = StopReason.CONTEXT_FULL
        else:
            req.out.put((tok, text, False, None))
            self._tokens[slot_idx] = tok
            return
        # finished → free slot
        slot.active = False
        slot.grammar = None
        slot.lp_pending = None
        slot.min_ban = False
        slot.req = None
        self.stats["completed"] += 1
        self._release_slot_pages(slot_idx)

    def _loop(self) -> None:
        try:
            self._loop_body()
        finally:
            if self._channel is not None:
                # release the followers even if the loop died
                self._channel.send(("stop",))

    def _loop_body(self) -> None:
        zero_keys = np.zeros((self.B, 2), np.uint32)
        pipelined = self.pipeline_depth > 1
        while not self._stopping:
            if getattr(self, "_pause_req", False):
                # quiesced between steps: cache/slots are stable for
                # checkpoint_requests until unpause()
                if pipelined and self._pl_inflight:
                    self._pl_drain()
                    self._pl_sync_host()
                self._paused_at_barrier = True
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            self._paused_at_barrier = False
            if not (self._step_pipelined() if pipelined
                    else self._step(zero_keys)):
                if (self._channel is not None
                        and time.time() - self._channel.last_send > 5.0):
                    # idle heartbeat: keep the followers' blocking
                    # collectives from outwaiting transport timeouts
                    self._channel.send(("noop",))
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def _step(self, zero_keys: np.ndarray | None = None) -> bool:
        """One scheduler iteration: sweep cancellations/deadlines, admit,
        advance chunked prefills, run one decode dispatch.  Returns False
        when there was nothing to do (the loop may sleep)."""
        if zero_keys is None:
            zero_keys = np.zeros((self.B, 2), np.uint32)
        # cancellations / deadlines first: free slots before admitting
        now = time.time()
        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            if s.req is not None and s.req.cancelled:
                self._finish(i, StopReason.CANCELLED)
            elif s.deadline is not None and now > s.deadline:
                self._finish(i, StopReason.TIMEOUT)
        self._maybe_preempt()
        self._admit()
        chunk_worked = (self._advance_prefills()
                        if self.chunked_prefill is not None else False)
        active_idx = [i for i, s in enumerate(self.slots) if s.active]
        if self.speculative_k and active_idx:
            active_idx = self._run_spec_slots(active_idx)
            if not active_idx:
                self.stats["active_slots"] = sum(
                    1 for s in self.slots if s.active)
                self.stats["queue_depth"] = self.pending.qsize()
                return True
        # window size first: paged growth must cover every in-scan
        # write of a multi-step dispatch (mirostat keeps K=1 —
        # host-side stateful sampling)
        k_cfg = self.decode_steps_per_dispatch
        any_hostside = any(self.slots[i].hostside for i in active_idx)
        any_minban = any(self.slots[i].min_ban for i in active_idx)
        k_eff = 1 if (any_hostside or any_minban) else k_cfg
        if self.paged and active_idx:
            active_idx = self._paged_grow(active_idx, k_eff)
        self.stats["active_slots"] = len(active_idx)
        self.stats["queue_depth"] = self.pending.qsize()
        if not active_idx:
            return chunk_worked

        active = np.zeros(self.B, bool)
        temps = np.zeros(self.B, np.float32)
        top_ks = np.zeros(self.B, np.int32)
        top_ps = np.ones(self.B, np.float32)
        min_ps = np.zeros(self.B, np.float32)
        typ_ps = np.ones(self.B, np.float32)
        reps = np.ones(self.B, np.float32)
        freqs = np.zeros(self.B, np.float32)
        press = np.zeros(self.B, np.float32)
        positions = np.zeros(self.B, np.int32)
        hist = np.full((self.B, HISTORY_W), -1, np.int32)
        keys = zero_keys.copy()
        use_typical = False
        use_bias = False
        for i in active_idx:
            s = self.slots[i]
            g = s.req.gen
            active[i] = True
            temps[i] = 0.0 if g.is_greedy else g.temperature
            top_ks[i] = g.top_k
            top_ps[i] = g.top_p
            min_ps[i] = g.min_p
            typ_ps[i] = g.typical_p
            if g.typical_p < 1.0 and not g.is_greedy:
                use_typical = True
            reps[i] = g.repetition_penalty
            freqs[i] = g.frequency_penalty
            press[i] = g.presence_penalty
            if self._bias_live[i]:
                use_bias = True
            positions[i] = s.pos
            hist[i] = self._slot_history(s)
            keys[i] = np.asarray(s.key, np.uint32)
        bias_rows = (self._bias_rows if use_bias else self._dummy_bias)
        if k_eff > 1:
            if self._channel is not None:
                self._channel.send((
                    "decode_multi", self._tokens.copy(), positions,
                    active, temps, top_ks, top_ps, min_ps, typ_ps,
                    reps, freqs, press, hist, keys, use_typical,
                    use_bias, k_eff))
            multi_fn = (self._decode_multi_paged if self.paged
                        else self._decode_multi)
            packed, self.cache = multi_fn(
                self.params, jnp.asarray(self._tokens),
                jnp.asarray(positions), self.cache,
                jnp.asarray(active), jnp.asarray(temps),
                jnp.asarray(top_ks), jnp.asarray(top_ps),
                jnp.asarray(min_ps), jnp.asarray(typ_ps),
                jnp.asarray(reps), jnp.asarray(freqs),
                jnp.asarray(press), bias_rows, jnp.asarray(hist),
                jnp.asarray(keys), use_typical=use_typical,
                use_bias=use_bias, n_steps=k_eff)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            packed_np = np.asarray(packed)        # [k+2, B] — ONE read
            nxt_list = packed_np[:k_eff].tolist()
            new_keys_np = np.ascontiguousarray(
                packed_np[k_eff:].T).view(np.uint32)
            self.stats["decode_steps"] += k_eff
            for i in active_idx:
                self.slots[i].key = new_keys_np[i]
            for step in range(k_eff):
                row = nxt_list[step]
                for i in active_idx:
                    s = self.slots[i]
                    if not s.active:
                        continue      # stopped earlier in the window
                    s.pos += 1
                    self._emit(i, row[i])
            return True
        step_fn = (self._decode_step_paged if self.paged
                   else self._decode_step)
        # replicate full-vocab logits across hosts only when a host-side
        # sampler (mirostat/grammar) will read them (code-review finding:
        # an unconditional all-gather of [B, V] f32 over DCN per step)
        rep_logits = (self._channel is not None and any_hostside)
        if self._channel is not None:
            self._channel.send((
                "decode", self._tokens.copy(), positions, active,
                temps, top_ks, top_ps, min_ps, typ_ps, reps, freqs,
                press, hist, keys, use_typical, use_bias, rep_logits))
        nxt, raw_lg, subs, new_keys, self.cache = step_fn(
            self.params, jnp.asarray(self._tokens),
            jnp.asarray(positions), self.cache,
            jnp.asarray(active), jnp.asarray(temps),
            jnp.asarray(top_ks), jnp.asarray(top_ps),
            jnp.asarray(min_ps), jnp.asarray(typ_ps), jnp.asarray(reps),
            jnp.asarray(freqs), jnp.asarray(press), bias_rows,
            jnp.asarray(hist), jnp.asarray(keys),
            use_typical=use_typical, use_bias=use_bias,
            rep_logits=rep_logits)
        nxt_np = np.asarray(nxt)
        new_keys_np = np.asarray(new_keys)
        if rep_logits:
            # mirostat samples on host from the raw logits — keep
            # those ops process-local via numpy copies
            raw_lg = np.asarray(raw_lg)
            subs = np.asarray(subs)
        self.stats["decode_steps"] += 1
        for i in active_idx:
            s = self.slots[i]
            s.key = new_keys_np[i]
            tok = int(nxt_np[i])
            if s.hostside:
                # stateful per-sequence sampling from the raw logits
                # with the slot's sub-key (engine mirostat/grammar path)
                lg_row = raw_lg[i]
                raw_row = lg_row
                if s.grammar is not None:
                    lg_row = self._grammar_mask(s, lg_row)
                    if lg_row is None:             # grammar dead end
                        self._finish(i, StopReason.EOS)
                        continue
                if s.mirostat is not None:
                    if s.min_ban:
                        lg_row = np.asarray(lg_row, np.float32).copy()
                        for t, _b in self._min_ban_bias(s.req.gen):
                            lg_row[t] = NEG_INF
                    tok = s.mirostat.sample(lg_row, subs[i])
                else:
                    chain = SamplerChain(self._ban_gen(s.req.gen)
                                         if s.min_ban else s.req.gen)
                    tok = int(chain.sample(
                        jnp.asarray(lg_row, jnp.float32)[None],
                        jnp.asarray(self._slot_history(s)[None]),
                        jnp.asarray(subs[i]))[0])
                if s.grammar is not None:
                    s.grammar.accept(tok)
                self._stash_logprobs(s, raw_row, tok)
            s.pos += 1
            self._emit(i, tok)
        return True

    # ------------------------------------------------------ pipelined mode
    def _pl_fpar_row(self, slot: _Slot) -> np.ndarray:
        g = slot.req.gen
        greedy = g.is_greedy
        return np.asarray([
            0.0 if greedy else g.temperature, g.top_p, g.min_p,
            g.typical_p, g.repetition_penalty, g.frequency_penalty,
            g.presence_penalty], np.float32)

    def _pl_rebuild_state(self) -> None:
        """(Re)build the device decode state from the host slot view —
        on first use and when returning from a sync-mode excursion."""
        B = self.B
        toks = np.asarray(self._tokens, np.int32)
        pos = np.zeros(B, np.int32)
        hist = np.full((B, HISTORY_W), -1, np.int32)
        keys = np.zeros((B, 2), np.uint32)
        active = np.zeros(B, bool)
        fpar = np.zeros((B, 7), np.float32)
        fpar[:, 1] = 1.0   # top_p
        fpar[:, 3] = 1.0   # typical_p
        fpar[:, 4] = 1.0   # repetition_penalty
        ipar = np.zeros((B, 1), np.int32)
        for i, s in enumerate(self.slots):
            if not s.active or s.req is None:
                continue
            active[i] = True
            pos[i] = s.pos
            hist[i] = self._slot_history(s)
            keys[i] = np.asarray(s.key, np.uint32)
            fpar[i] = self._pl_fpar_row(s)
            ipar[i, 0] = s.req.gen.top_k
        self._pl_state = (jnp.asarray(toks), jnp.asarray(pos),
                          jnp.asarray(hist), jnp.asarray(keys),
                          jnp.asarray(active), jnp.asarray(fpar),
                          jnp.asarray(ipar))
        self._pl_mirror = [bool(a) for a in active]
        self._pl_mirror_epoch = [s.epoch if a else -1
                                 for s, a in zip(self.slots, active)]

    def _pl_sync_host(self) -> None:
        """Pull tokens/keys back to the host slot view (before a sync-mode
        excursion or a checkpoint pause).  Inflight must be drained."""
        assert not self._pl_inflight
        if self._pl_state is None:
            return
        toks, _pos, _hist, keys = self._pl_state[:4]
        toks_np = np.asarray(toks)
        keys_np = np.asarray(keys)
        for i, s in enumerate(self.slots):
            # only slots whose CURRENT occupancy actually ran on the
            # device — a just-admitted slot (mirror epoch behind) holds
            # its fresh host token/key, which must not be clobbered
            if (s.active and s.req is not None and self._pl_mirror[i]
                    and self._pl_mirror_epoch[i] == s.epoch):
                self._tokens[i] = toks_np[i]
                s.key = keys_np[i]

    def _pl_apply_lifecycle(self) -> None:
        """Diff host slot activity against the device mirror and issue
        per-slot state updates (tiny async dispatches, never read).
        Keyed by occupancy EPOCH, not just activity: a slot freed and
        re-admitted inside one loop iteration shows no inactive interval
        but its epoch moved."""
        for i, s in enumerate(self.slots):
            if s.active and s.req is not None and (
                    not self._pl_mirror[i]
                    or self._pl_mirror_epoch[i] != s.epoch):
                self._pl_state = self._state_admit(
                    self._pl_state, jnp.asarray(i, jnp.int32),
                    jnp.asarray(int(self._tokens[i]), jnp.int32),
                    jnp.asarray(s.pos, jnp.int32),
                    jnp.asarray(self._slot_history(s)),
                    jnp.asarray(np.asarray(s.key, np.uint32)),
                    jnp.asarray(self._pl_fpar_row(s)),
                    jnp.asarray(s.req.gen.top_k, jnp.int32))
                self._pl_mirror[i] = True
                self._pl_mirror_epoch[i] = s.epoch
                # the old occupant's in-flight windows no longer speak
                # for this slot (epoch guard discards their tokens)
                self._pl_issued[i] = 0
            elif not s.active and self._pl_mirror[i]:
                self._pl_state = self._state_finish(
                    self._pl_state, jnp.asarray(i, jnp.int32))
                self._pl_mirror[i] = False

    def _pl_can_issue(self) -> bool:
        """Issue another window only if some slot still has tokens to
        emit beyond what is already in flight."""
        for i, s in enumerate(self.slots):
            if not (s.active and s.req is not None and self._pl_mirror[i]):
                continue
            remaining = s.req.gen.max_new_tokens - s.generated
            if remaining > self._pl_issued[i] \
                    and s.pos + self._pl_issued[i] < self.S:
                return True
        return False

    def _pl_window_k(self) -> int:
        """Adaptive window length: a full spd window issued at a cohort's
        tail decodes mostly-dead slots (uniform 64-token requests at
        spd=32 measured 448 decode steps for 192 useful).  Size the
        window to the pool's largest per-slot remaining budget, rounded
        down to a power of two (bounded recompile set)."""
        k_cfg = self.decode_steps_per_dispatch
        rem_max = 0
        for i, s in enumerate(self.slots):
            if not (s.active and s.req is not None and self._pl_mirror[i]):
                continue
            rem = (s.req.gen.max_new_tokens - s.generated
                   - self._pl_issued[i])
            rem = min(rem, self.S - s.pos - self._pl_issued[i])
            rem_max = max(rem_max, rem)
        if rem_max <= 0:
            return 0
        k = 1
        while k * 2 <= min(k_cfg, rem_max):
            k *= 2
        return k

    def _pl_issue(self) -> bool:
        k = self._pl_window_k()
        if k <= 0:
            return False
        use_typical = any(
            s.active and s.req is not None
            and s.req.gen.typical_p < 1.0 and not s.req.gen.is_greedy
            for s in self.slots)
        use_bias = any(self._bias_live[i] for i in range(self.B)
                       if self.slots[i].active)
        bias_rows = self._bias_rows if use_bias else self._dummy_bias
        nxt, self._pl_state, self.cache = self._decode_window(
            self.params, self._pl_state, self.cache, bias_rows,
            use_typical=use_typical, use_bias=use_bias, n_steps=k)
        snap = [(i, s.epoch) for i, s in enumerate(self.slots)
                if s.active and s.req is not None and self._pl_mirror[i]]
        for i, _ in snap:
            self._pl_issued[i] += k
        try:
            # start the device→host copy as soon as the window completes:
            # the reader's np.asarray then finds the bytes already on the
            # host instead of paying the transfer round-trip per window
            nxt.copy_to_host_async()
        except Exception:
            pass
        self._pl_inflight.append((nxt, k, snap))
        return True

    def _emit_window(self, rows: list, k: int, snap: list) -> None:
        for i, _ in snap:
            self._pl_issued[i] = max(0, self._pl_issued[i] - k)
        self.stats["decode_steps"] += k
        for step in range(k):
            row = rows[step]
            for i, ep in snap:
                s = self.slots[i]
                if not s.active or s.req is None or s.epoch != ep:
                    continue            # stopped or re-occupied: discard
                s.pos += 1
                self._emit(i, row[i])

    def _pl_read_one(self) -> None:
        nxt, k, snap = self._pl_inflight.popleft()
        nxt_list = np.asarray(nxt).tolist()           # [k, B] — ONE read
        self._emit_window(nxt_list, k, snap)

    def _pl_read(self, max_batch: int) -> None:
        """Read 1..max_batch in-flight windows with ONE device fetch:
        each fetch through the relay costs a full round-trip whether the
        result is ready or not, so when the pipe is full, consecutive
        windows are concatenated on device and fetched together."""
        # batch only EQUAL-length windows: adaptive tails produce many k
        # values and every distinct concat shape is a fresh (slow, ~30 s
        # through the relay) compile — m×spd is the only shape family
        # worth caching
        k0 = self._pl_inflight[0][1]
        take = 1
        while (take < max_batch and take < len(self._pl_inflight)
               and self._pl_inflight[take][1] == k0):
            take += 1
        if take < 2:
            self._pl_read_one()
            return
        wins = [self._pl_inflight.popleft() for _ in range(take)]
        packed = jnp.concatenate([w[0] for w in wins], axis=0)
        rows = np.asarray(packed).tolist()
        off = 0
        for nxt, k, snap in wins:
            self._emit_window(rows[off:off + k], k, snap)
            off += k

    def _pl_drain(self) -> None:
        while self._pl_inflight:
            self._pl_read_one()

    def _pl_hostside(self) -> bool:
        return any(s.occupied and (s.hostside or s.min_ban)
                   for s in self.slots)

    def _step_pipelined(self) -> bool:
        """One pipelined scheduler iteration.  Returns False when idle."""
        now = time.time()
        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            if s.req is not None and s.req.cancelled:
                self._finish(i, StopReason.CANCELLED)
            elif s.deadline is not None and now > s.deadline:
                self._finish(i, StopReason.TIMEOUT)
        # priority preemption needs a quiesced pool (it snapshots host
        # slot state); only worth draining for when it would trigger
        if not self.pending.empty() \
                and all(s.occupied for s in self.slots):
            self._pl_drain()
            self._maybe_preempt()
        # batched admission: every admission's first-token read queues
        # BEHIND the in-flight windows (in-order device execution), so a
        # lone admission flushes the whole pipeline for one slot.  Admit
        # only when the pipe is empty or enough free slots accumulated
        # to amortize the flush.
        want = self.pending.qsize()
        if want:
            free = sum(1 for s in self.slots if not s.occupied)
            if (not self._pl_inflight
                    or free >= min(self.max_admissions_per_step, want)):
                self._admit()
        chunk_worked = (self._advance_prefills()
                        if self.chunked_prefill is not None else False)

        if self._pl_hostside():
            # mirostat/grammar/logprobs/min-ban slots need per-step host
            # sampling: drain, push state back to the host view, and run
            # the sync step until those slots finish
            self._pl_drain()
            self._pl_sync_host()
            self._pl_state = None          # forces rebuild on return
            worked = self._step()
            self.stats["pipeline_fallback_steps"] = (
                self.stats.get("pipeline_fallback_steps", 0) + 1)
            return worked or chunk_worked

        if self._pl_state is None:
            self._pl_rebuild_state()
            self._pl_issued[:] = 0
        self._pl_apply_lifecycle()

        self.stats["active_slots"] = sum(1 for s in self.slots if s.active)
        self.stats["queue_depth"] = self.pending.qsize()

        issued = False
        while (len(self._pl_inflight) < self.pipeline_depth
               and self._pl_can_issue()):
            if not self._pl_issue():
                break
            issued = True
        if self._pl_inflight and (
                len(self._pl_inflight) >= self.pipeline_depth
                or not self._pl_can_issue()):
            # pipe full → batch-read half the depth in one fetch (each
            # fetch pays a relay round-trip); pipe draining → one at a
            # time for lifecycle responsiveness
            full = len(self._pl_inflight) >= self.pipeline_depth
            self._pl_read(max(1, self.pipeline_depth // 2) if full else 1)
            return True
        return issued or chunk_worked
