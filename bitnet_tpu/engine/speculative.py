"""Speculative decoding: draft k tokens, verify them in one target forward.

Rebuild of the reference's draft/verify speculative decoder
(``bitnet-inference/src/speculative.rs:29-215``: ``SpeculativeConfig``,
acceptance threshold, ``AcceptanceStats``) shaped for the TPU: the target
model verifies all k draft tokens in a SINGLE prefill-shaped forward —
turning k memory-bound decode steps into one MXU-friendly batched step.
Rejected draft entries are never "removed" from the KV cache; the engine's
length-masked attention simply ignores slots past the accepted length and
the next round overwrites them (no copy, no fragmentation).

Draft sources:
- ``NgramDraft``  — prompt-lookup / self-speculation: propose the tokens
  that followed the longest matching suffix earlier in the sequence.  No
  second model, surprisingly strong on templated/repetitive text.
- ``EngineDraft`` — a smaller BitNet checkpoint run through its own
  ``InferenceEngine`` (the reference's draft-model mode).

Acceptance policies (speculative.rs acceptance threshold semantics):
- ``greedy``   — accept while the target argmax equals the draft token
  (lossless for greedy decoding);
- ``threshold``— accept while the target softmax probability of the draft
  token exceeds ``accept_threshold`` (lossy, higher acceptance).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig
from ..errors import InferenceError
from .cache import reset_cache
from .stop import StopCriteria, StopReason


@dataclasses.dataclass(frozen=True)
class SpeculativeConfig:
    num_draft_tokens: int = 4
    policy: str = "greedy"            # 'greedy' | 'threshold'
    accept_threshold: float = 0.3     # used by 'threshold'
    max_ngram: int = 3                # NgramDraft suffix length

    def __post_init__(self):
        if self.num_draft_tokens < 1:
            raise InferenceError("num_draft_tokens must be >= 1")
        if self.policy not in ("greedy", "threshold"):
            raise InferenceError(f"unknown policy {self.policy!r}")


@dataclasses.dataclass
class AcceptanceStats:
    """Mirrors the reference's acceptance statistics (speculative.rs:180)."""

    rounds: int = 0
    proposed: int = 0
    accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0

    def as_dict(self) -> dict:
        return {
            "rounds": self.rounds,
            "proposed": self.proposed,
            "accepted": self.accepted,
            "acceptance_rate": round(self.acceptance_rate, 4),
        }


class DraftSource(Protocol):
    def begin(self, tokens: list[int]) -> None: ...
    def propose(self, tokens: list[int], k: int) -> list[int]: ...


class NgramDraft:
    """Prompt-lookup drafting: longest-suffix match in the history."""

    def __init__(self, max_ngram: int = 3, fallback_token: int = 0):
        self.max_ngram = max_ngram
        self.fallback_token = fallback_token

    def begin(self, tokens: list[int]) -> None:
        pass

    def propose(self, tokens: list[int], k: int) -> list[int]:
        n = len(tokens)
        for m in range(min(self.max_ngram, n - 1), 0, -1):
            suffix = tokens[n - m:]
            # most recent earlier occurrence of the suffix
            for start in range(n - m - 1, -1, -1):
                if tokens[start:start + m] == suffix:
                    cont = tokens[start + m:start + m + k]
                    if cont:
                        out = list(cont)
                        while len(out) < k:
                            out.append(out[-1])
                        return out
        return [tokens[-1] if tokens else self.fallback_token] * k


class EngineDraft:
    """Draft from a (smaller) InferenceEngine running greedy decode."""

    def __init__(self, engine):
        self.engine = engine

    def begin(self, tokens: list[int]) -> None:
        self._logits = self.engine.prefill(tokens)
        self._ctx = list(tokens)

    def propose(self, tokens: list[int], k: int) -> list[int]:
        # resync if the accepted sequence diverged from what we drafted —
        # compare CONTENT, not length: when exactly k-1 drafts are accepted
        # the lengths match but the draft cache holds its rejected k-th
        # token, and all later proposals would condition on a wrong token
        if list(tokens) != self._ctx:
            self.begin(tokens)
        eng = self.engine
        out = []
        decode = eng._get_decode()
        lg = self._logits
        B = eng.engine_cfg.max_batch_size
        for i in range(k):
            nxt = int(jnp.argmax(lg[0]))
            out.append(nxt)
            pos = len(tokens) + i
            tok = np.zeros((B, 1), np.int32)
            tok[0, 0] = nxt
            posa = np.full((B, 1), eng.engine_cfg.max_seq_len, np.int32)
            posa[0, 0] = pos
            lg, eng.cache = decode(eng.params, jnp.asarray(tok), eng.cache,
                                   jnp.asarray(posa))
        self._logits = lg
        self._ctx = list(tokens) + out
        return out


class SpeculativeDecoder:
    """Greedy speculative generation over a target InferenceEngine."""

    def __init__(self, engine, draft: DraftSource | None = None,
                 spec_cfg: SpeculativeConfig | None = None):
        self.engine = engine
        self.spec_cfg = spec_cfg or SpeculativeConfig()
        self.draft = draft or NgramDraft(self.spec_cfg.max_ngram)
        self.stats = AcceptanceStats()
        self._verify_jit = None

    # -- jitted verify step ---------------------------------------------------
    def _get_verify(self):
        if self._verify_jit is None:
            eng = self.engine
            kp = eng._kernel_path

            @partial(jax.jit, donate_argnums=(2,))
            def _verify(params, tokens, cache, positions, n_real):
                from ..models.bitnet import forward_cache
                from ..models.bitnet import logits as model_logits

                h, cache = forward_cache(
                    eng.cfg, params, tokens, positions, cache, n_real, kp)
                lg = model_logits(eng.cfg, params, h, kp)   # [B, K1, V]
                return lg, cache

            self._verify_jit = _verify
        return self._verify_jit

    def _truncate(self, length: int) -> None:
        """Roll the cache's valid length back (rejected drafts stay as
        masked garbage and are overwritten next round)."""
        eng = self.engine
        eng.cache = dataclasses.replace(
            eng.cache, lengths=eng.cache.lengths.at[0].set(length))

    # -- generation -------------------------------------------------------------
    def generate(self, token_ids: list[int],
                 gen_cfg: GenerationConfig | None = None):
        """Greedy speculative decode.  Returns engine.GenerationResult."""
        from .engine import GenerationResult, TokenEvent

        eng = self.engine
        gen_cfg = gen_cfg or GenerationConfig(greedy=True)
        if not gen_cfg.is_greedy and self.spec_cfg.policy == "greedy":
            raise InferenceError(
                "greedy acceptance requires greedy generation; use "
                "policy='threshold' for sampled decoding")
        if gen_cfg.grammar:
            raise InferenceError(
                "grammar decoding is not supported with speculative "
                "decoding (draft tokens bypass the grammar mask)")
        if gen_cfg.logprobs is not None:
            raise InferenceError(
                "logprobs are not supported with speculative decoding "
                "(verify-step logits are consumed on device)")
        k = self.spec_cfg.num_draft_tokens
        S = eng.engine_cfg.max_seq_len
        B = eng.engine_cfg.max_batch_size

        eos = None
        if eng.tokenizer is not None:
            eos = getattr(eng.tokenizer, "eos_token_id", None)
        stop = StopCriteria(
            max_new_tokens=gen_cfg.max_new_tokens,
            eos_token_id=eos,
            stop_token_ids=frozenset(gen_cfg.stop_token_ids),
            stop_sequences=tuple(gen_cfg.stop_sequences),
        )

        lg = eng.prefill(token_ids)
        tokens = list(token_ids)
        out_tokens: list[int] = []
        verify = self._get_verify()
        next_tok = int(jnp.argmax(lg[0]))
        stop_reason = StopReason.MAX_TOKENS

        def emit(t: int) -> bool:
            nonlocal stop_reason
            piece = ""
            if eng.tokenizer is not None:
                piece = eng.tokenizer.token_to_piece(t)
            # check BEFORE appending: stop tokens / EOS are not emitted,
            # mirroring generate_stream (engine.rs stop handling) — the
            # speculative path must stay lossless vs normal greedy output
            r = stop.check(t, piece)
            if r in (StopReason.STOP_TOKEN, StopReason.EOS):
                stop_reason = r
                return True
            out_tokens.append(t)
            tokens.append(t)
            if r is not None:
                stop_reason = r
                return True
            return False

        if emit(next_tok):
            return GenerationResult(
                token_ids=out_tokens, text=self._decode_text(out_tokens),
                stop_reason=stop_reason, prompt_tokens=len(token_ids),
                metrics={}, spec_stats=self.stats.as_dict())

        self.draft.begin(tokens)
        while True:
            n = len(tokens)
            if n + k + 1 > S:
                k_eff = S - n - 1
                if k_eff < 1:
                    stop_reason = StopReason.MAX_TOKENS
                    break
            else:
                k_eff = k

            draft = self.draft.propose(tokens, k_eff)
            self.stats.rounds += 1
            self.stats.proposed += k_eff

            # one target forward over [last_accepted, d1..dk]
            block = [tokens[-1]] + draft
            K1 = k_eff + 1
            toks = np.zeros((B, K1), np.int32)
            toks[0] = block
            pos = np.full((B, K1), S, np.int32)
            pos[0] = np.arange(n - 1, n + k_eff)
            n_real = np.zeros((B,), np.int32)
            n_real[0] = K1
            # lengths currently include tokens[-1] (written by previous
            # round/prefill); rewind by 1 so re-writing it keeps lengths exact
            self._truncate(n - 1)
            lg, eng.cache = verify(
                eng.params, jnp.asarray(toks), eng.cache, jnp.asarray(pos),
                jnp.asarray(n_real))
            eng.kernel_recorder.append(f"spec_verify_k{k_eff}")
            lg0 = np.asarray(lg[0], np.float32)        # [K1, V]

            # acceptance
            accepted = 0
            if self.spec_cfg.policy == "greedy":
                for i, d in enumerate(draft):
                    if int(np.argmax(lg0[i])) == d:
                        accepted += 1
                    else:
                        break
            else:
                for i, d in enumerate(draft):
                    row = lg0[i] - lg0[i].max()
                    p = np.exp(row)
                    p /= p.sum()
                    if p[d] >= self.spec_cfg.accept_threshold:
                        accepted += 1
                    else:
                        break
            self.stats.accepted += accepted

            stopped = False
            for d in draft[:accepted]:
                if emit(d):
                    stopped = True
                    break
            if stopped:
                break

            # cache now holds n-1 + K1 entries; only n + accepted are real
            self._truncate(n + accepted)
            # next token comes from the first non-accepted position's logits
            next_tok = int(np.argmax(lg0[accepted]))
            if emit(next_tok):
                break

        return GenerationResult(
            token_ids=out_tokens, text=self._decode_text(out_tokens),
            stop_reason=stop_reason, prompt_tokens=len(token_ids),
            metrics={}, spec_stats=self.stats.as_dict())

    def _decode_text(self, ids: list[int]) -> str:
        if self.engine.tokenizer is None:
            return ""
        return self.engine.tokenizer.decode(ids)
