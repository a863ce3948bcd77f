"""Logit transforms and sampling.

Functional parity with the reference's pure-function stack:
- ``bitnet-logits`` (``src/lib.rs:54-337``): temperature, top-k, top-p,
  min-p, typical-p, repetition penalty, softmax, argmax
- ``bitnet-sampling`` (``src/strategies.rs:37-340``): composable
  ``SamplerChain`` with Min-P / Typical / Mirostat v1+v2 stages

TPU-first: every transform is a jit-able ``[B, V] -> [B, V]`` jnp function
(static shapes, no data-dependent control flow) so the whole sampler chain
runs on-device inside the decode step — no logits roundtrip to host, unlike
the reference's host-side Vec<f32> pipeline.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import GenerationConfig

NEG_INF = -1e30


# --------------------------------------------------------------------------
# Pure transforms ([B, V] logits -> [B, V] logits)
# --------------------------------------------------------------------------
def apply_temperature(logits: jnp.ndarray, temperature: float | jnp.ndarray
                      ) -> jnp.ndarray:
    """Divide by temperature (reference: bitnet-logits/src/lib.rs:54)."""
    t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    return logits / t


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits, mask the rest (lib.rs:93).

    ``k <= 0`` disables.  Static k (compile-time constant).
    """
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus sampling mask (lib.rs:136).

    Keeps the smallest set of tokens whose cumulative probability ≥ p
    (always at least the argmax token).
    """
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i is kept if the cumulative mass BEFORE it is < p
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """Min-P: drop tokens with prob < min_p * max_prob
    (bitnet-sampling/src/strategies.rs:37)."""
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < min_p * pmax, NEG_INF, logits)


def apply_typical_p(logits: jnp.ndarray, typical_p: float) -> jnp.ndarray:
    """Typical sampling (strategies.rs:73): keep tokens whose surprisal is
    closest to the distribution entropy, up to cumulative mass typical_p."""
    if typical_p >= 1.0:
        return logits
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=-1, keepdims=True)
    dev = jnp.abs(-log_probs - entropy)
    order = jnp.argsort(dev, axis=-1)           # most typical first
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < typical_p
    # scatter the keep mask back to vocab order
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def apply_repetition_penalty(
    logits: jnp.ndarray,          # [B, V]
    history: jnp.ndarray,         # [B, W] recent token ids (pad with -1)
    penalty: float,
) -> jnp.ndarray:
    """Divide positive / multiply negative logits of recent tokens
    (bitnet-logits/src/lib.rs:239)."""
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    hist = jnp.where(history < 0, V, history)  # OOB for padding → dropped
    counts = jnp.zeros((B, V + 1), logits.dtype).at[
        jnp.arange(B)[:, None], hist
    ].add(1.0)[:, :V]
    seen = counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_presence_frequency(
    logits: jnp.ndarray,          # [B, V]
    history: jnp.ndarray,         # [B, W] recent token ids (pad with -1)
    frequency_penalty: float,
    presence_penalty: float,
) -> jnp.ndarray:
    """OpenAI-style additive penalties over the recent-history window:
    ``logits -= frequency_penalty * count + presence_penalty * (count > 0)``
    (llama-cpp / OpenAI semantics; the reference accepts both knobs in its
    llama-compat surface, bitnet-py/src/llama_compat.py:121-122)."""
    if frequency_penalty == 0.0 and presence_penalty == 0.0:
        return logits
    B, V = logits.shape
    hist = jnp.where(history < 0, V, history)  # OOB for padding → dropped
    counts = jnp.zeros((B, V + 1), logits.dtype).at[
        jnp.arange(B)[:, None], hist
    ].add(1.0)[:, :V]
    return (logits - frequency_penalty * counts
            - presence_penalty * (counts > 0))


def apply_logit_bias(
    logits: jnp.ndarray,                        # [B, V]
    bias: tuple[tuple[int, float], ...],
) -> jnp.ndarray:
    """Add per-token biases (OpenAI ``logit_bias``).  ``bias`` is a static
    tuple of (token_id, value) pairs baked into the compiled sampler; a
    value <= -100 is treated as a hard ban (-inf), >= 100 as forced-keep
    scaling, matching the OpenAI API contract."""
    if not bias:
        return logits
    V = logits.shape[-1]
    ids = jnp.asarray([t for t, _ in bias if t < V], jnp.int32)
    vals = jnp.asarray([v for t, v in bias if t < V], jnp.float32)
    if ids.size == 0:
        return logits
    vec = jnp.zeros((V,), jnp.float32).at[ids].add(vals)
    out = logits + vec
    # hard ban for -100-and-below, per the OpenAI contract
    ban = jnp.zeros((V,), bool).at[ids].set(vals <= -100.0)
    return jnp.where(ban, NEG_INF, out)


def softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(logits, axis=-1)


def argmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def logprob_entry(row, tok_id: int, n: int) -> tuple[float, list]:
    """Log-softmax logprob of ``tok_id`` plus the top-``n`` alternatives
    ``[(token_id, logprob)]`` (highest first) from a raw logits row.

    Host-side numpy: used by the engine/scheduler logprobs paths, which
    report the *model's* distribution (pre-penalty/mask), the same
    convention as OpenAI completions and llama.cpp.  The reference only
    stubs this (``bitnet-server/src/sse.rs:102`` hardcodes None).
    """
    import numpy as np

    row = np.asarray(row, np.float32).reshape(-1)
    m = float(row.max())
    lp = row - (m + np.log(np.exp(row - m).sum()))
    top = []
    if n > 0:
        k = min(n, lp.size)
        idx = np.argpartition(-lp, k - 1)[:k]
        idx = idx[np.argsort(-lp[idx])]
        top = [(int(i), float(lp[i])) for i in idx]
    return float(lp[tok_id]), top


# --------------------------------------------------------------------------
# Sampler chain
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SamplerChain:
    """Composable sampling pipeline compiled into the decode step.

    Transform order mirrors the reference chain
    (``bitnet-inference/src/sampling.rs`` + strategies): repetition penalty →
    temperature → top-k → top-p → min-p → typical-p → categorical/greedy.
    """

    config: GenerationConfig

    def transform(self, logits: jnp.ndarray, history: jnp.ndarray
                  ) -> jnp.ndarray:
        c = self.config
        logits = logits.astype(jnp.float32)
        logits = apply_logit_bias(logits, c.logit_bias)
        logits = apply_repetition_penalty(logits, history, c.repetition_penalty)
        logits = apply_presence_frequency(
            logits, history, c.frequency_penalty, c.presence_penalty)
        if c.is_greedy:
            return logits
        logits = apply_temperature(logits, c.temperature)
        logits = apply_top_k(logits, c.top_k)
        logits = apply_top_p(logits, c.top_p)
        logits = apply_min_p(logits, c.min_p)
        logits = apply_typical_p(logits, c.typical_p)
        return logits

    def sample(
        self,
        logits: jnp.ndarray,      # [B, V]
        history: jnp.ndarray,     # [B, W]
        key: jax.Array,
    ) -> jnp.ndarray:
        """Returns sampled token ids [B]."""
        t = self.transform(logits, history)
        if self.config.is_greedy:
            return argmax(t)
        return jax.random.categorical(key, t, axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------
# Mirostat (v1/v2) — stateful, host-side wrapper around on-device transforms
# --------------------------------------------------------------------------
@dataclasses.dataclass
class MirostatState:
    """Adaptive-entropy sampling state (strategies.rs:109-215).

    Mirostat adjusts a dynamic truncation ``mu`` toward a target surprise
    ``tau``.  State is per-sequence and updated after every sampled token.
    """

    tau: float = 5.0
    eta: float = 0.1
    mu: float = 10.0          # 2 * tau by convention
    version: int = 2

    @classmethod
    def from_config(cls, cfg: GenerationConfig) -> "MirostatState":
        return cls(tau=cfg.mirostat_tau, eta=cfg.mirostat_eta,
                   mu=2.0 * cfg.mirostat_tau, version=cfg.mirostat)

    def sample(self, logits_row: jnp.ndarray, key: jax.Array) -> int:
        """Sample one token from one row of logits; updates ``mu``."""
        logp = jax.nn.log_softmax(logits_row.astype(jnp.float32))
        if self.version == 2:
            # v2: truncate tokens with surprise > mu
            masked = jnp.where(-logp / jnp.log(2.0) > self.mu, NEG_INF, logp)
        else:
            # v1: estimate s from top-100 Zipf fit, compute k, truncate
            top = jax.lax.top_k(logp, min(100, logp.shape[-1]))[0]
            # crude Zipf exponent estimate from successive ratios
            idx = jnp.arange(1, top.shape[-1], dtype=jnp.float32)
            b = (top[:-1] - top[1:]) / jnp.log1p(1.0 / idx)
            s_hat = jnp.clip(jnp.mean(b), 1.01, 10.0)
            eps = s_hat - 1.0
            n = logp.shape[-1]
            k = jnp.power(
                (eps * jnp.power(2.0, self.mu)) / (1 - jnp.power(n, -eps)),
                1.0 / s_hat,
            )
            kth = jax.lax.top_k(
                logp, logp.shape[-1]
            )[0][jnp.clip(k.astype(jnp.int32), 1, logp.shape[-1]) - 1]
            masked = jnp.where(logp < kth, NEG_INF, logp)
        tok = int(jax.random.categorical(key, masked))
        surprise = float(-logp[tok] / jnp.log(2.0))
        self.mu -= self.eta * (surprise - self.tau)
        return tok
