"""Multi-step on-device decode segments.

The reference's decode loop syncs with the host every token
(``engine.rs:1076-1231``).  On TPU that host round-trip dwarfs the device
step (measured ~0.4 s through the dev relay vs ~2 ms compute; ~1 ms even
colocated), so :meth:`InferenceEngine.generate_stream` runs decoding in
K-token SEGMENTS: one compiled ``lax.scan`` samples → appends → forwards
K times entirely on device, and the host only runs tokenizer/stop logic
on the returned K tokens.  Sampling threads the PRNG key stream and the
repetition history in-scan, so the produced tokens are bit-identical to K
single dispatches (tests/test_engine.py::test_multi_step_segment_parity).

The same pattern at pool scale lives in
``serve/scheduler.py::decode_multi``; this is the single-sequence engine
variant with the full :class:`SamplerChain`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.bitnet import forward_cache, logits as model_logits


def build_decode_segment(cfg: ModelConfig, kernel_path: str, sampler_chain,
                         n_steps: int, max_seq_len: int):
    """Compile a K-step decode segment.

    Returns ``segment(params, logits, cache, pos, history, key, active)``
    → ``(tokens [B, K], logits [B, V], cache, pos, history, key)`` where
    ``tokens[:, j]`` is the j-th sampled token.  ``active`` [B] bool masks
    live rows (padding rows neither write cache nor advance position).
    The caller samples from the RETURNED logits on the next dispatch, so
    chaining segments reproduces the single-step loop exactly.
    """
    S = max_seq_len

    @partial(jax.jit, donate_argnums=(2,))
    def segment(params, logits, cache, pos, history, key, active):
        def body(carry, _):
            lg, pos, cache, hist, key = carry
            key, sub = jax.random.split(key)
            nxt = sampler_chain.sample(lg, hist, sub)        # [B]
            tok = nxt[:, None].astype(jnp.int32)
            positions = jnp.where(active, pos, S)[:, None]   # pad → OOB drop
            h, cache = forward_cache(
                cfg, params, tok, positions, cache,
                active.astype(jnp.int32), kernel_path)
            lg2 = model_logits(cfg, params, h, kernel_path)[:, -1, :]
            hist = jnp.where(
                active[:, None],
                jnp.concatenate([hist[:, 1:], nxt[:, None]], axis=1), hist)
            pos = pos + active.astype(pos.dtype)
            return (lg2, pos, cache, hist, key), nxt

        (logits, pos, cache, history, key), toks = jax.lax.scan(
            body, (logits, pos, cache, history, key), None, length=n_steps)
        return toks.T, logits, cache, pos, history, key

    return segment
