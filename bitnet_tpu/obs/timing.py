"""Hardened TPU timing utilities.

Measuring through the axon relay has three traps (discovered empirically,
see .claude/skills/verify/SKILL.md):
1. ``block_until_ready`` returns at submission, not completion;
2. the relay memoizes (executable, inputs) pairs — repeated identical calls
   return cached results instantly;
3. per-call round-trip noise is ~10-100 ms.

Honest recipe: put N iterations of the op in ONE jit via ``lax.fori_loop``
with a data-dependence chain, fetch a scalar (forces completion), vary the
inputs for every call, and difference two loop lengths to cancel the fixed
round-trip + dispatch cost.  Relay noise is ADDITIVE-ONLY (queueing +
transport never make a call faster), so the estimator differences the
MINIMUM observed time at each loop length — the median estimator it
replaces went negative under relay drift with few pairs (round 5,
B=16 int8 row: -0.005 ms/step).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def chain_timer(
    step_fn: Callable,        # (carry) or (const, carry) -> carry
    make_carry: Callable,     # (i: int) -> fresh carry pytree
    n_hi: int,
    n_lo: int,
    pairs: int = 3,
    const_arg=None,           # large pytree (params!) passed as a jit ARG
) -> float:
    """Median seconds per single ``step_fn`` application.

    ``const_arg`` exists because closing over model parameters bakes them
    into the HLO as constants — the axon relay then ships the full weight
    blob inside the remote_compile request and rejects it with HTTP 413.
    Anything large must be an argument, never a closure.
    """

    @partial(jax.jit, static_argnames=("n",))
    def chain(const, carry, n):
        if const is None:
            body = lambda i, c: step_fn(c)
        else:
            body = lambda i, c: step_fn(const, c)
        carry = jax.lax.fori_loop(0, n, body, carry)
        leaf = jax.tree.leaves(carry)[0]
        return leaf.reshape(-1)[0].astype(jnp.float32)

    # warm up compiles for both loop lengths
    float(chain(const_arg, make_carry(10_001), n_lo))
    float(chain(const_arg, make_carry(10_002), n_hi))

    def measure(n_hi_m: int, n_pairs: int, salt: int) -> float:
        his, los = [], []
        for p in range(n_pairs):
            t0 = time.perf_counter()
            float(chain(const_arg, make_carry(salt + 2 * p), n_hi_m))
            his.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(chain(const_arg, make_carry(salt + 2 * p + 1), n_lo))
            los.append(time.perf_counter() - t0)
        return (min(his) - min(los)) / (n_hi_m - n_lo)

    est = measure(n_hi, max(pairs, 3), 0)
    if est <= 0:
        # drift swamped the differencing: retry once with a 4x longer
        # high chain (compile is a one-off; signal grows, noise doesn't)
        float(chain(const_arg, make_carry(10_003), 4 * n_hi))
        est = measure(4 * n_hi, max(pairs, 3), 100)
    return est
