"""Decompose the scheduler's per-window cost (round 5).

Measured: a 16-step decode window at B=16 costs ~480-580 ms wall while
the engine-bound chain says 16 x 2.3 = 37 ms of device compute.  This
probe times the SAME decode_multi program shape under ablations:

  A  full pooled sampler (sort/top-k/top-p/min-p), n_steps=16
  B  argmax-only sampler, n_steps=16
  C  no sampler at all (argmax token, no keys/history), n_steps=16
  D  full sampler, n_steps=1 (fixed-cost reference)
  E  A again but WITHOUT reading outputs between calls (async chain)

Each timed over 6 calls (min), fresh token inputs to dodge relay
memoization.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t_min(fn, n=6):
    fn(0)
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import bench
    from bitnet_tpu.engine.cache import allocate_cache
    from bitnet_tpu.models.bitnet import (forward, quantize_head,
                                          logits as model_logits)

    print(f"backend={jax.default_backend()}", flush=True)
    cfg, params = bench.build_synthetic_2b(fuse=True)
    params = quantize_head(params)
    B, S, V = 16, 1024, cfg.vocab_size
    kp = "w2a8"
    cache0 = allocate_cache(cfg, B, S, "int8", layout="auto")
    HW = 64

    def fwd_step(prm, tokens, positions, cache, active):
        pos_in = jnp.where(active, positions, S)
        h, k, v, ks, vs = forward(
            cfg, prm, tokens[:, None], pos_in[:, None], cache.k, cache.v,
            positions, num_real_tokens=active.astype(jnp.int32),
            kernel_path=kp, k_scale=cache.k_scale, v_scale=cache.v_scale)
        cache = dataclasses.replace(
            cache, k=k, v=v, k_scale=ks, v_scale=vs,
            lengths=cache.lengths + active.astype(jnp.int32))
        raw = model_logits(cfg, prm, h, kp)[:, 0, :].astype(jnp.float32)
        return raw, cache

    def full_sample(raw, history, keys, temps, top_ks, top_ps, min_ps,
                    reps):
        hist = jnp.where(history < 0, V, history)
        counts = jnp.zeros((B, V + 1), raw.dtype).at[
            jnp.arange(B)[:, None], hist].add(1.0)[:, :V]
        seen = counts > 0
        pen = jnp.where(raw > 0, raw / reps[:, None], raw * reps[:, None])
        lg = jnp.where(seen, pen, raw)
        greedy_tok = jnp.argmax(lg, -1).astype(jnp.int32)
        t = jnp.maximum(temps[:, None], 1e-6)
        lt = lg / t
        sort = jnp.sort(lt, axis=-1)[:, ::-1]
        k_eff = jnp.where((top_ks <= 0) | (top_ks >= V), V,
                          jnp.clip(top_ks, 1, V))
        kth = jnp.take_along_axis(sort, (k_eff - 1)[:, None], axis=1)
        masked_sorted = jnp.where(sort < kth, -1e30, sort)
        lt = jnp.where(lt < kth, -1e30, lt)
        probs = jax.nn.softmax(masked_sorted, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_ps[:, None]
        thr = jnp.min(jnp.where(keep, masked_sorted, jnp.inf), -1,
                      keepdims=True)
        lt = jnp.where(lt < thr, -1e30, lt)
        sp = jax.nn.softmax(lt, -1)
        lt = jnp.where(sp < min_ps[:, None] * jnp.max(sp, -1, keepdims=True),
                       -1e30, lt)
        splits = jax.vmap(lambda kk: jax.random.split(kk, 2))(keys)
        new_keys, subs = splits[:, 0], splits[:, 1]
        sampled = jax.vmap(
            lambda kk, row: jax.random.categorical(kk, row[None, :])[0]
        )(subs, lt).astype(jnp.int32)
        nxt = jnp.where(temps <= 0.0, greedy_tok, sampled)
        return nxt, new_keys

    def make_window(mode, n_steps):
        @partial(jax.jit, donate_argnums=(2,), static_argnames=())
        def win(prm, tokens, cache, positions, history, keys, temps,
                top_ks, top_ps, min_ps, reps, active):
            def one(carry, _):
                tokens, positions, cache, history, keys = carry
                raw, cache = fwd_step(prm, tokens, positions, cache,
                                      active)
                if mode == "full":
                    nxt, keys = full_sample(raw, history, keys, temps,
                                            top_ks, top_ps, min_ps, reps)
                    history = jnp.where(
                        active[:, None],
                        jnp.concatenate([history[:, 1:], nxt[:, None]], 1),
                        history)
                elif mode == "argmax_keys":
                    nxt = jnp.argmax(raw, -1).astype(jnp.int32)
                    splits = jax.vmap(
                        lambda kk: jax.random.split(kk, 2))(keys)
                    keys = splits[:, 0]
                    history = jnp.where(
                        active[:, None],
                        jnp.concatenate([history[:, 1:], nxt[:, None]], 1),
                        history)
                else:                      # bare argmax
                    nxt = jnp.argmax(raw, -1).astype(jnp.int32)
                positions = positions + active.astype(positions.dtype)
                tokens = jnp.where(active, nxt, tokens)
                return (tokens, positions, cache, history, keys), nxt

            (tokens, positions, cache, history, keys), seq = jax.lax.scan(
                one, (tokens, positions, cache, history, keys), None,
                length=n_steps)
            return seq, keys, cache

        return win

    rng = np.random.default_rng(0)
    active = jnp.ones((B,), bool)
    temps = jnp.zeros((B,), jnp.float32)
    top_ks = jnp.zeros((B,), jnp.int32)
    top_ps = jnp.ones((B,), jnp.float32)
    min_ps = jnp.zeros((B,), jnp.float32)
    reps = jnp.ones((B,), jnp.float32)
    hist0 = jnp.full((B, HW), -1, jnp.int32)
    keys0 = jnp.zeros((B, 2), jnp.uint32)
    pos0 = jnp.full((B,), 512, jnp.int32)

    for label, mode, n_steps, read in [
            ("D full sampler n=1    ", "full", 1, True),
            ("A full sampler n=16   ", "full", 16, True),
            ("B argmax+keys n=16    ", "argmax_keys", 16, True),
            ("C bare argmax n=16    ", "bare", 16, True),
            ("E full n=16 4x async  ", "full", 16, False)]:
        win = make_window(mode, n_steps)
        cache = allocate_cache(cfg, B, S, "int8", layout="auto")

        state = {"cache": cache}

        def call(i, win=win, state=state, read=read):
            toks = jnp.asarray(
                rng.integers(1, V, size=B).astype(np.int32))
            if read:
                seq, keys, state["cache"] = win(
                    params, toks, state["cache"], pos0, hist0, keys0,
                    temps, top_ks, top_ps, min_ps, reps, active)
                np.asarray(seq)
            else:
                outs = []
                c = state["cache"]
                for _ in range(4):
                    seq, keys, c = win(
                        params, toks, c, pos0, hist0, keys0, temps,
                        top_ks, top_ps, min_ps, reps, active)
                    outs.append(seq)
                state["cache"] = c
                np.asarray(outs[-1])

        ms = t_min(call)
        per = ms / (4 if not read else 1)
        print(f"{label}: {ms:8.1f} ms/call  ({per:8.1f} ms/window)",
              flush=True)


if __name__ == "__main__":
    main()
