"""Round-5 colocated serving sweep (VERDICT r4 next-round #1).

One process: build the synthetic 2B once, then for each (slots,
steps_per_dispatch) config drive the REAL continuous-batching scheduler
closed-loop and record aggregate generated tok/s + TTFT percentiles.

For the efficiency denominator the same process measures the raw engine
bound — bench.bench_decode at B=slots (chained on-device steps, no host
round-trips) — and a single-dispatch host latency probe that isolates
the per-dispatch host+relay overhead, so the output decomposes

    serving ms/token = device ms/step / slots  +  host overhead

Usage:
  python experiments/exp_r5_serving.py [--configs 8:8,16:8,32:8,...]
                                       [--out /tmp/r5_serving.json]
Each run appends one JSON line to --out (and stdout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_dispatch_latency(sched, n: int = 20) -> dict:
    """Median wall time of ONE scheduler step (blocking read included):
    this is what every decode dispatch pays — device step + host glue +
    relay RTT when the chip is remote."""
    times = []
    B = sched.B
    zero_keys = np.zeros((B, 2), np.uint32)
    for _ in range(n):
        t0 = time.perf_counter()
        sched._step(zero_keys)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"step_wall_ms_p50": round(times[len(times) // 2] * 1e3, 3),
            "step_wall_ms_min": round(times[0] * 1e3, 3)}


def run_config(cfg, params, slots: int, spd: int, requests: int,
               new_tokens: int, prompt_len: int, seq_len: int,
               chunked: int | None, depth: int = 1) -> dict:
    from bitnet_tpu.config import EngineConfig, GenerationConfig
    from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler

    ecfg = EngineConfig(max_seq_len=seq_len, kernel_path="auto",
                        logits_dtype="int8", max_batch_size=slots,
                        kv_cache_dtype="auto")
    sched = ContinuousBatchingScheduler(
        cfg, params, None, ecfg, num_slots=slots,
        max_admissions_per_step=8,
        decode_steps_per_dispatch=spd,
        chunked_prefill=chunked,
        pipeline_depth=depth)
    rng = np.random.default_rng(0)
    gen = GenerationConfig(max_new_tokens=new_tokens, greedy=True)
    prompts = [rng.integers(1, cfg.vocab_size, prompt_len).tolist()
               for _ in range(requests)]
    try:
        warm = sched.submit(prompts[0], GenerationConfig(
            max_new_tokens=2 * spd, greedy=True))
        while not warm.out.get(timeout=1800)[2]:
            pass
        print(f"# slots={slots} spd={spd}: warm; timed run",
              file=sys.stderr, flush=True)

        t0 = time.time()
        submit_t = {}
        reqs = []
        for p in prompts:
            r = sched.submit(p, gen)
            submit_t[id(r)] = time.time()
            reqs.append(r)
        done_tokens = 0
        ttfts = []
        for r in reqs:
            first = True
            while True:
                tok, _, done, _ = r.out.get(timeout=1800)
                if tok is not None:
                    if first:
                        ttfts.append(time.time() - submit_t[id(r)])
                        first = False
                    done_tokens += 1
                if done:
                    break
        dt = time.time() - t0
        steps = sched.stats["decode_steps"]
        row = {
            "slots": slots, "steps_per_dispatch": spd,
            "pipeline_depth": depth,
            "requests": requests, "new_tokens": new_tokens,
            "prompt_len": prompt_len,
            "serving_tok_s": round(done_tokens / dt, 1),
            "total_tokens": done_tokens, "wall_s": round(dt, 2),
            "decode_steps": steps,
            "chunked_prefill": chunked,
        }
        ttfts.sort()
        if ttfts:
            row["ttft_p50_s"] = round(ttfts[len(ttfts) // 2], 3)
            row["ttft_p95_s"] = round(ttfts[int(len(ttfts) * 0.95)], 3)
        # per-dispatch wall latency with a full pool (requests are done,
        # so re-fill the pool briefly)
        refill = [sched.submit(p, GenerationConfig(
            max_new_tokens=512, greedy=True)) for p in prompts[:slots]]
        time.sleep(1.0)
        sched.pause()
        row.update(measure_dispatch_latency(sched))
        for r in refill:
            r.cancel()
        sched.unpause()
        time.sleep(0.5)
    finally:
        sched.shutdown()
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8:1,8:4,8:8,16:8,32:8,16:16")
    ap.add_argument("--requests-mult", type=int, default=3)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--chunked", type=int, default=256)
    ap.add_argument("--engine-bound", action="store_true",
                    help="also measure bench_decode at each distinct B")
    ap.add_argument("--out", default="/tmp/r5_serving.jsonl")
    ap.add_argument("--size", default="2b")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import bench

    t0 = time.time()
    cfg, params = bench.build_synthetic(args.size, fuse=True)
    print(f"# model built in {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    configs = []
    for part in args.configs.split(","):
        bits = [int(x) for x in part.split(":")]
        s, k = bits[0], bits[1]
        d = bits[2] if len(bits) > 2 else 1
        configs.append((s, k, d))

    out = open(args.out, "a")
    if args.engine_bound:
        import jax.numpy as jnp

        from bitnet_tpu.engine.cache import allocate_cache
        from bitnet_tpu.models.bitnet import (forward,
                                              logits as model_logits)
        from bitnet_tpu.obs.timing import chain_timer

        def bound_q(B, S, dtype):
            """Quantized-KV engine bound with the POOL's auto layout —
            the denominator the serving rows are judged against."""
            c0 = allocate_cache(cfg, B, S, dtype, layout="auto")

            def step(prm, carry):
                tok, pos, kc, vc, ks, vs = carry
                h, kc, vc, ks, vs = forward(
                    cfg, prm, tok[:, None],
                    jnp.minimum(pos, S - 1)[:, None], kc, vc,
                    jnp.minimum(pos, S - 1), 1, "w2a8", ks, vs)
                lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                return nxt, pos + 1, kc, vc, ks, vs

            def mk(i):
                return (jnp.full((B,), (i * 7) % cfg.vocab_size,
                                 jnp.int32),
                        jnp.zeros((B,), jnp.int32), c0.k,
                        jnp.zeros_like(c0.k), c0.k_scale,
                        None if c0.v_scale is None
                        else jnp.ones_like(c0.v_scale))

            return chain_timer(step, mk, 24, 6, pairs=2,
                               const_arg=params)

        for B in sorted({s for s, _, _ in configs}):
            row = {"engine_bound_B": B}
            try:
                dt_bf16 = bench.bench_decode(cfg, params, "w2a8", B=B,
                                             S=args.seq_len, n_hi=24,
                                             n_lo=6)
                row["device_ms_per_step_bf16"] = round(dt_bf16 * 1e3, 3)
                row["engine_bound_tok_s_bf16"] = round(B / dt_bf16, 1)
            except Exception as e:
                row["bf16_error"] = repr(e)[:200]
            if B > 2:       # pools ride int8 KV under kv_cache_dtype=auto
                try:
                    dt_i8 = bound_q(B, args.seq_len, "int8")
                    row["device_ms_per_step_int8"] = round(dt_i8 * 1e3, 3)
                    row["engine_bound_tok_s_int8"] = round(B / dt_i8, 1)
                except Exception as e:
                    row["int8_error"] = repr(e)[:200]
            print(json.dumps(row), flush=True)
            out.write(json.dumps(row) + "\n")
            out.flush()

    for slots, spd, depth in configs:
        try:
            row = run_config(cfg, params, slots, spd,
                             args.requests_mult * slots,
                             args.new_tokens, args.prompt_len,
                             args.seq_len,
                             args.chunked if args.chunked > 0 else None,
                             depth=depth)
        except Exception as e:  # keep the sweep alive
            row = {"slots": slots, "steps_per_dispatch": spd,
                   "pipeline_depth": depth, "error": repr(e)}
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
