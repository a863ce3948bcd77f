"""End-to-end SERVING throughput on the real chip.

Unlike bench.py (which times the jitted decode step alone), this drives
the continuous-batching scheduler exactly like the HTTP server does —
admission prefills, pooled sampling, per-token host round-trips, stop
handling — and reports aggregate generated tokens/s over a closed-loop
offered load.  The gap between this number and bench.py's B=N decode row
is the serving overhead (host scheduling + sampling readback).

Usage:  python tools/serving_bench.py [--slots 8] [--requests 24]
        [--new-tokens 64] [--prompt-len 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument("--pipeline-depth", type=int, default=1)
    args = ap.parse_args()

    import numpy as np

    import bench
    from bitnet_tpu.config import EngineConfig, GenerationConfig
    from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler

    t0 = time.time()
    cfg, params = bench.build_synthetic_2b(fuse=True)
    print(f"# model built in {time.time()-t0:.1f}s", file=sys.stderr)

    ecfg = EngineConfig(max_seq_len=args.seq_len, kernel_path="auto",
                        logits_dtype="int8")
    sched = ContinuousBatchingScheduler(
        cfg, params, None, ecfg, num_slots=args.slots,
        max_admissions_per_step=2,
        decode_steps_per_dispatch=args.steps_per_dispatch,
        pipeline_depth=args.pipeline_depth)
    rng = np.random.default_rng(0)
    gen = GenerationConfig(max_new_tokens=args.new_tokens, greedy=True)
    prompts = [rng.integers(1, cfg.vocab_size,
                            args.prompt_len).tolist()
               for _ in range(args.requests)]
    try:
        # warm the compiled programs with one request end-to-end
        warm = sched.submit(prompts[0], GenerationConfig(
            max_new_tokens=2, greedy=True))
        while not warm.out.get(timeout=1800)[2]:
            pass
        print("# programs warm; starting timed run", file=sys.stderr)

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
                        # NOTE: queue-drain order makes later requests'
                        # TTFT include time their first token sat in the
                        # queue — an upper bound, which is the honest
                        # direction for a latency SLO
                        ttfts.append(time.time() - submit_t[id(r)])
                        first = False
                    done_tokens += 1
                if done:
                    break
        dt = time.time() - t0
    finally:
        sched.shutdown()

    import json
    ttfts.sort()
    print(json.dumps({
        "metric": "serving aggregate generated tokens/s "
                  "(continuous batching, greedy, end-to-end)",
        "value": round(done_tokens / dt, 1),
        "unit": "tok/s",
        "slots": args.slots,
        "requests": args.requests,
        "new_tokens_per_request": args.new_tokens,
        "total_tokens": done_tokens,
        "wall_s": round(dt, 2),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3) if ttfts else None,
        "ttft_p95_s": (round(ttfts[int(len(ttfts) * 0.95)], 3)
                       if ttfts else None),
        "decode_steps": sched.stats["decode_steps"],
        "steps_per_dispatch": args.steps_per_dispatch,
        "pipeline_depth": args.pipeline_depth,
    }))


if __name__ == "__main__":
    main()
