"""On-chip decode-step profiler: trace a chained decode run and aggregate
XLA op durations by fusion name.

Round-2/3 methodology (memory: tpu-environment-quirks): S-level ablations
across separate runs lie through the relay (15-50% drift across hours);
only WITHIN-run profiles rank the components of a step honestly.  Key rows
to watch:
  fusion…dynamic-slice_bitcast…  scan weight/cache slice copies
  custom-call…                   pallas kernels (matmul/attention)
  copy…                          layout-change copies (rope-fused flip bug)

Usage:  python tools/profile_decode.py [B] [S]   (defaults 1, 1024)
Output: top-30 op groups by total µs/step + the step total.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(os.environ.get("PROFILE_STEPS", "24"))

    import jax
    import jax.numpy as jnp

    import bench
    from bitnet_tpu.models.bitnet import (
        forward, logits as model_logits, quantize_head,
    )

    print(f"backend={jax.default_backend()} B={B} S={S}", flush=True)
    cfg, params = bench.build_synthetic_2b(fuse=True)
    params = quantize_head(params)

    kc0 = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
                    jnp.bfloat16)

    @jax.jit
    def step(prm, carry):
        tok, pos, kc, vc = carry
        h, kc, vc, _, _ = forward(
            cfg, prm, tok[:, None], jnp.minimum(pos, S - 1)[:, None],
            kc, vc, jnp.minimum(pos, S - 1), 1, "w2a8")
        lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
        nxt = jnp.argmax(lg, -1).astype(jnp.int32)
        return nxt, pos + 1, kc, vc

    carry = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
             kc0, jnp.zeros_like(kc0))
    # compile + warm
    carry = step(params, carry)
    jax.block_until_ready(carry[0])

    tdir = "/tmp/bitnet_profile"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for _ in range(steps):
        carry = step(params, carry)
    jax.block_until_ready(carry[0])
    jax.profiler.stop_trace()

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO TRACE FILES (relay profiling unsupported?)", flush=True)
        return
    agg: dict[str, float] = {}
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            # keep device-lane events only (pid names vary; filter by
            # XLA-ish names)
            if not name or dur <= 0:
                continue
            key = name.split(".")[0][:60]
            agg[key] = agg.get(key, 0.0) + dur
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    print(f"-- top op groups (µs/step over {steps} steps) --", flush=True)
    for name, us in rows:
        print(f"{us/steps:9.1f}  {name}", flush=True)
    print(f"TOTAL {total/steps:9.1f} µs/step (sum of op durations; "
          "overlapping lanes double-count)", flush=True)


if __name__ == "__main__":
    main()
