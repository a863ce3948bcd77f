"""Round-4 B=8 profile: where do the pallas whole-batch plans spend the
extra ~1.3-2.9 ms/step vs einsum?

MODE env selects the attention plan (exported BEFORE jax import):
  E8   einsum                       BITNET_BATCHED_ATTN=0
  V8   batched_v2 (stacked+scatter) BITNET_BATCHED_ATTN=v2
  VQ8  quant_batched_v2             BITNET_BATCHED_ATTN=v2 + int8 cache
Aggregates per-op device time from a jax.profiler chrome trace of a
24-step decode chain and prints the top 25 ops.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

MODE = os.environ.get("MODE", "V8")
if MODE == "E8":
    os.environ["BITNET_BATCHED_ATTN"] = "0"
else:
    os.environ["BITNET_BATCHED_ATTN"] = "v2"

import jax
import jax.numpy as jnp


def main():
    import bench

    print(f"backend={jax.default_backend()} MODE={MODE}", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    cfg, params = bench.build_synthetic_2b(fuse=True)
    from bitnet_tpu.models.bitnet import forward, logits as model_logits, \
        quantize_head
    params = quantize_head(params)

    quant = MODE == "VQ8"
    B, S = 8, 1024
    L = cfg.num_layers
    dt = jnp.int8 if quant else jnp.bfloat16
    kc0 = jnp.zeros((L, B, S, cfg.num_kv_heads, cfg.head_dim), dt)
    ks0 = (jnp.zeros((L, B, S, cfg.num_kv_heads), jnp.float32)
           if quant else None)

    N = 24

    @jax.jit
    def chain(prm, tok, kc, vc, ks, vs):
        def step(i, carry):
            tok, pos, kc, vc, ks, vs = carry
            h, kc, vc, ks, vs = forward(
                cfg, prm, tok[:, None], jnp.minimum(pos, S - 1)[:, None],
                kc, vc, jnp.minimum(pos, S - 1), 1, "w2a8", ks, vs)
            lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            return nxt, pos + 1, kc, vc, ks, vs
        carry = jax.lax.fori_loop(
            0, N, step, (tok, jnp.zeros((B,), jnp.int32), kc, vc, ks, vs))
        return carry[0]

    tok0 = jnp.zeros((B,), jnp.int32)
    vs0 = None if ks0 is None else jnp.zeros_like(ks0)
    r = chain(params, tok0, kc0, jnp.zeros_like(kc0), ks0, vs0)
    r.block_until_ready()

    tdir = f"/tmp/r4_trace_{MODE}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    r = chain(params, tok0, kc0, jnp.zeros_like(kc0), ks0, vs0)
    r.block_until_ready()
    jax.profiler.stop_trace()

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_ok = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if "XLA Ops" in nm or "TensorFlow Ops" in nm:
                    pid_ok.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") == "X" and ev.get("pid") in pid_ok
                    and "dur" in ev):
                agg[ev["name"]] += ev["dur"]
                total += ev["dur"]
    print(f"total traced op-us {total:.0f} ({N} steps "
          f"-> {total/N/1e3:.3f} ms/step)", flush=True)
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/N:9.1f} us/step  {name[:120]}", flush=True)


if __name__ == "__main__":
    main()
