"""Profile the rows-mode decode step + long-context int8 ablation.

1. jax.profiler trace of a 48-step B=1 decode chain → per-op duration
   aggregate (what's left between 1.51 ms and the 0.83 ms roofline?)
2. S=4096 decode: rows-mode bf16 vs int8 in-kernel (VERDICT #2: the
   long-context row must improve proportionally).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import bench

    print(f"backend={jax.default_backend()}", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    cfg, params = bench.build_synthetic_2b(fuse=True)
    from bitnet_tpu.models.bitnet import forward, logits as model_logits, \
        quantize_head
    params = quantize_head(params)

    mode = os.environ.get("MODE", "profile")

    if mode == "profile":
        B, S = 1, int(os.environ.get("S", "1024"))
        kc0 = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads,
                         cfg.head_dim), jnp.bfloat16)

        @jax.jit
        def chain(prm, tok, kc, vc):
            def step(i, carry):
                tok, pos, kc, vc = carry
                h, kc, vc, _, _ = forward(
                    cfg, prm, tok[:, None], jnp.minimum(pos, S - 1)[:, None],
                    kc, vc, jnp.minimum(pos, S - 1), 1, "w2a8")
                lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                return nxt, pos + 1, kc, vc
            tok, pos, kc, vc = jax.lax.fori_loop(
                0, 48, step, (tok, jnp.zeros((B,), jnp.int32), kc, vc))
            return tok

        tok0 = jnp.zeros((B,), jnp.int32)
        r = chain(params, tok0, kc0, jnp.zeros_like(kc0))
        r.block_until_ready()
        tdir = "/tmp/rows_trace"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        r = chain(params, tok0, kc0, jnp.zeros_like(kc0))
        r.block_until_ready()
        jax.profiler.stop_trace()

        files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
        print("trace files:", files, flush=True)
        agg = {}
        for f in files:
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            for ev in data.get("traceEvents", []):
                if ev.get("ph") != "X" or "dur" not in ev:
                    continue
                name = ev.get("name", "?")
                pid = ev.get("pid", 0)
                agg.setdefault(name, [0.0, 0])
                agg[name][0] += ev["dur"]
                agg[name][1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for _, v in rows)
        print(f"total traced op-us {total:.0f} (48 steps)")
        for name, (dur, cnt) in rows[:45]:
            print(f"  {dur/48:9.1f} us/step  x{cnt:5d}  {name[:90]}")
        return

    # long-context timing
    from bitnet_tpu.obs.timing import chain_timer

    S = int(os.environ.get("S", "4096"))
    B = 1

    def bench_decode_any(dtype, quant):
        L = cfg.num_layers
        kc0 = jnp.zeros((L, B, S, cfg.num_kv_heads, cfg.head_dim), dtype)
        ks0 = (jnp.zeros((L, B, S, cfg.num_kv_heads), jnp.float32)
               if quant else None)

        def step(prm, carry):
            tok, pos, kc, vc, ks, vs = carry
            h, kc, vc, ks, vs = forward(
                cfg, prm, tok[:, None], jnp.minimum(pos, S - 1)[:, None],
                kc, vc, jnp.minimum(pos, S - 1), 1, "w2a8", ks, vs)
            lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            return nxt, pos + 1, kc, vc, ks, vs

        def mk(i):
            return (jnp.full((B,), (i * 7) % cfg.vocab_size, jnp.int32),
                    jnp.zeros((B,), jnp.int32), kc0, jnp.zeros_like(kc0),
                    ks0, None if ks0 is None else jnp.zeros_like(ks0))

        return chain_timer(step, mk, 48, 12, pairs=3, const_arg=params)

    t_bf = bench_decode_any(jnp.bfloat16, False)
    print(f"S={S} rows bf16: {t_bf*1e3:7.3f} ms/tok = {1/t_bf:6.1f} tok/s",
          flush=True)
    t_i8 = bench_decode_any(jnp.int8, True)
    print(f"S={S} rows int8: {t_i8*1e3:7.3f} ms/tok = {1/t_i8:6.1f} tok/s",
          flush=True)


if __name__ == "__main__":
    main()
