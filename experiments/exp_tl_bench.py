"""BASELINE config #3 on-chip: TL table-lookup kernels on the 2B model.

Builds the bitnet-2B parameterization with TL per-32-block scale planes
(bench.build_synthetic kind="tl"), decodes through the SAME stacked scan
loop as qk256 (ternary_matmul_stacked_tl — bf16 activations, 2·sum32
zero-point correction), and times B=1 decode with the bf16 and the int8
KV cache (config #3 names "128-token generation with int8 KV-cache";
ms/token below IS that generation rate — the loop is the engine's).

Roofline note: TL streams the f32 scale planes with the codes — the
per-token floor is ~1.10 ms vs qk256's ~0.83 ms (bench._decode_bytes).

Usage:  ONLY=T timeout 2400 python experiments/exp_tl_bench.py   # bf16 KV
        ONLY=U timeout 2400 python experiments/exp_tl_bench.py   # int8 KV
(one config per process — see exp_round3b.py's stale-mix rationale)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import jax


def main():
    import bench

    print(f"backend={jax.default_backend()}", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    cfg, params = bench.build_synthetic("2b", fuse=True, kind="tl")
    from bitnet_tpu.models.bitnet import quantize_head
    params = quantize_head(params)

    import jax.numpy as jnp

    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer

    roof_ms = bench._decode_bytes(cfg, kind="tl") / (bench._HBM_GBPS
                                                     * 1e9) * 1e3

    def bench_decode_q(B=1, S=1024, n_hi=48, n_lo=12):
        L = cfg.num_layers
        kc0 = jnp.zeros((L, B, S, cfg.num_kv_heads, cfg.head_dim), jnp.int8)
        ks0 = jnp.zeros((L, B, S, cfg.num_kv_heads), jnp.float32)

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
                    ks0, jnp.zeros_like(ks0))

        return chain_timer(step, mk, n_hi, n_lo, pairs=3, const_arg=params)

    only = os.environ.get("ONLY", "TU")
    if "T" in only:
        t = bench.bench_decode(cfg, params, "w2a8", B=1)
        print(f"T TL 2B decode B=1 bf16-KV: {t*1e3:7.3f} ms/token = "
              f"{1/t:7.1f} tok/s ({roof_ms/(t*1e3)*100:.0f}% of "
              f"~{roof_ms:.2f} ms TL roofline)", flush=True)
    if "U" in only:
        t = bench_decode_q()
        print(f"U TL 2B decode B=1 int8-KV: {t*1e3:7.3f} ms/token = "
              f"{1/t:7.1f} tok/s (128-token generation rate)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
