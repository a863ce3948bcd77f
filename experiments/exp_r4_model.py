"""Round-4 full-model decode A/B: one config per process (ONLY=).
  E8    B=8 einsum attention (round-3 default)      BITNET_BATCHED_ATTN=0
  V8    B=8 plain v2 whole-batch (round-4 default)
  VQ8   B=8 plain v2 + int8 KV
  K8    B=8 rope-fused v2 (BITNET_BATCHED_ATTN=v2qkv)
  R1    B=1 rope-fused bf16 (shipped default)
  Q1    B=1 rope-fused int8
"""
from __future__ import annotations
import os, sys
sys.path.insert(0, "/root/repo")

ONLY = os.environ.get("ONLY", "V8")
ENV = {
    "E8": {"BITNET_BATCHED_ATTN": "0"},
    "V8": {"BITNET_BATCHED_ATTN": "v2"},
    "VQ8": {"BITNET_BATCHED_ATTN": "v2"},
    "K8": {"BITNET_BATCHED_ATTN": "v2qkv"},
    "R1": {},
    "Q1": {},
}[ONLY]
for k, v in ENV.items():
    os.environ[k] = v

import jax

def main():
    import bench
    print(f"backend={jax.default_backend()} ONLY={ONLY}", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    cfg, params = bench.build_synthetic_2b(fuse=True)
    from bitnet_tpu.models.bitnet import quantize_head
    params = quantize_head(params)

    import jax.numpy as jnp
    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer

    quant = ONLY in ("VQ8", "Q1")
    B = 1 if ONLY in ("R1", "Q1") else 8
    S = 1024

    def bench_decode(n_hi=48, n_lo=12):
        L = cfg.num_layers
        dt = jnp.int8 if quant else jnp.bfloat16
        if os.environ.get("CACHE", "flat") == "flat":
            kc0 = jnp.zeros(
                (L, B, S, cfg.num_kv_heads * cfg.head_dim), dt)
        else:
            kc0 = jnp.zeros((L, B, S, cfg.num_kv_heads, cfg.head_dim), dt)
        ks0 = (jnp.zeros((L, B, S, cfg.num_kv_heads), jnp.float32)
               if quant else None)

        def step(prm, carry):
            if quant:
                tok, pos, kc, vc, ks, vs = carry
            else:
                tok, pos, kc, vc = carry
                ks = vs = None
            h, kc, vc, ks, vs = forward(
                cfg, prm, tok[:, None], jnp.minimum(pos, S - 1)[:, None],
                kc, vc, jnp.minimum(pos, S - 1), 1, "w2a8", ks, vs)
            lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            if quant:
                return nxt, pos + 1, kc, vc, ks, vs
            return nxt, pos + 1, kc, vc

        def mk(i):
            base = (jnp.full((B,), (i * 7) % cfg.vocab_size, jnp.int32),
                    jnp.zeros((B,), jnp.int32), kc0, jnp.zeros_like(kc0))
            if quant:
                return base + (ks0, jnp.zeros_like(ks0))
            return base

        return chain_timer(step, mk, n_hi, n_lo, pairs=3, const_arg=params)

    dt_s = bench_decode()
    print(f"{ONLY}: {dt_s*1e3:.3f} ms/step = {B/dt_s:.1f} tok/s", flush=True)

if __name__ == "__main__":
    main()
