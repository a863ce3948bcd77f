"""Round-4 B=1 decode ablation — where do the ~0.45 ms above the HBM
roofline go?  One config per process (ONLY=):

  R1     full default step (rope-fused bf16, int8 logits head)
  NOLG   next token faked from h (no logits head, no argmax)
  NOATT  attention kernel replaced by a qkv passthrough (no cache
         stream, no flash-decode) — logits still run
  NOSAMP argmax replaced by a constant token (logits still computed)
  S4     full default at S=4096 (long-context scaling check)
  Q1     full default + int8 KV cache
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

ONLY = os.environ.get("ONLY", "R1")

import jax


def main():
    import bench

    print(f"backend={jax.default_backend()} ONLY={ONLY}", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    cfg, params = bench.build_synthetic_2b(fuse=True)
    from bitnet_tpu.models.bitnet import quantize_head
    params = quantize_head(params)

    import jax.numpy as jnp

    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer

    B = 1
    S = 4096 if ONLY == "S4" else 1024
    quant = ONLY == "Q1"

    if ONLY == "NOATT":
        import bitnet_tpu.ops.decode_attention as da

        def fake_qkv(qkv, sin_row, cos_row, k_cache, v_cache, pos,
                     n_heads, interpret=False, chunk=None, n_kv=None):
            Bq = qkv.shape[0]
            D = 128
            KV = n_kv if n_kv else k_cache.shape[2]
            attn = qkv[:, : n_heads * D].reshape(Bq, n_heads, D)
            if k_cache.ndim == 3:
                z = jnp.zeros((Bq, KV, D), k_cache.dtype)
            else:
                z = jnp.zeros((Bq, KV, D), k_cache.dtype)
            return attn, z, z

        da.decode_attention_qkv = fake_qkv

    def bench_decode(n_hi=48, n_lo=12):
        L = cfg.num_layers
        dt = jnp.int8 if quant else jnp.bfloat16
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
            if ONLY == "NOLG":
                nxt = (jnp.sum(h[:, 0, :64], axis=-1).astype(jnp.int32)
                       % cfg.vocab_size)
            else:
                lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
                if ONLY == "NOSAMP":
                    nxt = (lg[:, 0].astype(jnp.int32) % cfg.vocab_size)
                else:
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
