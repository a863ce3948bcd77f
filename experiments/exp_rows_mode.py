"""Round-3 cache-traffic ablation: rows-mode scan (read-only xs + post-scan
row scatter) vs the round-2 xs/ys threading, and in-kernel int8-KV dequant.

Expected from the copy model: xs/ys pays the per-layer cache slice copy
twice (read + restack); rows mode pays it once.  int8 KV halves the bytes
of both the slice copy and the kernel's HBM stream.
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
    cfg, params = bench.build_synthetic_2b(fuse=True)
    from bitnet_tpu.models.bitnet import quantize_head
    params = quantize_head(params)

    import jax.numpy as jnp

    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer

    def bench_decode_q(B, S=1024, dtype=jnp.int8):
        L = cfg.num_layers
        kc0 = jnp.zeros((L, B, S, cfg.num_kv_heads, cfg.head_dim), dtype)
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

        return chain_timer(step, mk, 48, 12, pairs=3, const_arg=params)

    runs = [
        ("A ys-mode    bf16 B=1 (round-2 baseline)",
         {"BITNET_CACHE_YS": "1"}, dict(B=1), False),
        ("B rows-mode  bf16 B=1",
         {"BITNET_CACHE_YS": "0"}, dict(B=1), False),
        ("R rows + rope-fused attn B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_ROPE_FUSED": "1"},
         dict(B=1), False),
        ("S rows + fused FFN B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_FUSED_FFN": "1"},
         dict(B=1), False),
        ("T rows + rope-fused + fused FFN B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_ROPE_FUSED": "1",
          "BITNET_FUSED_FFN": "1"}, dict(B=1), False),
        ("U rows + bkt rowcap 2560/4MB B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_BKT_ROWCAP": "2560",
          "BITNET_BKT_MBCAP": "4"}, dict(B=1), False),
        ("W rows + rope-fused + bkt 2560/4MB B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_ROPE_FUSED": "1",
          "BITNET_BKT_ROWCAP": "2560", "BITNET_BKT_MBCAP": "4"},
         dict(B=1), False),
        ("X rows + bkt 2560/8MB B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_BKT_ROWCAP": "2560",
          "BITNET_BKT_MBCAP": "8"}, dict(B=1), False),
        ("V rows + bkt rowcap 768/1MB B=1",
         {"BITNET_CACHE_YS": "0", "BITNET_BKT_ROWCAP": "768",
          "BITNET_BKT_MBCAP": "1"}, dict(B=1), False),
        ("C rows-mode  int8 B=1 (in-kernel dequant)",
         {"BITNET_CACHE_YS": "0"}, dict(B=1), True),
        ("D rows-mode  bf16 B=8 (pallas attn)",
         {"BITNET_CACHE_YS": "0", "BITNET_DECODE_ATTN_MAX_B": "16"},
         dict(B=8), False),
        ("E rows-mode  bf16 B=8 (einsum attn)",
         {"BITNET_CACHE_YS": "0", "BITNET_DECODE_ATTN_MAX_B": "0"},
         dict(B=8), False),
        ("F rows-mode  int8 B=8 (in-kernel dequant)",
         {"BITNET_CACHE_YS": "0", "BITNET_DECODE_ATTN_MAX_B": "16"},
         dict(B=8), True),
        ("G ys-mode    bf16 B=1 (drift re-check)",
         {"BITNET_CACHE_YS": "1"}, dict(B=1), False),
    ]
    only = os.environ.get("ONLY")
    for name, env, kw, quant in runs:
        if only and name[0] not in only:
            continue
        for k in ("BITNET_DECODE_ATTN_MAX_B", "BITNET_ROPE_FUSED",
                  "BITNET_FUSED_FFN", "BITNET_BKT_ROWCAP",
                  "BITNET_BKT_MBCAP"):
            os.environ.pop(k, None)
        for k, v in env.items():
            os.environ[k] = v
        try:
            if quant:
                t = bench_decode_q(**kw)
            else:
                t = bench.bench_decode(cfg, params, "w2a8", **kw)
            B = kw.get("B", 1)
            print(f"{name}: {t*1e3:7.3f} ms/step = {B/t:7.1f} tok/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:300]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
