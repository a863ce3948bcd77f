"""Round-3 session-2 config matrix: the new fused/batched kernels vs the
shipped defaults, one process per config (run with ONLY=<letter>; env
flags are trace-time and XLA's layout choices are global, so in-process
flag flips measure stale mixes — see memory/tpu-environment-quirks).

  R  rows + rope-fused bf16 B=1        (shipped default — baseline)
  Q  rows + rope-fused int8 B=1        (decode_attention_qkv_quant)
  E  B=8 einsum attention              (shipped default at B>2)
  H  B=8 batched rope-fused kernel     (decode_attention_qkv_batched)
  J  B=8 batched plain kernel          (decode_attention_batched)
  I  B=8 batched kernel int8           (decode_attention_quant_batched)
  L  S=4096 long-context bf16 B=1      (rope-fused)
  M  S=4096 long-context int8 B=1      (rope-fused quant)
  P  prefill T=512 default
  X  prefill T=512 stacked             (ternary_matmul_stacked_prefill)

Usage:  for c in R Q E H J I L M P X; do
          ONLY=$c timeout 1800 python experiments/exp_round3b.py
        done
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

    def bench_decode_q(B, S=1024, n_hi=48, n_lo=12):
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

    runs = [
        ("R rows+rope-fused bf16 B=1 (default)", {}, "dec", dict(B=1)),
        ("Q rows+rope-fused int8 B=1", {}, "decq", dict(B=1)),
        ("E B=8 einsum attn (default)", {}, "dec", dict(B=8)),
        ("H B=8 batched rope-fused kernel bf16",
         {"BITNET_BATCHED_ATTN": "1"}, "dec", dict(B=8)),
        ("J B=8 batched plain kernel bf16 (rope in XLA)",
         {"BITNET_BATCHED_ATTN": "1", "BITNET_ROPE_FUSED": "0"},
         "dec", dict(B=8)),
        ("I B=8 batched kernel int8",
         {"BITNET_BATCHED_ATTN": "1"}, "decq", dict(B=8)),
        ("L S=4096 bf16 B=1", {}, "dec", dict(B=1, S=4096, n_hi=24, n_lo=6)),
        ("M S=4096 int8 B=1", {}, "decq",
         dict(B=1, S=4096, n_hi=24, n_lo=6)),
        ("P prefill T=512 (default)", {}, "pre", dict(T=512)),
        ("X prefill T=512 stacked",
         {"BITNET_STACKED_PREFILL": "1"}, "pre", dict(T=512)),
    ]
    only = os.environ.get("ONLY")
    if not only and os.environ.get("ALLOW_MIXED") != "1":
        raise SystemExit(
            "refusing to run multiple configs in one process (trace-time "
            "env flags + XLA's global layout choices make later rows a "
            "stale mix — the docstring's whole point).  Set ONLY=<letter> "
            "per process, or ALLOW_MIXED=1 to override knowingly.")
    for name, env, kind, kw in runs:
        if only and name[0] not in only:
            continue
        for k in ("BITNET_BATCHED_ATTN", "BITNET_STACKED_PREFILL",
                  "BITNET_ROPE_FUSED", "BITNET_DECODE_ATTN_MAX_B"):
            os.environ.pop(k, None)
        for k, v in env.items():
            os.environ[k] = v
        try:
            if kind == "dec":
                t = bench.bench_decode(cfg, params, "w2a8", **kw)
                B = kw.get("B", 1)
                print(f"{name}: {t*1e3:7.3f} ms/step = {B/t:7.1f} tok/s",
                      flush=True)
            elif kind == "decq":
                t = bench_decode_q(**kw)
                B = kw.get("B", 1)
                print(f"{name}: {t*1e3:7.3f} ms/step = {B/t:7.1f} tok/s",
                      flush=True)
            else:
                t = bench.bench_prefill(cfg, params, "w2a8", **kw)
                T = kw.get("T", 512)
                print(f"{name}: {t*1e3:7.3f} ms = {T/t:7.0f} tok/s prefill",
                      flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:300]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
