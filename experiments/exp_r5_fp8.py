"""fp8 KV cache: verify on-chip or delete (VERDICT r4 next-round #4).

Two parts, one process per MODE (env flags are trace-time):

1. Mosaic-cast correctness: run the fused quant decode-attention kernels
   with an fp8_e4m3 cache on the REAL chip and compare against the XLA
   reference computed from the SAME fp8 cache values (identical inputs →
   only accumulation order differs; cosine must be ~1).  This is the
   check the BITNET_FP8_KERNEL gate was waiting for
   (models/bitnet.py:329 "until Mosaic-cast-verified").

2. Perf matrix: full-model decode ms/step for fp8 vs int8 vs bf16 at
   B ∈ {1, 8}, S ∈ {1024, 4096}.

Usage:  MODE=cast python experiments/exp_r5_fp8.py
        MODE=perf KV=fp8 B=1 S=1024 python experiments/exp_r5_fp8.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("BITNET_FP8_KERNEL", "1")

import jax
import jax.numpy as jnp
import numpy as np


def check_cast():
    """Kernel-vs-XLA parity from identical fp8 cache values, on chip."""
    import bench
    from bitnet_tpu.models.bitnet import decode_attn_plan

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    B, S, KV, G, D = 8, 512, 5, 4, 128
    H = KV * G
    fp8 = jnp.float8_e4m3fn

    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, KV, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, KV, D)), jnp.float32)
    kc_f = rng.normal(size=(B, S, KV, D)).astype(np.float32)
    vc_f = rng.normal(size=(B, S, KV, D)).astype(np.float32)
    ks = np.abs(kc_f).max(-1) / 448.0 + 1e-8          # [B, S, KV]
    vs = np.abs(vc_f).max(-1) / 448.0 + 1e-8
    kq = jnp.asarray((kc_f / ks[..., None]), fp8)
    vq = jnp.asarray((vc_f / vs[..., None]), fp8)
    pos = jnp.asarray(rng.integers(64, S, size=B), jnp.int32)

    plan = decode_attn_plan(B, fp8, flat=True)
    print(f"plan at B=8 fp8 flat: {plan}", flush=True)

    from bitnet_tpu.ops.decode_attention_v2 import (
        decode_attention_quant_batched_v2,
    )

    out = decode_attention_quant_batched_v2(
        q, kn, vn, kq.reshape(B, S, KV * D), vq.reshape(B, S, KV * D),
        jnp.asarray(ks, jnp.float32), jnp.asarray(vs, jnp.float32), pos,
        n_kv=KV)
    out = np.asarray(out, np.float32).reshape(B, H, D)

    # XLA reference from the SAME quantized values
    kd = np.asarray(kq, np.float32) * ks[..., None]
    vd = np.asarray(vq, np.float32) * vs[..., None]
    scale = D ** -0.5
    ref = np.zeros((B, H, D), np.float32)
    for b in range(B):
        p = int(pos[b])
        for h in range(H):
            g = h // G
            keys = np.concatenate([kd[b, :p, g], np.asarray(
                kn, np.float32)[b, g][None]], 0)
            vals = np.concatenate([vd[b, :p, g], np.asarray(
                vn, np.float32)[b, g][None]], 0)
            s = keys @ np.asarray(q, np.float32)[b, h] * scale
            e = np.exp(s - s.max())
            ref[b, h] = (e / e.sum()) @ vals
    cos = (out * ref).sum() / (np.linalg.norm(out) * np.linalg.norm(ref))
    mad = np.abs(out - ref).max()
    print(f"fp8 kernel-vs-xla cosine={cos:.8f} max|diff|={mad:.5f}",
          flush=True)
    # also the B<=2 stacked path
    from bitnet_tpu.engine.cache import allocate_cache
    from bitnet_tpu.config import ModelConfig
    print("PASS" if cos > 0.9999 else "FAIL", flush=True)


def perf():
    import bench
    from bitnet_tpu.engine.cache import allocate_cache
    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer

    kv = os.environ.get("KV", "fp8")
    B = int(os.environ.get("B", "1"))
    S = int(os.environ.get("S", "1024"))
    print(f"backend={jax.default_backend()} kv={kv} B={B} S={S}",
          flush=True)
    cfg, params = bench.build_synthetic_2b(fuse=True)
    from bitnet_tpu.models.bitnet import quantize_head
    params = quantize_head(params)

    if kv == "bf16":
        t = bench.bench_decode(cfg, params, "w2a8", B=B, S=S,
                               n_hi=24, n_lo=6)
    else:
        c0 = allocate_cache(cfg, B, S, kv, layout="auto")

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
                    jnp.zeros((B,), jnp.int32), c0.k, jnp.zeros_like(c0.k),
                    c0.k_scale, jnp.ones_like(c0.v_scale))

        t = chain_timer(step, mk, 24, 6, pairs=3, const_arg=params)
    print(f"RESULT kv={kv} B={B} S={S}: {t*1e3:.3f} ms/step = "
          f"{B/t:.1f} tok/s", flush=True)


if __name__ == "__main__":
    if os.environ.get("MODE", "cast") == "cast":
        check_cast()
    else:
        perf()
