"""Round-4 batched decode-attention microbench: per-layer attention cost
in isolation (L-layer scan over resident caches, mimicking the model's
rows-mode memory traffic) at B=8, S=1024, 2B shapes.

One variant per process (ONLY=<key>):
  einsum   post-write DUS + XLA einsum attention   (shipped B>2 default)
  v1b      decode_attention_batched        (round-3 whole-batch bf16)
  v1q      decode_attention_quant_batched  (round-3 whole-batch int8)
  v2b      decode_attention_batched_v2     (round-4 body, bf16)
  v2q      decode_attention_quant_batched_v2 (round-4 body, int8)
  perb     decode_attention                (per-b grid, bf16)
  paged    jax stock paged_attention       (native page layout, bf16)
  none     no attention (scan overhead floor)

Usage: for c in einsum v1b v1q v2b v2q perb paged none; do
         ONLY=$c timeout 1200 python experiments/exp_r4_attn.py; done
Env: B, S, CHUNK override the defaults.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    only = os.environ.get("ONLY", "v2b")
    B = int(os.environ.get("B", "8"))
    S = int(os.environ.get("S", "1024"))
    chunk = os.environ.get("CHUNK")
    chunk = int(chunk) if chunk else None
    L, KV, G, D = 30, 5, 4, 128
    H = KV * G
    print(f"backend={jax.default_backend()} ONLY={only} B={B} S={S} "
          f"chunk={chunk}", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from bitnet_tpu.obs.timing import chain_timer

    rng = np.random.default_rng(0)
    pos0 = jnp.full((B,), S - 1, jnp.int32)

    quant = only in ("v1q", "v2q")
    dt = jnp.int8 if quant else jnp.bfloat16
    if quant:
        kc0 = jnp.asarray(rng.integers(-127, 128, (L, B, S, KV, D)), dt)
        ks0 = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, S, KV)),
                          jnp.float32)
    else:
        kc0 = jnp.asarray(rng.standard_normal((L, B, S, KV, D)) * 0.3, dt)
        ks0 = jnp.zeros((L, B, 1, 1), jnp.float32)

    if only == "paged":
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention,
        )

        page = 128
        npages = S // page
        # native layout [KV, total_pages, page, D]; per (b) pages are
        # contiguous: page_indices[b, j] = b*npages + j
        kp0 = jnp.asarray(
            rng.standard_normal((L, KV, B * npages, page, D)) * 0.3,
            jnp.bfloat16)
        pidx = (jnp.arange(B)[:, None] * npages
                + jnp.arange(npages)[None, :]).astype(jnp.int32)
        lengths = jnp.full((B,), S, jnp.int32)

        def step(carry):
            q, kp, vp = carry

            def body(h, xs):
                kpl, vpl = xs
                o = paged_attention(
                    h, kpl, vpl, lengths, pidx,
                    pages_per_compute_block=4)
                return o.astype(h.dtype), ()

            q2, _ = jax.lax.scan(body, q, (kp, vp))
            return (q2 * 0.5 + q, kp, vp)

        def mk(i):
            q = jnp.asarray(rng.standard_normal((B, H, D)) * (1 + i % 3),
                            jnp.bfloat16)
            return (q, kp0, kp0 * 0.5)

        dt_s = chain_timer(step, mk, 24, 6, pairs=3)
        print(f"{only}: {dt_s*1e3:.3f} ms/scan = "
              f"{dt_s/L*1e6:.2f} us/layer", flush=True)
        return

    if only in ("v2kb", "v2kq", "v1kb", "v1kq"):
        # rope-fused qkv variants: feed the RAW qkv row per layer
        from bitnet_tpu.ops import decode_attention as da
        from bitnet_tpu.ops import decode_attention_v2 as da2

        fn = {"v2kb": da2.decode_attention_qkv_batched_v2,
              "v2kq": da2.decode_attention_qkv_quant_batched_v2,
              "v1kb": da.decode_attention_qkv_batched,
              "v1kq": da.decode_attention_qkv_quant_batched}[only]
        qv = only in ("v2kq", "v1kq")
        dt = jnp.int8 if qv else jnp.bfloat16
        if qv:
            kc0 = jnp.asarray(rng.integers(-127, 128, (L, B, S, KV, D)), dt)
            ks0 = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, S, KV)),
                              jnp.float32)
        else:
            kc0 = jnp.asarray(rng.standard_normal((L, B, S, KV, D)) * 0.3,
                              dt)
            ks0 = jnp.zeros((L, B, 1, 1), jnp.float32)
        sin0 = jnp.asarray(rng.uniform(-1, 1, (B, D // 2)), jnp.float32)
        cos0 = jnp.asarray(rng.uniform(-1, 1, (B, D // 2)), jnp.float32)

        def step(carry):
            qkv, kc, vc, ks, vs = carry

            def body(h, xs):
                kcl, vcl, ksl, vsl = xs
                if qv:
                    o = fn(h, sin0, cos0, kcl, vcl, ksl, vsl, pos0,
                           n_heads=H, chunk=chunk)[0]
                else:
                    o = fn(h, sin0, cos0, kcl, vcl, pos0,
                           n_heads=H, chunk=chunk)[0]
                o2 = jnp.concatenate(
                    [o, o[:, :2 * KV]], axis=1).astype(h.dtype)
                return h * 0.98 + o2 * 0.01, ()

            q2, _ = jax.lax.scan(body, qkv, (kc, vc, ks, vs))
            return (q2, kc, vc, ks, vs)

        def mk(i):
            qkv = jnp.asarray(
                rng.standard_normal((B, H + 2 * KV, D)) * (1 + i % 3),
                jnp.bfloat16)
            return (qkv, kc0, kc0, ks0, ks0)

        dt_s = chain_timer(step, mk, 24, 6, pairs=3)
        floor = 2 * B * S * KV * D * (1 if qv else 2) / 819e9
        print(f"{only}: {dt_s*1e3:.3f} ms/scan = {dt_s/L*1e6:.2f} us/layer "
              f"(stream floor {floor*1e6:.1f} us/layer)", flush=True)
        return

    if only == "einsum":
        from bitnet_tpu.ops.attention import attention

        def attn_fn(q, kn, vn, kc, vc, ks, vs):
            b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
            qpos = pos0[:, None]
            kcw = kc.at[b_idx, qpos].set(kn[:, None].astype(kc.dtype),
                                         mode="drop")
            vcw = vc.at[b_idx, qpos].set(vn[:, None].astype(vc.dtype),
                                         mode="drop")
            return attention(q[:, None], kcw, vcw, qpos, pos0 + 1)[:, 0]
    elif only == "none":
        def attn_fn(q, kn, vn, kc, vc, ks, vs):
            return q + kn.sum(axis=1, keepdims=True)
    else:
        from bitnet_tpu.ops import decode_attention as da
        from bitnet_tpu.ops import decode_attention_v2 as da2

        fn = {"v1b": da.decode_attention_batched,
              "v1q": da.decode_attention_quant_batched,
              "v2b": da2.decode_attention_batched_v2,
              "v2q": da2.decode_attention_quant_batched_v2,
              "v2p": da2.decode_attention_perb_v2,
              "perb": da.decode_attention}[only]

        def attn_fn(q, kn, vn, kc, vc, ks, vs):
            if quant:
                return fn(q, kn, vn, kc, vc, ks, vs, pos0, chunk=chunk)
            return fn(q, kn, vn, kc, vc, pos0, chunk=chunk)

    def step(carry):
        q, kn, vn, kc, vc, ks, vs = carry

        def body(h, xs):
            kcl, vcl, ksl, vsl = xs
            o = attn_fn(h, kn, vn, kcl, vcl, ksl, vsl)
            return o.astype(h.dtype), ()

        q2, _ = jax.lax.scan(body, q, (kc, vc, ks, vs))
        return (q2 * 0.5 + q, kn, vn, kc, vc, ks, vs)

    def mk(i):
        q = jnp.asarray(rng.standard_normal((B, H, D)) * (1 + i % 3),
                        jnp.bfloat16)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.bfloat16)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.bfloat16)
        return (q, kn, vn, kc0, kc0, ks0, ks0)

    dt_s = chain_timer(step, mk, 24, 6, pairs=3)
    # stream floor: 2 caches x B x S x KV x D x itemsize @ 819 GB/s
    floor = 2 * B * S * KV * D * (1 if quant else 2) / 819e9
    print(f"{only}: {dt_s*1e3:.3f} ms/scan = {dt_s/L*1e6:.2f} us/layer "
          f"(stream floor {floor*1e6:.1f} us/layer)", flush=True)


if __name__ == "__main__":
    main()
