"""Dump optimized HLO for the B=8 V8 (pallas stacked) decode chain and
print every copy instruction with cache-sized operands + its layout, to
pin down the 4 x ~1 ms/step copies the round-4 profile surfaced."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("BITNET_BATCHED_ATTN", "v2")

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

    B, S = 8, 1024
    L = cfg.num_layers
    kc0 = jnp.zeros((L, B, S, cfg.num_kv_heads, cfg.head_dim), jnp.bfloat16)

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
            0, 8, step, (tok, jnp.zeros((B,), jnp.int32), kc, vc))
        return tok, kc, vc

    tok0 = jnp.zeros((B,), jnp.int32)
    txt = chain.lower(params, tok0, kc0,
                      jnp.zeros_like(kc0)).compile().as_text()
    print(f"optimized HLO: {len(txt)} chars", flush=True)
    big = re.compile(
        r"bf16\[(?:30,8,1024,5,128|30,8,1024,640|245760,640|30,8,1024,\d+)")
    for line in txt.splitlines():
        ls = line.strip()
        if ("copy" in ls.split("=")[-1][:30] if "=" in ls else False) or \
                ls.startswith(("copy", "%copy")):
            if big.search(ls):
                print("  ", ls[:300], flush=True)
    # context: find the named copies from the profile
    for want in ("copy.54", "copy.55", "copy.58", "copy.59"):
        for line in txt.splitlines():
            ls = line.strip()
            if ls.startswith(f"%{want} ") or ls.startswith(f"{want} ") or \
                    f" {want} = " in f" {ls}":
                print(f">> {want}:", ls[:300], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
