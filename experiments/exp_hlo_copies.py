"""Dump the OPTIMIZED HLO of the rows-mode decode chain and locate the
per-step full-cache copies the S=4096 profile surfaced (copy.38/copy.39,
~625 us/step each — two [L,B,S,KV,D] copies per decode step).

Prints every `copy` instruction whose operand shape matches the cache,
with its enclosing computation, so the aliasing culprit is identifiable.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

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

    B = 1
    S = int(os.environ.get("S", "1024"))
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
    lowered = chain.lower(params, tok0, kc0, jnp.zeros_like(kc0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt)} chars", flush=True)
    cache_dims = f"{L},{B},{S},{cfg.num_kv_heads},{cfg.head_dim}"
    pat = re.compile(r"bf16\[" + cache_dims.replace(",", ",\\s*") + r"\]")
    cur_comp = "?"
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*(?:\([^)]*\))?\s*{", line)
        if ("{" in line and ("ENTRY" in line or line.strip().startswith("%")
                             or "fused_computation" in line)):
            cur_comp = line.strip()[:100]
        ls = line.strip()
        if ls.startswith(("copy", "%copy")) or " = " in ls and (
                "copy(" in ls or "copy-start" in ls):
            if pat.search(ls):
                print(f"[{cur_comp}]\n  {ls[:400]}", flush=True)
    # also: where do copy.38/39 live? print any line naming them
    for line in txt.splitlines():
        if re.search(r"copy\.(3[0-9]|4[0-9])\b", line):
            print("  >>", line.strip()[:400], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
