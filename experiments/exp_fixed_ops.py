"""Where do the non-matmul ~0.9 ms/token go?  Incremental ablation:
  S0: matmul stack alone (baseline ~1.7 ms)
  S1: + rms_norms (4/layer)
  S2: + rope (q,k) + reshape plumbing
  S3: + KV scatters
  S4: + fused decode-attention kernel
  S5: full real forward() (for cross-check)
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.ops.rmsnorm import rms_norm
from bitnet_tpu.ops.rope import apply_rope, build_rope_tables
from bitnet_tpu.ops.ternary_matmul import _ternary_matmul_2d

H, F, L, NH, NKV, D, S = 2560, 6912, 30, 20, 5, 128, 1024
SHAPES = {"qkv": (H, 3840), "o": (NH * D, H), "gateup": (H, 13824),
          "down": (F, H)}
CFGS = {"qkv": (3840, 5), "o": (2560, 5), "gateup": (6912, 2),
        "down": (2560, 9)}


def say(*a):
    print(*a, flush=True)


def main():
    say(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(1)
    const = {}
    for name, (k, n) in SHAPES.items():
        kp = -(-k // 256) * 256
        npad = -(-n // 128) * 128
        const[name] = jnp.asarray(rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(L, kp // 16, npad), dtype=np.int32))
    const["norms"] = jnp.ones((L, 4, H), jnp.float32)
    const["norm_f"] = jnp.ones((L, F), jnp.float32)
    const["norm_a"] = jnp.ones((L, NH * D), jnp.float32)
    sin, cos = build_rope_tables(D, 4096, 500000.0)
    const["sin"] = jnp.asarray(sin)
    const["cos"] = jnp.asarray(cos)
    const["kc"] = jnp.zeros((L, 1, S, NKV, D), jnp.bfloat16)
    const["vc"] = jnp.zeros((L, 1, S, NKV, D), jnp.bfloat16)

    def mm(w, x, sn):
        k, n = SHAPES[sn]
        bn, bkt = CFGS[sn]
        return _ternary_matmul_2d(
            x, w, jnp.float32(0.02), kind="qk256", variant="w2a8",
            k_dim=k, n_dim=n, bm=16, bn=bn, bkt=bkt, interpret=False,
            out_dtype=jnp.bfloat16)

    def make_step(level):
        def step(c, carry):
            x, pos = carry
            pos_b = jnp.full((1, 1), 0, jnp.int32) + pos

            def body(h, xs):
                wq, wo, wg, wd, norms, nf, na, kc, vc = xs
                hin = h
                if level >= 1:
                    h = rms_norm(h[:, None], norms[0], 1e-5)[:, 0]
                qkv = mm(wq, h, "qkv")
                q = qkv[:, : NH * D].reshape(1, 1, NH, D)
                k = qkv[:, NH * D: (NH + NKV) * D].reshape(1, 1, NKV, D)
                v = qkv[:, (NH + NKV) * D:].reshape(1, 1, NKV, D)
                if level >= 2:
                    q = apply_rope(q, c["sin"], c["cos"], pos_b)
                    k = apply_rope(k, c["sin"], c["cos"], pos_b)
                if level >= 3:
                    b_idx = jnp.arange(1)[:, None]
                    kc = kc.at[b_idx, pos_b].set(k.astype(kc.dtype),
                                                 mode="drop")
                    vc = vc.at[b_idx, pos_b].set(v.astype(vc.dtype),
                                                 mode="drop")
                if level >= 4:
                    from bitnet_tpu.ops.decode_attention import (
                        decode_attention,
                    )

                    attn = decode_attention(
                        q[:, 0], k[:, 0], v[:, 0], kc, vc, pos_b[:, 0]
                    ).reshape(1, NH * D)
                else:
                    attn = q.reshape(1, NH * D)
                if level >= 1:
                    attn = rms_norm(attn[:, None], na, 1e-5)[:, 0]
                o = mm(wo, attn, "o")
                h2 = hin + o
                hh = h2
                if level >= 1:
                    hh = rms_norm(h2[:, None], norms[2], 1e-5)[:, 0]
                gu = mm(wg, hh, "gateup")
                act = gu[:, :F] * jax.nn.silu(gu[:, F:])
                if level >= 1:
                    act = rms_norm(act[:, None], nf, 1e-5)[:, 0]
                dn = mm(wd, act, "down")
                return h2 + dn, (kc, vc)

            def scan_body(h, xs):
                y, (kc, vc) = body(h, xs)
                return y, (kc, vc)

            y, _ = jax.lax.scan(
                scan_body, x,
                (c["qkv"], c["o"], c["gateup"], c["down"], c["norms"],
                 c["norm_f"], c["norm_a"], c["kc"], c["vc"]))
            return (y * jnp.bfloat16(0.5), pos)
        return step

    def mk(i):
        return (jnp.asarray(
            np.random.default_rng(i).standard_normal((1, H)) * 0.1,
            jnp.bfloat16), jnp.int32(i % 500))

    for level, label in [(0, "matmuls only"), (1, "+norms"),
                         (2, "+rope"), (3, "+scatter"), (4, "+attn-kernel")]:
        try:
            t = chain_timer(make_step(level), mk, 48, 12, pairs=3,
                            const_arg=const)
            say(f"S{level} {label:14s}: {t*1e3:.3f} ms "
                f"({t/L*1e6:.1f} us/layer)")
        except Exception as e:
            say(f"S{level} {label}: FAIL {str(e)[:300]}")
    say("DONE")


if __name__ == "__main__":
    main()
