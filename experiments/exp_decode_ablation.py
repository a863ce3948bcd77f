"""Round-2 decode ablation: where do the 3.17 ms/token go?

Pieces (B=1, 2B shapes, w2a8 path, fused projections):
  A. full decode step (reference number)
  B. matmul stack only: 30x (qkv + o + gateup + down) on a fixed x
  C. per-shape w2a8 GEMV block sweep (bn, bkt)
  D. attention+cache only (forward with matmuls replaced by slicing)
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.ops.linear import TernaryLinear
from bitnet_tpu.ops.ternary_matmul import _ternary_matmul_2d

H, F, L = 2560, 6912, 30
NH, NKV, D = 20, 5, 128
SHAPES = {
    "qkv": (H, NH * D + 2 * NKV * D),      # 2560 x 3840
    "o": (NH * D, H),                       # 2560 x 2560
    "gateup": (H, 2 * F),                   # 2560 x 13824
    "down": (F, H),                         # 6912 x 2560
}


def say(*a):
    print(*a, flush=True)


def rand_words(rng, k, n):
    kp = -(-k // 256) * 256
    npad = -(-n // 128) * 128
    return jnp.asarray(rng.integers(np.iinfo(np.int32).min,
                                    np.iinfo(np.int32).max,
                                    size=(kp // 16, npad), dtype=np.int32))


def time_step(step, mk, const=None, n_hi=512, n_lo=128):
    return chain_timer(step, mk, n_hi, n_lo, pairs=3, const_arg=const)


def sweep_shapes():
    rng = np.random.default_rng(0)
    for name, (k, n) in SHAPES.items():
        words = rand_words(rng, k, n)
        npad = words.shape[1]
        say(f"--- {name}: {k}x{n} (packed {k*npad/4/1e6:.2f} MB, "
            f"HBM floor {k*npad/4/819e9*1e6:.1f} us)")
        cfgs = []
        for bn in (1280, 2560, 3840, 4608, 6912, 13824, npad):
            if npad % bn:
                continue
            nk = (-(-k // 256))
            for bkt in sorted({1, 2, 5, nk}):
                if nk % bkt:
                    continue
                cfgs.append((bn, bkt))
        best = None
        for bn, bkt in sorted(set(cfgs)):
            try:
                def step(w, c, bn=bn, bkt=bkt):
                    y = _ternary_matmul_2d(
                        c, w, jnp.float32(0.02), kind="qk256",
                        variant="w2a8", k_dim=k, n_dim=n, bm=16, bn=bn,
                        bkt=bkt, interpret=False, out_dtype=jnp.bfloat16)
                    return (y[:, :k] * jnp.bfloat16(1e-3)
                            if n >= k else
                            jnp.pad(y, ((0, 0), (0, k - n))) *
                            jnp.bfloat16(1e-3))
                def mk(i, k=k):
                    return jnp.asarray(
                        np.random.default_rng(i).standard_normal((1, k)),
                        jnp.bfloat16)
                t = time_step(step, mk, const=words)
                say(f"  bn={bn:5d} bkt={bkt}: {t*1e6:7.1f} us")
                if best is None or t < best[0]:
                    best = (t, bn, bkt)
            except Exception as e:
                say(f"  bn={bn:5d} bkt={bkt}: FAIL {str(e)[:120]}")
        if best:
            say(f"  BEST {name}: bn={best[1]} bkt={best[2]} "
                f"{best[0]*1e6:.1f} us x30 = {best[0]*30e3:.2f} ms")


def matmul_stack():
    """All four matmuls back-to-back x 30 layers (no attention)."""
    rng = np.random.default_rng(1)
    stacks = {}
    for name, (k, n) in SHAPES.items():
        kp = -(-k // 256) * 256
        npad = -(-n // 128) * 128
        stacks[name] = jnp.asarray(rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(L, kp // 16, npad), dtype=np.int32))

    def layer_matmuls(ws, x):
        from bitnet_tpu.ops.ternary_matmul import ternary_matmul_pallas
        wq, wo, wg, wd = ws
        def lin(w, kk, nn):
            return TernaryLinear(kind="qk256", k=kk, n=nn, packed=w,
                                 scales=jnp.float32(0.02))
        qkv = ternary_matmul_pallas(lin(wq, *SHAPES["qkv"]), x,
                                    variant="w2a8")
        o = ternary_matmul_pallas(lin(wo, *SHAPES["o"]),
                                  qkv[:, :H], variant="w2a8")
        gu = ternary_matmul_pallas(lin(wg, *SHAPES["gateup"]), x + o,
                                   variant="w2a8")
        dn = ternary_matmul_pallas(
            lin(wd, *SHAPES["down"]),
            gu[:, :F] * jax.nn.silu(gu[:, F:]), variant="w2a8")
        return x + dn

    def step(stks, x):
        def body(c, xs):
            return layer_matmuls(xs, c), None
        y, _ = jax.lax.scan(
            body, x, (stks["qkv"], stks["o"], stks["gateup"], stks["down"]))
        return y * jnp.bfloat16(0.5)

    def mk(i):
        return jnp.asarray(
            np.random.default_rng(i).standard_normal((1, H)) * 0.1,
            jnp.bfloat16)

    t = time_step(step, mk, const=stacks, n_hi=48, n_lo=12)
    say(f"matmul stack (30 layers x 4 w2a8 matmuls): {t*1e3:.3f} ms")


def main():
    say(f"backend={jax.default_backend()}")
    sweep_shapes()
    matmul_stack()
    say("DONE")


if __name__ == "__main__":
    main()
