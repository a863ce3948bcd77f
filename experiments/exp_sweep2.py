"""Long-chain W2A8 decode-GEMV block sweep (n_hi=2048 — the short-chain
sweep in exp_decode_ablation.py was swamped by relay jitter)."""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.ops.ternary_matmul import _ternary_matmul_2d

H, F = 2560, 6912
SHAPES = {
    "qkv": (H, 3840),
    "o": (H, 2560),
    "gateup": (H, 13824),
    "down": (F, 2560),
}
# configs to test per shape: (bn, bkt)
CONFIGS = {
    "qkv": [(3840, 1), (3840, 2), (3840, 5), (1920, 5), (1280, 5)],
    "o": [(2560, 1), (2560, 2), (2560, 5), (1280, 5)],
    "gateup": [(6912, 2), (6912, 5), (4608, 5), (13824, 5), (6912, 1),
               (3456, 5)],
    "down": [(2560, 3), (2560, 9), (1280, 9), (2560, 27), (2560, 1)],
}


def say(*a):
    print(*a, flush=True)


def main():
    say(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    best_cfg = {}
    for name, (k, n) in SHAPES.items():
        kp = -(-k // 256) * 256
        npad = -(-n // 128) * 128
        words = jnp.asarray(rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(kp // 16, npad), dtype=np.int32))
        floor = kp * npad / 4 / 819e9 * 1e6
        say(f"--- {name}: {k}x{n} (HBM floor {floor:.1f} us)")
        nk = kp // 256
        best = None
        for bn, bkt in CONFIGS[name]:
            if npad % bn or nk % bkt:
                say(f"  bn={bn} bkt={bkt}: skip (divisibility)")
                continue
            try:
                def step(w, c, bn=bn, bkt=bkt):
                    y = _ternary_matmul_2d(
                        c, w, jnp.float32(0.02), kind="qk256",
                        variant="w2a8", k_dim=k, n_dim=n, bm=16, bn=bn,
                        bkt=bkt, interpret=False, out_dtype=jnp.bfloat16)
                    if n >= k:
                        return (y[:, :k] * jnp.bfloat16(1e-3))
                    return jnp.pad(y, ((0, 0), (0, k - n))) * jnp.bfloat16(1e-3)

                def mk(i, k=k):
                    return jnp.asarray(
                        np.random.default_rng(i).standard_normal((1, k)),
                        jnp.bfloat16)
                t = chain_timer(step, mk, 2048, 512, pairs=3, const_arg=words)
                say(f"  bn={bn:5d} bkt={bkt:2d}: {t*1e6:7.2f} us "
                    f"({floor/max(t*1e6,1e-9)*100:.0f}% of BW)")
                if best is None or t < best[0]:
                    best = (t, bn, bkt)
            except Exception as e:
                say(f"  bn={bn} bkt={bkt}: FAIL {str(e)[:150]}")
        if best:
            best_cfg[name] = best
            say(f"  BEST {name}: bn={best[1]} bkt={best[2]} "
                f"{best[0]*1e6:.2f} us")
    total = sum(b[0] for b in best_cfg.values()) * 30e3
    say(f"sum of best x30 layers = {total:.3f} ms")
    say("DONE")


if __name__ == "__main__":
    main()
