"""Full-stack block sweep: measure the 30-layer w2a8 matmul chain per
block-config combo.  Single-matmul microbenchmarks are invalid here —
with a loop-invariant weight, XLA pins the packed operand in VMEM across
chain iterations and reports >HBM-bandwidth speeds; only a stack that
streams all 30 layers' weights ranks configs honestly."""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.ops.ternary_matmul import _ternary_matmul_2d

H, F, L = 2560, 6912, 30
SHAPES = {
    "qkv": (H, 3840),
    "o": (H, 2560),
    "gateup": (H, 13824),
    "down": (F, 2560),
}

COMBOS = {
    "default(r2)": {"qkv": (3840, 5), "o": (2560, 5), "gateup": (6912, 2),
                    "down": (2560, 9)},
    "all-bkt1": {"qkv": (3840, 1), "o": (2560, 1), "gateup": (6912, 1),
                 "down": (2560, 1)},
    "bkt2": {"qkv": (3840, 2), "o": (2560, 2), "gateup": (6912, 2),
             "down": (2560, 3)},
    "narrow-deep": {"qkv": (1920, 5), "o": (1280, 5), "gateup": (3456, 5),
                    "down": (1280, 9)},
}


def say(*a):
    print(*a, flush=True)


def main():
    say(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(1)
    stacks = {}
    for name, (k, n) in SHAPES.items():
        kp = -(-k // 256) * 256
        npad = -(-n // 128) * 128
        stacks[name] = jnp.asarray(rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(L, kp // 16, npad), dtype=np.int32))

    for combo_name, cfg in COMBOS.items():
        def mm(w, x, shape_name):
            k, n = SHAPES[shape_name]
            bn, bkt = cfg[shape_name]
            return _ternary_matmul_2d(
                x, w, jnp.float32(0.02), kind="qk256", variant="w2a8",
                k_dim=k, n_dim=n, bm=16, bn=bn, bkt=bkt,
                interpret=False, out_dtype=jnp.bfloat16)

        def step(stks, x):
            def body(c, xs):
                wq, wo, wg, wd = xs
                qkv = mm(wq, c, "qkv")
                o = mm(wo, qkv[:, :H], "o")
                gu = mm(wg, c + o, "gateup")
                dn = mm(wd, gu[:, :F] * jax.nn.silu(gu[:, F:]), "down")
                return c + dn, None
            y, _ = jax.lax.scan(
                body, x,
                (stks["qkv"], stks["o"], stks["gateup"], stks["down"]))
            return y * jnp.bfloat16(0.5)

        def mk(i):
            return jnp.asarray(
                np.random.default_rng(i).standard_normal((1, H)) * 0.1,
                jnp.bfloat16)

        try:
            t = chain_timer(step, mk, 64, 16, pairs=3, const_arg=stacks)
            say(f"{combo_name:14s}: {t*1e3:.3f} ms/stack "
                f"({t/L*1e6:.1f} us/layer)")
        except Exception as e:
            say(f"{combo_name}: FAIL {str(e)[:200]}")
    say("DONE")


if __name__ == "__main__":
    main()
