"""Sweep (bn, bkt) for the stacked w2a8 kernels, per decode shape."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.ops.ternary_matmul import ternary_matmul_stacked

L, H, F = 30, 2560, 6912
SHAPES = {
    "qkv":    (H, 3840, [(3840,5),(3840,2),(3840,10),(1920,5)]),
    "o":      (H, 2560, [(2560,5),(2560,2),(2560,10),(1280,5)]),
    "gateup": (H, 13824, [(6912,2),(13824,2),(6912,5),(6912,1),(13824,1)]),
    "down":   (F, 2560, [(2560,9),(2560,3),(2560,27),(1280,9)]),
}
rng = np.random.default_rng(0)
print("backend:", jax.default_backend(), flush=True)

for name, (K, N, cfgs) in SHAPES.items():
    Wl = jnp.asarray(rng.integers(np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                                  size=(L, K // 16, N), dtype=np.int32))
    sv = jnp.full((L, N), 0.02, jnp.float32)
    gam = jnp.ones((L, K), jnp.float32)
    floor = L * K * N / 4 / 819e9 * 1e3
    print(f"--- {name} {K}x{N} (floor {floor:.3f} ms)", flush=True)
    for bn, bkt in cfgs:
        def step(c, carry, bn=bn, bkt=bkt):
            Wl, sv, gam = c
            x, = carry
            def body(h, l):
                y = ternary_matmul_stacked(l, h, Wl, sv, gam, k_dim=K, n_dim=N,
                                           blocks=(16, bn, bkt))
                return h + y[:, :K] * jnp.bfloat16(0.001), None
            y, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
            return (y,)
        def mk(i, K=K):
            return (jnp.asarray(np.random.default_rng(i).standard_normal((1, K)) * 0.1, jnp.bfloat16),)
        try:
            t = chain_timer(step, mk, 96, 24, pairs=3, const_arg=(Wl, sv, gam))
            print(f"  bn={bn:5d} bkt={bkt:2d}: {t*1e3:.3f} ms ({t*1e3/floor:.2f}x floor)", flush=True)
        except Exception as e:
            print(f"  bn={bn:5d} bkt={bkt:2d}: FAIL {str(e)[:100]}", flush=True)
