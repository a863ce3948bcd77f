"""30-layer decode-attention-only stack: sweep the kernel chunk size."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.ops.decode_attention import decode_attention

L, B, S, KV, G, D = 30, 1, 1024, 5, 4, 128
H = KV * G
rng = np.random.default_rng(0)
const = {
    "kc": jnp.asarray(rng.standard_normal((L, B, S, KV, D)) * 0.1, jnp.bfloat16),
    "vc": jnp.asarray(rng.standard_normal((L, B, S, KV, D)) * 0.1, jnp.bfloat16),
}
print("backend:", jax.default_backend())

def make_step(chunk):
    def step(c, carry):
        h, pos = carry   # h [B, H*D]
        def body(hh, xs):
            kc, vc = xs
            q = hh.reshape(B, H, D)
            kn = hh.reshape(B, H, D)[:, :KV]
            vn = hh.reshape(B, H, D)[:, :KV]
            o = decode_attention(q, kn, vn, kc, vc, pos, chunk=chunk)
            return (hh + o.reshape(B, H * D) * jnp.bfloat16(0.01)), None
        y, _ = jax.lax.scan(body, h, (c["kc"], c["vc"]))
        return y, pos
    return step

def mk(i):
    return (jnp.asarray(np.random.default_rng(i).standard_normal((B, H * D)) * 0.1, jnp.bfloat16),
            jnp.full((B,), 700, jnp.int32))

for chunk in (256, 512, 1024):
    t = chain_timer(make_step(chunk), mk, 96, 24, pairs=3, const_arg=const)
    print(f"chunk={chunk:5d}: {t*1e3:.3f} ms / 30 layers = {t/L*1e6:.1f} us/layer", flush=True)
