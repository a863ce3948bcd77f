"""One-process interleaved decode ablation: full / matmuls / attention /
head measured back-to-back (twice, A/B/A/B) to cancel relay drift."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from bitnet_tpu.obs.timing import chain_timer
from bitnet_tpu.models.bitnet import forward, logits as model_logits, quantize_head
from bitnet_tpu.ops.decode_attention import decode_attention

print("backend:", jax.default_backend(), flush=True)
cfg, params = bench.build_synthetic_2b(fuse=True)
params = quantize_head(params)
L, H, V = cfg.num_layers, cfg.hidden_size, cfg.vocab_size
NH, KV, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
B, S = 1, 1024

# --- full step (bench_decode's step) ---
kc0 = jnp.zeros((L, B, S, KV, D), jnp.bfloat16)
def full_step(prm, carry):
    tok, pos, kc, vc = carry
    h, kc, vc, _, _ = forward(cfg, prm, tok[:, None],
                              jnp.minimum(pos, S-1)[:, None], kc, vc,
                              jnp.minimum(pos, S-1), 1, "w2a8")
    lg = model_logits(cfg, prm, h, "w2a8")[:, 0, :]
    nxt = jnp.argmax(lg, -1).astype(jnp.int32)
    return nxt, pos+1, kc, vc
def mk_full(i):
    return (jnp.full((B,), (i*7) % V, jnp.int32), jnp.zeros((B,), jnp.int32),
            kc0, jnp.zeros_like(kc0))

# --- matmul-only stack (normed kernels, same weights) ---
from bitnet_tpu.ops.linear import linear_apply_normed
blocks = params.blocks
def mm_step(prm, carry):
    x, = carry
    def body(h, xs):
        wqkv, wo, wgu, wd, an, fn, asn, fsn = xs
        qkv = linear_apply_normed(wqkv, h, an, cfg.rms_norm_eps, "w2a8")
        attn = qkv[:, :NH*D]
        o = linear_apply_normed(wo, attn, asn, cfg.rms_norm_eps, "w2a8")
        gu = linear_apply_normed(wgu, h+o, fn, cfg.rms_norm_eps, "w2a8")
        Fh = wgu.n // 2
        act = jax.nn.silu(gu[:, :Fh]) * gu[:, Fh:]   # silu(gate)*up, matching _ffn
        dn = linear_apply_normed(wd, act, fsn, cfg.rms_norm_eps, "w2a8")
        return h + dn * jnp.bfloat16(0.1), None
    b = prm.blocks
    asn = b.attn_sub_norm if b.attn_sub_norm is not None else jnp.ones((L, NH*D), jnp.float32)
    fsn = b.ffn_sub_norm if b.ffn_sub_norm is not None else jnp.ones((L, cfg.intermediate_size), jnp.float32)
    y, _ = jax.lax.scan(body, x, (b.wqkv, b.wo, b.w_gateup, b.w_down,
                                  b.attn_norm, b.ffn_norm, asn, fsn))
    return (y,)
def mk_mm(i):
    return (jnp.asarray(np.random.default_rng(i).standard_normal((B, H))*0.1, jnp.bfloat16),)

# --- attention-only stack ---
rngc = np.random.default_rng(1)
kcs = jnp.asarray(rngc.standard_normal((L, B, S, KV, D))*0.1, jnp.bfloat16)
vcs = jnp.asarray(rngc.standard_normal((L, B, S, KV, D))*0.1, jnp.bfloat16)
def attn_step(consts, carry):
    kcs, vcs = consts
    h, pos = carry
    def body(hh, xs):
        kc, vc = xs
        q = hh.reshape(B, NH, D)
        kn = q[:, :KV]; vn = q[:, :KV]
        o = decode_attention(q, kn, vn, kc, vc, pos)
        return hh + o.reshape(B, NH*D)*jnp.bfloat16(0.01), None
    y, _ = jax.lax.scan(body, h, (kcs, vcs))
    return y, pos
def mk_attn(i):
    return (jnp.asarray(np.random.default_rng(i).standard_normal((B, NH*D))*0.1, jnp.bfloat16),
            jnp.full((B,), 700, jnp.int32))

# --- head only ---
def head_step(prm, carry):
    h, = carry
    lg = model_logits(cfg, prm, h[:, None], "w2a8")[:, 0, :]
    nxt = jnp.argmax(lg, -1)
    return (h + (nxt[:, None] % 7).astype(jnp.bfloat16) * jnp.bfloat16(0.001),)
def mk_head(i):
    return (jnp.asarray(np.random.default_rng(i).standard_normal((B, H))*0.1, jnp.bfloat16),)

cases = [
    ("full", full_step, mk_full, params, 48, 12),
    ("matmuls", mm_step, mk_mm, params, 48, 12),
    ("attention", attn_step, mk_attn, (kcs, vcs), 96, 24),
    ("head", head_step, mk_head, params, 256, 64),
]
for round_ in range(2):
    for name, step, mk, const, nh, nl in cases:
        t = chain_timer(step, mk, nh, nl, pairs=3, const_arg=const)
        print(f"r{round_} {name:10s}: {t*1e3:.3f} ms", flush=True)
