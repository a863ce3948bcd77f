"""Kernel micro-benchmark harness (reference ``bitnet-wgpu-bench`` role).

Times individual fused ternary kernels at given shapes with the hardened
chain methodology (obs/timing.py) and reports achieved packed-weight
bandwidth — the metric that matters for the VPU-unpack-bound decode path.
Used for block-size tuning sweeps (see _pick_blocks provenance).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class KernelBenchResult:
    name: str
    k: int
    n: int
    m: int
    us_per_call: float
    packed_mb: float
    gbps: float

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


DECODE_SHAPES_2B = [
    ("wq/wo", 2560, 2560),
    ("wk/wv", 2560, 640),
    ("gate/up", 2560, 6912),
    ("down", 6912, 2560),
]


def bench_ternary_kernel(k: int, n: int, m: int = 1, name: str = "",
                         n_hi: int = 2048, n_lo: int = 512,
                         pairs: int = 2, seed: int = 0) -> KernelBenchResult:
    """Time one fused QK256 kernel at [m, k] @ [k, n]."""
    import jax.numpy as jnp

    from ..obs.timing import chain_timer
    from ..ops.linear import TernaryLinear
    from ..ops.ternary_matmul import ternary_matmul_pallas

    rng = np.random.default_rng(seed)
    kp = -(-k // 256) * 256
    npad = -(-n // 128) * 128
    packed = jnp.asarray(rng.integers(
        np.iinfo(np.int32).min, np.iinfo(np.int32).max,
        size=(kp // 16, npad), dtype=np.int32))
    lin = TernaryLinear(kind="qk256", k=k, n=n, packed=packed,
                        scales=jnp.float32(0.02))

    def step(lin, carry):
        x, s = carry
        y = ternary_matmul_pallas(lin, x)
        return x + y[:, :1].astype(x.dtype) * 0, s + jnp.sum(
            y.astype(jnp.float32))

    def mk(i):
        return (jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16),
                jnp.float32(i))

    dt = chain_timer(step, mk, n_hi, n_lo, pairs=pairs, const_arg=lin)
    mb = (kp // 4) * npad / 1e6
    return KernelBenchResult(
        name=name or f"{k}x{n}", k=k, n=n, m=m,
        us_per_call=round(dt * 1e6, 2),
        packed_mb=round(mb, 2),
        gbps=round(mb / 1e3 / dt, 1) if dt > 0 else 0.0,
    )


def bench_decode_shapes(model: str = "2B",
                        m: int = 1) -> list[KernelBenchResult]:
    shapes = DECODE_SHAPES_2B
    return [bench_ternary_kernel(k, n, m=m, name=name)
            for name, k, n in shapes]


ATTN_VARIANTS = ("einsum", "flash", "qkv", "quant", "qkv_quant",
                 "batched", "qkv_batched", "quant_batched",
                 "qkv_quant_batched")


def bench_decode_attention(variant: str, B: int = 1, S: int = 1024,
                           n_kv: int = 5, G: int = 4, D: int = 128,
                           n_hi: int = 1024, n_lo: int = 256,
                           pairs: int = 2, seed: int = 0
                           ) -> KernelBenchResult:
    """Time one decode-attention kernel variant (decode_attn_plan names).

    The KV cache rides the chain CARRY and is re-written every step (the
    new row scatters at an advancing position) — a loop-invariant cache
    would be pinned in VMEM by XLA and report fantasy bandwidth, the
    same trap as single-matmul weight microbenches (obs/timing.py
    provenance).  Reported GB/s is the cache-stream bandwidth.
    """
    import jax
    import jax.numpy as jnp

    from ..obs.timing import chain_timer
    from ..ops import decode_attention as da
    from ..ops.attention import attention
    from ..ops.rope import build_rope_tables

    H = n_kv * G
    rng = np.random.default_rng(seed)
    interp = jax.default_backend() != "tpu"
    quant = "quant" in variant
    cache_dt = jnp.int8 if quant else jnp.bfloat16
    sin_t, cos_t = build_rope_tables(D, S, 10000.0)
    sin_t, cos_t = jnp.asarray(sin_t), jnp.asarray(cos_t)

    def mk(i):
        kc = jnp.asarray(
            rng.integers(-127, 128, (B, S, n_kv, D))
            if quant else rng.standard_normal((B, S, n_kv, D)) * 0.3,
            cache_dt)
        vc = jnp.asarray(
            rng.integers(-127, 128, (B, S, n_kv, D))
            if quant else rng.standard_normal((B, S, n_kv, D)) * 0.3,
            cache_dt)
        ks = jnp.asarray(rng.uniform(1e-3, 2e-2, (B, S, n_kv)),
                         jnp.float32)
        qkv = jnp.asarray(
            rng.standard_normal((B, (H + 2 * n_kv) * D)), jnp.float32)
        pos = jnp.full((B,), S // 2 + (i % 8), jnp.int32)
        return (qkv, pos, kc, vc, ks, jnp.asarray(ks))

    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    def step(carry):
        qkv, pos, kc, vc, ks, vs = carry
        rows = qkv.reshape(B, H + 2 * n_kv, D)
        sin_r, cos_r = sin_t[pos], cos_t[pos]
        if variant.startswith("qkv"):
            if variant == "qkv":
                attn, kr, vr = da.decode_attention_qkv(
                    qkv, sin_r, cos_r, kc, vc, pos, n_heads=H, interpret=interp)
                ksr = vsr = None
            elif variant == "qkv_batched":
                attn, kr, vr = da.decode_attention_qkv_batched(
                    qkv, sin_r, cos_r, kc, vc, pos, n_heads=H, interpret=interp)
                ksr = vsr = None
            elif variant == "qkv_quant":
                attn, kr, vr, ksr, vsr = da.decode_attention_qkv_quant(
                    qkv, sin_r, cos_r, kc, vc, ks, vs, pos, n_heads=H, interpret=interp)
            else:
                attn, kr, vr, ksr, vsr = (
                    da.decode_attention_qkv_quant_batched(
                        qkv, sin_r, cos_r, kc, vc, ks, vs, pos,
                        n_heads=H, interpret=interp))
        else:
            q = rows[:, :H]
            kn = rows[:, H:H + n_kv]
            vn = rows[:, H + n_kv:]
            if variant == "flash":
                attn = da.decode_attention(q, kn, vn, kc, vc, pos, interpret=interp)
            elif variant == "batched":
                attn = da.decode_attention_batched(q, kn, vn, kc, vc, pos, interpret=interp)
            elif variant == "quant":
                attn = da.decode_attention_quant(q, kn, vn, kc, vc,
                                                 ks, vs, pos, interpret=interp)
            elif variant == "quant_batched":
                attn = da.decode_attention_quant_batched(
                    q, kn, vn, kc, vc, ks, vs, pos, interpret=interp)
            else:   # einsum: XLA reference attention over the cache
                kw = kc.at[b_idx, pos[:, None]].set(
                    kn[:, None].astype(cache_dt), mode="drop")
                vw = vc.at[b_idx, pos[:, None]].set(
                    vn[:, None].astype(cache_dt), mode="drop")
                attn = attention(
                    q[:, None].astype(jnp.float32),
                    kw.astype(jnp.float32), vw.astype(jnp.float32),
                    pos[:, None], pos + 1)[:, 0]
            kr = kn.astype(cache_dt)
            vr = vn.astype(cache_dt)
            ksr = vsr = None
        # scatter the new row so the cache MUTATES (stays HBM-resident)
        kc = kc.at[b_idx, pos[:, None]].set(kr[:, None], mode="drop")
        vc = vc.at[b_idx, pos[:, None]].set(vr[:, None], mode="drop")
        if ksr is not None:
            ks = ks.at[b_idx, pos[:, None]].set(ksr[:, None], mode="drop")
            vs = vs.at[b_idx, pos[:, None]].set(vsr[:, None], mode="drop")
        qkv = qkv + attn.reshape(B, -1).sum(axis=1, keepdims=True) * 0
        return (qkv, (pos + 1) % (S - 1), kc, vc, ks, vs)

    dt = chain_timer(step, mk, n_hi, n_lo, pairs=pairs, const_arg=None)
    mb = 2 * B * S * n_kv * D * (1 if quant else 2) / 1e6
    return KernelBenchResult(
        name=f"attn_{variant}", k=S, n=n_kv * D, m=B,
        us_per_call=round(dt * 1e6, 2),
        packed_mb=round(mb, 2),
        gbps=round(mb / 1e3 / dt, 1) if dt > 0 else 0.0,
    )
