"""Fast Mosaic compile checks for the round-3 kernels on real hardware.

Each new kernel is CPU-verified in interpret mode, but Mosaic
legalization on the chip has its own rules (memory: i32-only shifts,
last-two-dims blocking, relayout traps).  This compiles + runs each one
ONCE at 2B-4T geometry with tiny S so a rejection surfaces in minutes,
before the expensive per-process A/B matrix.

Usage: python tools/compile_check_r3.py   (on the TPU)
"""
from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def check(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK   {name}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:300]}", flush=True)
        traceback.print_exc(limit=3)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    B, H, KV, D, S = 1, 20, 5, 128, 512
    G = H // KV

    from bitnet_tpu.models.bitnet import _quantize_kv

    qkv = jnp.asarray(rng.standard_normal((B, (H + 2 * KV) * D)),
                      jnp.float32)
    sin = jnp.asarray(rng.standard_normal((B, D // 2)), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((B, D // 2)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
    kc8, ks = _quantize_kv(kf, jnp.int8)
    vc8, vs = _quantize_kv(vf, jnp.int8)
    pos = jnp.asarray([37] * B, jnp.int32)

    from bitnet_tpu.ops import decode_attention as da

    check("decode_attention_qkv_quant (rope-fused int8)", lambda: da.
          decode_attention_qkv_quant(qkv, sin, cos, kc8, vc8, ks, vs,
                                     pos, n_heads=H)[0])

    kc8f, ksf = _quantize_kv(kf, jnp.float8_e4m3fn)
    vc8f, vsf = _quantize_kv(vf, jnp.float8_e4m3fn)
    check("decode_attention_qkv_quant (rope-fused fp8)", lambda: da.
          decode_attention_qkv_quant(qkv, sin, cos, kc8f, vc8f, ksf, vsf,
                                     pos, n_heads=H)[0])
    check("decode_attention_quant (fp8 stream)", lambda: da.
          decode_attention_quant(
              jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32),
              jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32),
              jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32),
              kc8f, vc8f, ksf, vsf, pos))

    B8 = 8
    q8 = jnp.asarray(rng.standard_normal((B8, H, D)), jnp.float32)
    kn8 = jnp.asarray(rng.standard_normal((B8, KV, D)), jnp.float32)
    vn8 = jnp.asarray(rng.standard_normal((B8, KV, D)), jnp.float32)
    kcb = jnp.asarray(rng.standard_normal((B8, S, KV, D)), jnp.bfloat16)
    vcb = jnp.asarray(rng.standard_normal((B8, S, KV, D)), jnp.bfloat16)
    pos8 = jnp.asarray(rng.integers(0, S, B8), jnp.int32)
    check("decode_attention_batched (B=8 bf16)", lambda: da.
          decode_attention_batched(q8, kn8, vn8, kcb, vcb, pos8))

    kq8, ksq8 = _quantize_kv(jnp.asarray(
        rng.standard_normal((B8, S, KV, D)), jnp.float32), jnp.int8)
    vq8, vsq8 = _quantize_kv(jnp.asarray(
        rng.standard_normal((B8, S, KV, D)), jnp.float32), jnp.int8)
    check("decode_attention_quant_batched (B=8 int8)", lambda: da.
          decode_attention_quant_batched(q8, kn8, vn8, kq8, vq8,
                                         ksq8, vsq8, pos8))

    # stacked prefill matmul at wqkv geometry (M=512, K=2560, N=2560+)
    from bitnet_tpu.ops.linear import _repack_words
    from bitnet_tpu.ops import ternary_matmul as tm

    K2, N2, L = 2560, 2560, 2
    codes = rng.integers(0, 4, (K2, N2)).astype(np.uint8)
    pk = jnp.asarray(_repack_words(codes))
    packed = jnp.stack([pk, pk])
    scale_vec = jnp.ones((L, pk.shape[1]), jnp.float32)
    x512 = jnp.asarray(rng.standard_normal((512, K2)), jnp.float32)
    check("ternary_matmul_stacked_prefill (M=512)", lambda: tm.
          ternary_matmul_stacked_prefill(jnp.int32(1), x512, packed,
                                         scale_vec, k_dim=K2, n_dim=N2))

    scales_tl = jnp.asarray(
        rng.uniform(0.5, 1.5, (L, K2 // 32, pk.shape[1])), jnp.float32)
    x16 = jnp.asarray(rng.standard_normal((16, K2)), jnp.float32)
    check("ternary_matmul_stacked_tl (decode M=16)", lambda: tm.
          ternary_matmul_stacked_tl(jnp.int32(0), x16, packed, scales_tl,
                                    k_dim=K2, n_dim=N2))

    # fused-FFN with per-column down scales (VMEM [1, Hp] replaced the
    # SMEM scalar — revalidate Mosaic accepts the new operand)
    from bitnet_tpu.ops.ffn_fused import ffn_w2a8_fused

    F2 = 512
    gu_codes = rng.integers(0, 4, (K2, 2 * F2)).astype(np.uint8)
    d_codes = rng.integers(0, 4, (F2, N2)).astype(np.uint8)
    gu_pk = jnp.asarray(_repack_words(gu_codes))
    d_pk = jnp.asarray(_repack_words(d_codes))
    x1 = jnp.asarray(rng.standard_normal((1, K2)), jnp.float32)
    check("ffn_w2a8_fused (per-column down scales)", lambda: ffn_w2a8_fused(
        x1, gu_pk, jnp.ones((1, 2 * F2), jnp.float32), d_pk,
        jnp.full((1, d_pk.shape[1]), 0.5, jnp.float32),
        k_dim=K2, f_dim=F2, n_dim=N2))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
