"""Round-2 perf probes: W2A8 fused ternary matmul building blocks.

Questions (run on the real TPU):
  P1: does pltpu.bitcast support i32 -> i8 (cross-size), and what is the
      sublane/byte ordering?
  P2: does Mosaic compile an int8 x int8 -> int32 jnp.dot?
  P3: does an i8 -> bf16 convert after bitcast compile (plan B)?
  P4: full unpack chain (shift/mask/bias in i32, bitcast to i8) vs host ref.
  P5: GEMV timing: current qk256 kernel vs W2A8 candidate on decode shapes.

Each probe prints a line and flushes, so a partial run still informs.
"""
from __future__ import annotations

import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def say(*a):
    print(*a, flush=True)


def run(name, fn):
    try:
        fn()
    except Exception as e:
        say(f"{name}: FAIL {type(e).__name__}: {str(e)[:500]}")
        tb = traceback.format_exc().splitlines()
        say("  " + "\n  ".join(tb[-4:]))
        return False
    return True


# ------------------------------------------------------------------ P1
def p1_bitcast_order():
    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    words = np.zeros((16, 128), np.uint32)
    for s in range(16):
        v = 0
        for j in range(4):
            v |= (4 * s + j) << (8 * j)
        words[s, 0] = v
        words[s, 1] = v  # second lane identical
    x = jnp.asarray(words.view(np.int32))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int8),
    )(x)
    col = np.asarray(out[:, 0])
    say(f"P1 bitcast i32->i8 OK; order col0={col.tolist()}")
    # expected row 4s+j -> value 4s+j if little-endian sublane-major
    exp = np.arange(64)
    say(f"P1 ordering {'ROW-MAJOR-LE' if (col == exp).all() else 'OTHER'}")


# ------------------------------------------------------------------ P2
def p2_int8_dot():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    a = rng.integers(-127, 128, size=(128, 256)).astype(np.int8)
    b = rng.integers(-4, 5, size=(256, 256)).astype(np.int8)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.int32),
    )(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.int32) @ b.astype(np.int32)
    ok = (np.asarray(out) == ref).all()
    say(f"P2 int8 dot (128x256x256): {'EXACT' if ok else 'WRONG'}")

    # decode-shaped M=16
    a2 = rng.integers(-127, 128, size=(16, 256)).astype(np.int8)
    out2 = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((16, 256), jnp.int32),
    )(jnp.asarray(a2), jnp.asarray(b))
    ok2 = (np.asarray(out2) == a2.astype(np.int32) @ b.astype(np.int32)).all()
    say(f"P2 int8 dot M=16: {'EXACT' if ok2 else 'WRONG'}")


# ------------------------------------------------------------------ P3
def p3_i8_to_bf16():
    def kern(x_ref, o_ref):
        i8 = pltpu.bitcast(x_ref[:], jnp.int8)
        o_ref[:] = i8.astype(jnp.bfloat16)

    words = np.arange(16 * 128, dtype=np.uint32).reshape(16, 128) & 0x7F7F7F7F
    x = jnp.asarray(words.view(np.int32))
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.bfloat16),
    )(x)
    say(f"P3 i8->bf16 convert OK; sample={np.asarray(out[:3, :2]).tolist()}")


# ------------------------------------------------------------------ P4
MASK2 = 0x03030303
MASK1 = 0x01010101


def _unpack_w2a8_words(p32):
    """[R, BN] i32 words -> [16R, BN] int8 biased values {0,1,3,4}."""
    planes = []
    for p in range(4):
        t = (p32 >> (2 * p)) & MASK2
        b = t + ((t >> 1) & MASK1)
        planes.append(pltpu.bitcast(b, jnp.int8))
    return jnp.concatenate(planes, axis=0)


def pack_w2a8_host(codes_kn: np.ndarray) -> np.ndarray:
    """Pack codes [K, N] (K % 256 == 0) -> i32 words [K/16, N].

    Inverse of the kernel chain assuming bitcast row 4s+j <- byte j of
    word sublane s (verified by P1).  Kernel output row (within KT=256
    subtile) r = p*64 + 4s + j holds code from bits [8j+2p] of word s.
    So logical row r -> (p, s, j) = (r // 64, (r % 64) // 4, r % 4).
    """
    K, N = codes_kn.shape
    assert K % 256 == 0
    words = np.zeros((K // 16, N), np.uint32)
    for r in range(256):
        p, s, j = r // 64, (r % 64) // 4, r % 4
        c = codes_kn[r::256].astype(np.uint32)      # [K/256, N]
        words[s::16] |= c << (8 * j + 2 * p)
    return words.view(np.int32)


def p4_unpack_chain():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(256, 128)).astype(np.uint8)
    words = jnp.asarray(pack_w2a8_host(codes))

    def kern(w_ref, o_ref):
        o_ref[:] = _unpack_w2a8_words(w_ref[:].astype(jnp.int32))

    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int8),
    )(words)
    biased = codes + (codes >> 1)   # {0,1,3,4}
    ok = (np.asarray(out) == biased).all()
    say(f"P4 full unpack chain vs host: {'EXACT' if ok else 'WRONG'}")
    if not ok:
        got = np.asarray(out[:, 0])
        say(f"   got[:16]={got[:16].tolist()} want={biased[:16, 0].tolist()}")


# ------------------------------------------------------------------ P5
def _w2a8_kernel(x_ref, w_ref, sumq_ref, sx_ref, out_ref, acc_ref,
                 *, n_k: int, wkt: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for t in range(wkt):
        p32 = w_ref[pl.ds(t * 16, 16), :].astype(jnp.int32)
        w = _unpack_w2a8_words(p32)                     # [256, BN] i8
        acc_ref[:] += jnp.dot(
            x_ref[:, pl.ds(t * 256, 256)], w,
            preferred_element_type=jnp.int32,
        )

    @pl.when(k == n_k - 1)
    def _():
        corr = acc_ref[:] - 2 * sumq_ref[:]             # zero-point
        out_ref[:] = (corr.astype(jnp.float32)
                      * sx_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def w2a8_matmul(x, words, scale, bm=16, bn=2560, bkt=4, out_dtype=jnp.bfloat16):
    """x [M, K] float; words [K/16, N] i32; per-tensor scale."""
    M, K = x.shape
    N = words.shape[1]
    xf = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
    sx = absmax / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    sumq = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)

    Mp = max(bm, -(-M // bm) * bm)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sumq = jnp.pad(sumq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)
    sxs = sx * jnp.float32(scale)

    bk = bkt * 256
    n_k = K // bk
    grid = (Mp // bm, N // bn, n_k)
    out = pl.pallas_call(
        lambda *a: _w2a8_kernel(*a, n_k=n_k, wkt=bkt),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xq, words, sumq, sxs)
    return out[:M]


def p5_correctness_and_timing():
    from bitnet_tpu.ops.linear import qk256_linear_from_codes
    from bitnet_tpu.ops.ternary_matmul import ternary_matmul_pallas
    from bitnet_tpu.obs.timing import chain_timer

    rng = np.random.default_rng(2)
    K, N = 2560, 13824          # fused gate+up, the largest decode matmul
    codes = rng.integers(0, 4, size=(K, N)).astype(np.uint8)
    scale = 0.02

    x = rng.standard_normal((1, K)).astype(np.float32)
    xj = jnp.asarray(x, jnp.bfloat16)

    # reference: exact bf16 pallas path
    lin = qk256_linear_from_codes(codes, scale)
    y_ref = np.asarray(ternary_matmul_pallas(lin, xj)).astype(np.float64)

    words = jnp.asarray(pack_w2a8_host(codes))
    y_w2a8 = np.asarray(
        w2a8_matmul(xj, words, scale, bm=16, bn=2304, bkt=2)
    ).astype(np.float64)

    cos = float(np.dot(y_ref[0], y_w2a8[0]) /
                (np.linalg.norm(y_ref[0]) * np.linalg.norm(y_w2a8[0]) + 1e-30))
    say(f"P5 w2a8 vs bf16-exact cosine = {cos:.6f} "
        f"(max rel err {np.max(np.abs(y_w2a8 - y_ref)) / (np.max(np.abs(y_ref)) + 1e-30):.4f})")

    # --- timing: per-call microbench via loop differencing ---
    def time_fn(step, K):
        def mk(i):
            return jnp.asarray(
                rng.standard_normal((1, K)).astype(np.float32) + i * 0,
                jnp.bfloat16)
        return chain_timer(step, mk, 512, 128, pairs=3)

    def step_old(c):
        y = ternary_matmul_pallas(lin, c)
        return (y[:, :K] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)

    def step_new(c):
        y = w2a8_matmul(c, words, scale, bm=16, bn=2304, bkt=2)
        return (y[:, :K] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)

    t_old = time_fn(step_old, K)
    say(f"P5 timing old qk256 kernel  ({K}x{N}): {t_old*1e6:.1f} us")
    t_new = time_fn(step_new, K)
    say(f"P5 timing w2a8 kernel       ({K}x{N}): {t_new*1e6:.1f} us "
        f"({t_old/t_new:.2f}x)")

    # sweep a couple of block configs for the new kernel
    for bn, bkt in [(2304, 1), (4608, 1), (2304, 5), (6912, 1), (13824, 1)]:
        if N % bn:
            continue
        try:
            def step_cfg(c, bn=bn, bkt=bkt):
                y = w2a8_matmul(c, words, scale, bm=16, bn=bn, bkt=bkt)
                return (y[:, :K] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            t = time_fn(step_cfg, K)
            say(f"P5 w2a8 bn={bn} bkt={bkt}: {t*1e6:.1f} us")
        except Exception as e:
            say(f"P5 w2a8 bn={bn} bkt={bkt}: FAIL {str(e)[:200]}")


def main():
    say(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok1 = run("P1", p1_bitcast_order)
    run("P2", p2_int8_dot)
    run("P3", p3_i8_to_bf16)
    if ok1:
        ok4 = run("P4", p4_unpack_chain)
        if ok4:
            run("P5", p5_correctness_and_timing)
    say("DONE")


if __name__ == "__main__":
    main()
