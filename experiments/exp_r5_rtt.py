"""Decompose the per-dispatch fixed cost through the axon relay:
 - host->device transfer latency (small array), serial vs batched
 - null-jit dispatch + scalar readback latency
 - one pool-decode dispatch built from (a) 15 separate host arrays
   (the scheduler's current calling convention) vs (b) 2 packed arrays
This tells us whether packing the scheduler's per-step operands is worth
doing before pipelining.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, n=10):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3, ts[0] * 1e3


def main():
    import bench

    if not bench._wait_for_relay():
        print("relay unreachable", flush=True)
        sys.exit(3)
    print(f"backend={jax.default_backend()}", flush=True)

    a = np.arange(8, dtype=np.int32)

    def one_transfer():
        jnp.asarray(a + 1).block_until_ready()

    m, mn = t(one_transfer)
    print(f"single small transfer: p50 {m:.1f} ms  min {mn:.1f} ms",
          flush=True)

    arrs = [np.arange(8, dtype=np.int32) + i for i in range(15)]

    def fifteen_transfers():
        outs = [jnp.asarray(x) for x in arrs]
        for o in outs:
            o.block_until_ready()

    m, mn = t(fifteen_transfers)
    print(f"15 small transfers:    p50 {m:.1f} ms  min {mn:.1f} ms",
          flush=True)

    @jax.jit
    def null(x):
        return x.sum()

    def null_dispatch():
        float(null(jnp.asarray(a)))

    m, mn = t(null_dispatch)
    print(f"null jit + scalar read: p50 {m:.1f} ms  min {mn:.1f} ms",
          flush=True)

    # device-resident inputs: dispatch + read one scalar
    xd = jnp.arange(1024, dtype=jnp.float32)

    @jax.jit
    def null2(x):
        return (x * 2).sum()

    def disp_dev():
        float(null2(xd))

    m, mn = t(disp_dev)
    print(f"jit on device-resident input + scalar read: p50 {m:.1f} ms  "
          f"min {mn:.1f} ms", flush=True)

    # 15-operand jit with host np inputs vs 2-operand packed
    np15 = [np.zeros((8,), np.float32) + i for i in range(15)]

    @jax.jit
    def f15(*xs):
        return sum(x.sum() for x in xs)

    def disp15():
        float(f15(*np15))

    m, mn = t(disp15)
    print(f"jit with 15 small HOST operands: p50 {m:.1f} ms  min {mn:.1f} "
          "ms", flush=True)

    packed = np.zeros((15, 8), np.float32)

    @jax.jit
    def f2(x):
        return x.sum()

    def disp2():
        float(f2(packed))

    m, mn = t(disp2)
    print(f"jit with 1 packed HOST operand:  p50 {m:.1f} ms  min {mn:.1f} "
          "ms", flush=True)

    # read 2 outputs vs 1 packed output
    @jax.jit
    def g2(x):
        return x * 2, x + 1

    def read2():
        o1, o2 = g2(xd)
        np.asarray(o1), np.asarray(o2)

    m, mn = t(read2)
    print(f"read 2 device outputs:  p50 {m:.1f} ms  min {mn:.1f} ms",
          flush=True)

    @jax.jit
    def g1(x):
        return jnp.concatenate([x * 2, x + 1])

    def read1():
        np.asarray(g1(xd))

    m, mn = t(read1)
    print(f"read 1 packed output:   p50 {m:.1f} ms  min {mn:.1f} ms",
          flush=True)

    # async pipelining probe: issue K dependent dispatches then read last
    @jax.jit
    def stepf(x):
        return x * 1.000001 + 0.5

    def chain_sync(k=8):
        x = xd
        for _ in range(k):
            x = stepf(x)
            x.block_until_ready()
        np.asarray(x)

    def chain_async(k=8):
        x = xd
        for _ in range(k):
            x = stepf(x)
        np.asarray(x)

    m, mn = t(lambda: chain_sync(8), n=5)
    print(f"8 dependent dispatches, SYNC each: p50 {m:.1f} ms min {mn:.1f}",
          flush=True)
    m, mn = t(lambda: chain_async(8), n=5)
    print(f"8 dependent dispatches, async then 1 read: p50 {m:.1f} ms "
          f"min {mn:.1f}", flush=True)


if __name__ == "__main__":
    main()
