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
