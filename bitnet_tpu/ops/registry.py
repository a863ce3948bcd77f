"""Kernel registry: which compute kernels exist and which are usable here.

Rebuild of the reference's kernel registry + capability matrix
(``crates/bitnet-common/src/kernel_registry.rs``,
``bitnet-kernels/src/capability_matrix.rs``, ``KernelManager::select_best``
``bitnet-kernels/src/lib.rs:61-157``): one declarative table instead of a
7-backend dispatch tree — on TPU there are exactly two paths (fused Pallas
vs XLA dequant) plus interpret mode for debugging.

Kernel IDs feed honest-compute receipts (verify/receipts.py) so a receipt
names the real kernels that ran, and validation can reject mock IDs.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    kernel_id: str
    op: str                       # matmul | attention | rmsnorm | ...
    path: str                     # 'pallas' | 'xla' | 'interpret'
    requires_tpu: bool
    description: str


REGISTRY: list[KernelSpec] = [
    KernelSpec("ternary_matmul_qk256_w2a8_stacked", "matmul", "pallas",
               True,
               "scalar-prefetch stacked-layer W2A8 matmul with fused "
               "norm/SwiGLU/residual (shipped decode default)"),
    KernelSpec("ternary_matmul_qk256_w2a8", "matmul", "pallas", True,
               "fused word-unpack + int8 MXU matmul with per-token int8 "
               "activations (shipped TPU default)"),
    KernelSpec("ternary_matmul_qk256_pallas", "matmul", "pallas", True,
               "fused 2-bit unpack + MXU matmul, QK256 no-scale"),
    KernelSpec("ternary_matmul_bitnet32_pallas", "matmul", "pallas", True,
               "fused 2-bit unpack + per-32-block scale + MXU matmul"),
    KernelSpec("ternary_matmul_tl_w2a8_stacked", "matmul", "pallas", True,
               "per-32-block int8-MXU W2A8 matmul for bitnet32/TL "
               "(block-factored scale fma; shipped TL decode default)"),
    KernelSpec("decode_attention_pallas", "attention", "pallas", True,
               "fused flash-decode attention (online softmax over "
               "S-chunks, T=1)"),
    KernelSpec("ffn_w2a8_fused_pallas", "matmul", "pallas", True,
               "single-kernel gate|up + SiLU + down FFN (opt-in)"),
    KernelSpec("logits_head_int8", "matmul", "xla", False,
               "int8 tied-embedding LM head (quantize_head)"),
    KernelSpec("ternary_matmul_xla", "matmul", "xla", False,
               "dequantize-then-matmul, XLA-fused unpack"),
    KernelSpec("dense_matmul_xla", "matmul", "xla", False,
               "bf16 dense matmul (LM head, dense checkpoints)"),
    KernelSpec("attention_gqa_xla", "attention", "xla", False,
               "masked GQA attention, f32 softmax"),
    KernelSpec("rmsnorm_xla", "rmsnorm", "xla", False,
               "RMSNorm (XLA-fused)"),
    KernelSpec("rope_xla", "rope", "xla", False,
               "rotary embedding at absolute positions"),
    KernelSpec("kv_quant_int8", "kv_cache", "xla", False,
               "per-vector absmax int8/fp8 KV quantization"),
    KernelSpec("ternary_matmul_interpret", "matmul", "interpret", False,
               "Pallas interpreter mode (debugging only, not real compute)"),
]


def available_kernels(platform: str | None = None) -> list[KernelSpec]:
    """Kernels usable on ``platform`` ('tpu'/'cpu'; None = probe)."""
    if platform is None:
        import jax

        platform = jax.default_backend()
    on_tpu = platform == "tpu"
    return [k for k in REGISTRY if on_tpu or not k.requires_tpu]


def select_best(op: str, platform: str | None = None) -> KernelSpec:
    """Best available kernel for an op (KernelManager::select_best)."""
    avail = available_kernels(platform)
    order = {"pallas": 0, "xla": 1, "interpret": 2}
    candidates = sorted((k for k in avail if k.op == op),
                        key=lambda k: order[k.path])
    if not candidates:
        from ..errors import KernelError

        raise KernelError(f"no kernel available for op {op!r}")
    return candidates[0]


def is_real_compute(kernel_id: str) -> bool:
    """Receipt gate: interpret/mock kernels are not real compute."""
    lid = kernel_id.lower()
    return not any(w in lid for w in ("interpret", "mock", "fake", "stub"))
