"""Generate a FULL-WIDTH synthetic bitnet-b1.58-2B-4T-shaped GGUF.

No real checkpoint is downloadable in this environment (zero egress), but
the >0.99-cosine crossval gate (reference crossval/src/logits_compare.rs:55-98)
must run at the REAL parameterization — H=2560, F=6912, L=30, 20/5 heads,
sub-norms, 32k vocab — to catch width-dependent bugs (lane padding, flavor
detection at real row sizes, sub-norm wiring, f32 accumulation drift over
30 layers) that 256-wide mini fixtures cannot.

Weights are random but VALID I2_S payloads: the loader, the numpy golden
and the independent C++ golden (native/bitnet_golden.cpp) all parse the
same bytes, so logits parity is exactly as meaningful as with trained
weights.  Norm gains are shrunk (as in gguf/fixtures.py) so activations
stay tame through 30 layers.

Usage: python tools/gen_2b_gguf.py [qk256|bitnet32] [out.gguf]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bitnet_tpu.gguf.constants import GGMLType
from bitnet_tpu.gguf.writer import GGUFWriter
from bitnet_tpu.quant.i2s import DATA_BYTES32, INLINE_BYTES32
from bitnet_tpu.quant.qk256 import QK256_BLOCK, QK256_PACKED_BYTES

H, F, L = 2560, 6912, 30
NH, NKV, D = 20, 5, 128
V = 32000
SEQ = 4096


def qk256_payload(rng, out_dim: int, in_dim: int) -> np.ndarray:
    bpr = -(-in_dim // QK256_BLOCK)
    nbytes = out_dim * bpr * QK256_PACKED_BYTES
    return rng.integers(0, 256, size=nbytes, dtype=np.uint8)


def bitnet32_payload(rng, out_dim: int, in_dim: int,
                     scale: float = 0.05) -> np.ndarray:
    nblocks = -(-(out_dim * in_dim) // 32)
    blocks = np.zeros((nblocks, INLINE_BYTES32), np.uint8)
    blocks[:, :DATA_BYTES32] = rng.integers(
        0, 256, size=(nblocks, DATA_BYTES32), dtype=np.uint8)
    blocks[:, DATA_BYTES32:] = np.frombuffer(
        np.float16(scale).tobytes(), np.uint8)
    return blocks.reshape(-1)


def generate(path: str, quant: str = "qk256", seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    arch = "bitnet-b1.58"
    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", "bitnet-2b-4t-synthetic")
    w.add_metadata(f"{arch}.embedding_length", H)
    w.add_metadata(f"{arch}.block_count", L)
    w.add_metadata(f"{arch}.attention.head_count", NH)
    w.add_metadata(f"{arch}.attention.head_count_kv", NKV)
    w.add_metadata(f"{arch}.feed_forward_length", F)
    w.add_metadata(f"{arch}.context_length", SEQ)
    w.add_metadata(f"{arch}.rope.freq_base", 500000.0)
    w.add_metadata(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{arch}.vocab_size", V)
    w.add_metadata("general.file_type", 0)
    tokens = ["<unk>", "<s>", "</s>"] + [f"<tok{i}>" for i in range(V - 3)]
    w.add_metadata("tokenizer.ggml.model", "llama")
    w.add_metadata("tokenizer.ggml.tokens", tokens)
    w.add_metadata("tokenizer.ggml.scores", [0.0] * V)
    w.add_metadata("tokenizer.ggml.token_type", [2, 3, 3] + [6] * (V - 3))
    w.add_metadata("tokenizer.ggml.bos_token_id", 1)
    w.add_metadata("tokenizer.ggml.eos_token_id", 2)
    w.add_metadata("tokenizer.ggml.unknown_token_id", 0)

    # Conditioning matters for a MEANINGFUL parity gate: with naive gains
    # the random ternary weights give attention scores with std ~16 —
    # softmax saturates, any bf16-level perturbation flips which key wins
    # somewhere in 30 layers, and cosine decays per position on EVERY
    # compute path (measured: even pure-bf16-XLA vs the f32 golden fell
    # 0.9996 → 0.866 over 8 positions).  Calibrate instead:
    #   pre-norm gain  ≈ 1/sqrt(H·E[w²]) → unit-variance q/k/v (score
    #   std ≈ 1, smooth softmax), and
    #   sub-norm gain small → residual-dominated stream (trained
    #   checkpoints behave the same way: blocks are refinements).
    ew2 = 2.5                         # E[w²] of the {-2,-1,1,2} LUT
    pre_gain = 1.0 / np.sqrt(H * ew2)
    sub_gain = 0.05

    def norm(name, dim, g):
        w.add_tensor(name, ((np.ones(dim) + rng.standard_normal(dim) * 0.01)
                            * g).astype(np.float32), GGMLType.F32)

    def lin(name, out_dim, in_dim):
        payload = (qk256_payload(rng, out_dim, in_dim) if quant == "qk256"
                   else bitnet32_payload(rng, out_dim, in_dim))
        w.add_quantized_tensor(name, (out_dim, in_dim), GGMLType.I2_S,
                               payload)

    w.add_tensor("token_embd.weight",
                 (rng.standard_normal((V, H)) * 0.02).astype(np.float32),
                 GGMLType.F32)
    for i in range(L):
        t0 = time.time()
        norm(f"blk.{i}.attn_norm.weight", H, pre_gain)
        lin(f"blk.{i}.attn_q.weight", NH * D, H)
        lin(f"blk.{i}.attn_k.weight", NKV * D, H)
        lin(f"blk.{i}.attn_v.weight", NKV * D, H)
        norm(f"blk.{i}.attn_sub_norm.weight", NH * D, sub_gain)
        lin(f"blk.{i}.attn_output.weight", H, NH * D)
        norm(f"blk.{i}.ffn_norm.weight", H, pre_gain)
        lin(f"blk.{i}.ffn_gate.weight", F, H)
        lin(f"blk.{i}.ffn_up.weight", F, H)
        norm(f"blk.{i}.ffn_sub_norm.weight", F, sub_gain)
        lin(f"blk.{i}.ffn_down.weight", H, F)
        print(f"layer {i}: {time.time()-t0:.1f}s", flush=True)
    norm("output_norm.weight", H, 1.0)

    t0 = time.time()
    w.write(path)
    print(f"wrote {path} in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    quant = sys.argv[1] if len(sys.argv) > 1 else "qk256"
    out = (sys.argv[2] if len(sys.argv) > 2
           else f"/tmp/bitnet2b_{quant}.gguf")
    generate(out, quant)
