"""SafeTensors → GGUF converter.

Capability parity with ``bitnet-st2gguf`` (``src/main.rs:113``): reads HF
SafeTensors shards, preserves LayerNorm tensors in float (never quantizes
them — ``src/layernorm.rs:37``), writes GGUF v3 with llama-family names,
optional ternary quantization of the linear weights.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from ..errors import ModelError
from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter

# HF name → GGUF name (inverse of models/weight_map.py)
_HF_TO_GGUF = [
    (re.compile(r"^model\.embed_tokens\.weight$"), "token_embd.weight"),
    (re.compile(r"^model\.norm\.weight$"), "output_norm.weight"),
    (re.compile(r"^lm_head\.weight$"), "output.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.input_layernorm\.weight$"),
     r"blk.\1.attn_norm.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$"),
     r"blk.\1.ffn_norm.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.self_attn\.q_proj\.weight$"),
     r"blk.\1.attn_q.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.self_attn\.k_proj\.weight$"),
     r"blk.\1.attn_k.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.self_attn\.v_proj\.weight$"),
     r"blk.\1.attn_v.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.self_attn\.o_proj\.weight$"),
     r"blk.\1.attn_output.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.mlp\.gate_proj\.weight$"),
     r"blk.\1.ffn_gate.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.mlp\.up_proj\.weight$"),
     r"blk.\1.ffn_up.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.mlp\.down_proj\.weight$"),
     r"blk.\1.ffn_down.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.self_attn\.inner_attn_ln\.weight$"),
     r"blk.\1.attn_sub_norm.weight"),
    (re.compile(r"^model\.layers\.(\d+)\.mlp\.ffn_layernorm\.weight$"),
     r"blk.\1.ffn_sub_norm.weight"),
]


def map_hf_name(name: str) -> str | None:
    for pat, repl in _HF_TO_GGUF:
        if pat.match(name):
            return pat.sub(repl, name)
    return None


def is_norm_tensor(gguf_name: str) -> bool:
    """LayerNorm detection (st2gguf layernorm.rs:37): never quantize norms."""
    return "norm" in gguf_name


def _load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    if os.path.isdir(path):
        # sharded HF layout
        idx = os.path.join(path, "model.safetensors.index.json")
        tensors: dict[str, np.ndarray] = {}
        if os.path.isfile(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            for shard in sorted(set(weight_map.values())):
                tensors.update(load_file(os.path.join(path, shard)))
        else:
            for fn in sorted(os.listdir(path)):
                if fn.endswith(".safetensors"):
                    tensors.update(load_file(os.path.join(path, fn)))
        if not tensors:
            raise ModelError(f"no .safetensors files under {path}")
        return tensors
    return load_file(path)


def convert_safetensors_to_gguf(
    input_path: str,
    output_path: str,
    quant: str = "f16",
    metadata: dict | None = None,
    arch: str = "bitnet-25",
) -> dict:
    """Convert; returns a summary dict. ``quant``: f16|f32|bitnet32|qk256."""
    tensors = _load_safetensors(input_path)
    w = GGUFWriter()

    # infer config from shapes
    cfg_meta = dict(metadata or {})
    emb = None
    for hf_name in ("model.embed_tokens.weight",):
        if hf_name in tensors:
            emb = tensors[hf_name]
    n_layers = 0
    for name in tensors:
        m = re.match(r"^model\.layers\.(\d+)\.", name)
        if m:
            n_layers = max(n_layers, int(m.group(1)) + 1)

    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", os.path.basename(input_path))
    if emb is not None:
        w.add_metadata(f"{arch}.embedding_length", int(emb.shape[1]))
        w.add_metadata(f"{arch}.vocab_size", int(emb.shape[0]))
    w.add_metadata(f"{arch}.block_count", n_layers)
    for k, v in cfg_meta.items():
        w.add_metadata(k, v)

    converted, skipped = [], []
    for hf_name, arr in sorted(tensors.items()):
        gguf_name = map_hf_name(hf_name)
        if gguf_name is None:
            skipped.append(hf_name)
            continue
        arr = np.asarray(arr)
        if arr.dtype == np.float16:
            arr32 = arr.astype(np.float32)
        elif arr.dtype == np.float32:
            arr32 = arr
        else:  # bf16 arrives as uint16 view through safetensors.numpy
            arr32 = arr.astype(np.float32)

        if is_norm_tensor(gguf_name):
            # norms stay f32 — never quantized (layernorm.rs:37)
            w.add_tensor(gguf_name, arr32.astype(np.float32), GGMLType.F32)
        elif quant == "qk256" and arr32.ndim == 2:
            from ..quant.qk256 import quantize_qk256

            w.add_quantized_tensor(gguf_name, tuple(arr32.shape),
                                   GGMLType.I2_S, quantize_qk256(arr32))
        elif quant == "bitnet32" and arr32.ndim == 2:
            from ..quant.i2s import quantize_bitnet32

            w.add_quantized_tensor(gguf_name, tuple(arr32.shape),
                                   GGMLType.I2_S, quantize_bitnet32(arr32))
        elif quant == "f32":
            w.add_tensor(gguf_name, arr32.astype(np.float32), GGMLType.F32)
        else:  # f16 default
            w.add_tensor(gguf_name, arr32.astype(np.float16), GGMLType.F16)
        converted.append(gguf_name)

    w.write(output_path)
    return {"converted": len(converted), "skipped": skipped,
            "layers": n_layers, "output": output_path}
