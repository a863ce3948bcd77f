"""GGUF compatibility diagnosis (reference: ``bitnet-compat``
``src/lib.rs:1-26`` GgufCompatibilityFixer::diagnose).

Checks the metadata/tensor invariants llama.cpp-family loaders rely on and
reports errors/warnings plus proposed fixes.
"""

from __future__ import annotations

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader


REQUIRED_KEYS = ["general.architecture"]
EXPECTED_ARCH_KEYS = [
    "{a}.embedding_length",
    "{a}.block_count",
    "{a}.attention.head_count",
]


def diagnose(path: str) -> dict:
    errors: list[str] = []
    warnings: list[str] = []
    fixes: list[str] = []
    try:
        r = GGUFReader(path)
    except Exception as e:
        return {"path": path, "errors": [f"unreadable: {e}"],
                "warnings": [], "fixes": []}
    with r:
        for k in REQUIRED_KEYS:
            if k not in r.metadata:
                errors.append(f"missing metadata key {k}")
                fixes.append(f"add {k}")
        arch = r.architecture
        if arch:
            for tmpl in EXPECTED_ARCH_KEYS:
                k = tmpl.format(a=arch)
                if k not in r.metadata:
                    warnings.append(f"missing {k} (loader will use defaults)")
        if "tokenizer.ggml.tokens" not in r.metadata:
            warnings.append("no embedded tokenizer vocab; a sibling "
                            "tokenizer.json will be required")
        if "token_embd.weight" not in r.tensors and \
                "model.embed_tokens.weight" not in r.tensors:
            errors.append("no token embedding tensor")
        n_layers = r.arch_key("block_count")
        if n_layers:
            for i in range(int(n_layers)):
                if (f"blk.{i}.attn_q.weight" not in r.tensors and
                        f"model.layers.{i}.self_attn.q_proj.weight"
                        not in r.tensors):
                    errors.append(f"layer {i}: missing attention weights")
                    break
        # I2_S flavor sanity per tensor
        from ..quant.flavor import detect_i2s_flavor

        for info in r:
            if info.ggml_type == GGMLType.I2_S:
                try:
                    detect_i2s_flavor(info.nelems, info.nbytes,
                                      name=info.name)
                except Exception as e:
                    errors.append(str(e))
    return {"path": path, "errors": errors, "warnings": warnings,
            "fixes": fixes}
