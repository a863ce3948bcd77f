"""GGUF → BitNetParams loader.

Capability parity with ``ModelLoader`` + ``BitNetModel::from_gguf``
(``crates/bitnet-models/src/loader.rs:52-75``, ``src/bitnet.rs:37-81``):
- mmap read, per-tensor I2_S flavor detection (``types.rs:868``),
- QK256 weights kept **packed** (raw 2-bit codes repacked to the TPU
  interleaved layout) exactly as the reference keeps raw QK256 bytes for
  its fast GEMV path (``bitnet.rs:37-81``),
- everything else dequantized to bf16/f32,
- orientation check against the expected [out, in] shape from the config
  (``formats/gguf/loader.rs:1427-1480``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..errors import ModelError
from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader, TensorInfo
from ..quant.flavor import I2SFlavor, detect_i2s_flavor
from ..quant.i2s import BLOCK32, DATA_BYTES32, INLINE_BYTES32
from ..quant.qk256 import (
    QK256_BLOCK,
    QK256_PACKED_BYTES,
    dequantize_iq2s,
    dequantize_qk256,
)
from ..quant.ternary import unpack_codes_lsb_first
from ..ops.linear import (
    TernaryLinear,
    bitnet32_linear_from_codes,
    dense_linear,
    qk256_linear_from_codes,
    qk256_linear_from_payload,
)
from ..ops.rope import build_rope_tables
from .bitnet import BitNetParams, BlockParams
from .config import config_from_gguf
from .weight_map import find_global, find_layer, require_layer, scale_sibling_name


@dataclass
class LoadReport:
    """What actually happened at load — feeds honest-compute receipts."""

    path: str
    flavors: dict[str, str]
    kinds: dict[str, str]          # role → 'dense' | 'qk256' | 'bitnet32'
    dequantized: list[str]
    config: ModelConfig | None = None


def _as_param(a: np.ndarray, dtype) -> jnp.ndarray:
    """``jnp.asarray(a, dtype)`` with a vectorized f32→bf16 cast.

    ml_dtypes' scalar bfloat16 cast runs ~20 MB/s — ~16 s for a 2B
    embedding table.  The RNE bit-twiddle below is bit-identical
    (tests/test_native.py exhausts every f32 high halfword incl.
    NaN/inf/subnormals) and runs at memory bandwidth.
    """
    a = np.asarray(a)
    if dtype != jnp.bfloat16 or a.dtype != np.float32:
        return jnp.asarray(a, dtype=dtype)
    import ml_dtypes

    # typed constants throughout: numpy 2's weak-promotion path makes
    # `uint32 >> python_int` ~55x slower than `uint32 >> np.uint32(...)`
    c16, c1 = np.uint32(16), np.uint32(1)
    u = np.ascontiguousarray(a).view(np.uint32)
    out = ((u + np.uint32(0x7FFF) + ((u >> c16) & c1)) >> c16).astype(
        np.uint16)
    nan = (u & np.uint32(0x7F800000)) == np.uint32(0x7F800000)
    nan &= (u & np.uint32(0x007FFFFF)) != np.uint32(0)
    if nan.any():
        # quiet the NaN explicitly — the additive rounding would carry
        # a small payload into the exponent and produce inf
        out = np.where(nan, ((u >> c16).astype(np.uint16)
                             | np.uint16(0x0040)), out)
    return jnp.asarray(out.view(ml_dtypes.bfloat16))


def _to_float(reader: GGUFReader, info: TensorInfo) -> np.ndarray:
    """Dequantize/convert any supported tensor to float32 [logical_shape]."""
    t = info.ggml_type
    if t in (GGMLType.F32, GGMLType.F16, GGMLType.F64):
        return np.asarray(reader.tensor_data(info.name), dtype=np.float32)
    if t == GGMLType.BF16:
        raw = reader.tensor_data(info.name)  # uint16 words
        return (raw.astype(np.uint32) << 16).view(np.float32).astype(np.float32)
    if t == GGMLType.IQ2_S:
        flat = dequantize_iq2s(reader.tensor_bytes(info.name), info.nelems)
        return flat.reshape(info.logical_shape)
    if t in (GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1,
             GGMLType.Q5_0, GGMLType.Q5_1):
        # classic GGML block quants — generic llama-family GGUFs; the
        # reference keeps these as raw bytes (loader.rs:1622), we decode
        from ..quant import ggml_classic as gc

        fn = {GGMLType.Q8_0: gc.dequantize_q8_0,
              GGMLType.Q4_0: gc.dequantize_q4_0,
              GGMLType.Q4_1: gc.dequantize_q4_1,
              GGMLType.Q5_0: gc.dequantize_q5_0,
              GGMLType.Q5_1: gc.dequantize_q5_1}[t]
        flat = fn(reader.tensor_bytes(info.name), info.nelems)
        return flat.reshape(info.logical_shape)
    if t in (GGMLType.Q4_K, GGMLType.Q6_K):
        from ..quant import ggml_classic as gc

        fn = {GGMLType.Q4_K: gc.dequantize_q4_k,
              GGMLType.Q6_K: gc.dequantize_q6_k}[t]
        flat = fn(reader.tensor_bytes(info.name), info.nelems)
        return flat.reshape(info.logical_shape)
    if t == GGMLType.I2_S:
        flavor = detect_i2s_flavor(info.nelems, info.nbytes, name=info.name,
                                   cols=int(info.shape[0]) if info.shape else None)
        raw = bytes(reader.tensor_bytes(info.name))
        shape = info.logical_shape
        if flavor == I2SFlavor.GGML_QK256_NO_SCALE:
            rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
            w = dequantize_qk256(raw, rows, shape[-1])
            return w.reshape(shape)
        if flavor == I2SFlavor.BITNET32_F16:
            from ..quant.i2s import dequantize_bitnet32

            return dequantize_bitnet32(raw, info.nelems).reshape(shape)
        # Split32 with optional sibling scales
        from ..quant.i2s import dequantize_split32

        scales = None
        for cand in scale_sibling_name(info.name):
            if cand in reader.tensors:
                scales = _to_float(reader, reader.tensors[cand]).reshape(-1)
                break
        return dequantize_split32(raw, info.nelems, scales).reshape(shape)
    raise ModelError(f"{info.name}: unsupported tensor type {t.name} for dequant")


def _i2s_codes_and_scales(
    reader: GGUFReader, info: TensorInfo, flavor: I2SFlavor
) -> tuple[np.ndarray, np.ndarray | None]:
    """Extract 2-bit codes [rows, cols] (+ per-block scales [rows, cols/32])."""
    shape = info.logical_shape
    if len(shape) == 1:
        rows, cols = 1, shape[0]
    else:
        rows, cols = int(np.prod(shape[:-1])), shape[-1]
    raw = np.frombuffer(bytes(reader.tensor_bytes(info.name)), dtype=np.uint8)

    if flavor == I2SFlavor.GGML_QK256_NO_SCALE:
        bpr = -(-cols // QK256_BLOCK)
        stride = bpr * QK256_PACKED_BYTES
        need = rows * stride
        if raw.size < need:
            raise ModelError(f"{info.name}: QK256 payload too small")
        codes = unpack_codes_lsb_first(raw[:need]).reshape(rows, stride * 4)
        return codes[:, :cols], None

    nblocks = -(-info.nelems // BLOCK32)
    if flavor == I2SFlavor.BITNET32_F16:
        need = nblocks * INLINE_BYTES32
        blocks = raw[:need].reshape(nblocks, INLINE_BYTES32)
        packed = blocks[:, :DATA_BYTES32]
        scales = np.ascontiguousarray(blocks[:, DATA_BYTES32:]).view(np.float16)
        scales = np.clip(np.abs(scales.reshape(nblocks).astype(np.float32)),
                         1e-3, 1e3)
    else:  # SPLIT32_WITH_SIBLING
        need = nblocks * DATA_BYTES32
        packed = raw[:need].reshape(nblocks, DATA_BYTES32)
        scales = None
        for cand in scale_sibling_name(info.name):
            if cand in reader.tensors:
                sib = _to_float(reader, reader.tensors[cand]).reshape(-1)
                scales = sib
                break
        if scales is None:
            scales = np.ones(nblocks, dtype=np.float32)
        elif scales.size == 1:
            scales = np.full(nblocks, scales[0], dtype=np.float32)

    codes = unpack_codes_lsb_first(packed.reshape(-1))
    if cols % BLOCK32 != 0:
        # blocks straddle rows; return flat codes reshaped best-effort
        codes = codes[: info.nelems].reshape(rows, cols)
        return codes, None  # scales folded by caller via dequant fallback
    codes = codes[: info.nelems].reshape(rows, cols)
    scales_2d = scales[: rows * (cols // BLOCK32)].reshape(rows, cols // BLOCK32)
    return codes, scales_2d


def _load_linear(
    reader: GGUFReader,
    name: str,
    out_dim: int,
    in_dim: int,
    mode: str,
    report: LoadReport,
    role: str,
    param_dtype=None,
) -> TernaryLinear:
    """Load one [out, in] weight as a TernaryLinear ([K=in, N=out] layout)."""
    info = reader.tensors[name]
    shape = info.logical_shape
    transposed = False
    if shape == (out_dim, in_dim):
        pass
    elif shape == (in_dim, out_dim):
        # orientation flip (reference: loader.rs:1436-1480)
        transposed = True
    elif int(np.prod(shape)) == out_dim * in_dim:
        pass  # treat as [out, in] row-major
    else:
        raise ModelError(
            f"{name}: shape {shape} incompatible with expected "
            f"({out_dim}, {in_dim})"
        )

    if mode != "dense" and info.ggml_type == GGMLType.I2_S:
        flavor = detect_i2s_flavor(info.nelems, info.nbytes, name=name,
                                   cols=int(info.shape[0]) if info.shape else None)
        report.flavors[name] = flavor.value
        if (flavor == I2SFlavor.GGML_QK256_NO_SCALE
                and shape == (out_dim, in_dim)):
            # fused native path: payload → transpose → interleave →
            # int32 words in ONE pass, no [K, N] codes temporary (the
            # numpy route cost ~170 s on a 2B checkpoint); tensor_bytes
            # is a zero-copy mmap view the native pass reads directly
            report.kinds[role] = "qk256"
            return qk256_linear_from_payload(
                reader.tensor_bytes(info.name), out_dim, in_dim)
        codes, scales = _i2s_codes_and_scales(reader, info, flavor)
        # orientation-flipped storage ([in, out]): the code matrix is
        # already [K=in, N=out] — REPACK, never dequantize (a dense
        # fallback would inflate HBM ~8x and abandon the ternary kernel;
        # the reference re-derives orientation and keeps QK256 packed,
        # formats/gguf/loader.rs:1427-1480)
        if flavor == I2SFlavor.GGML_QK256_NO_SCALE:
            report.kinds[role] = "qk256"
            return qk256_linear_from_codes(
                np.ascontiguousarray(codes) if transposed
                else codes.T)   # view: native repack transposes in-kernel
        if scales is not None and not transposed:
            report.kinds[role] = "bitnet32"
            return bitnet32_linear_from_codes(codes.T, scales.T.copy())
        if scales is not None and transposed:
            # per-block scales follow the STORED row direction, so a
            # transposed tensor's blocks run along N, not K.  A uniform
            # scale transposes trivially; real per-block scales cannot
            # ride the K-block kernel layout — warn loudly and fall
            # through to dense (recorded in the LoadReport).
            uniq = np.unique(np.asarray(scales, np.float32))
            k_t, n_t = codes.shape  # [in, out] already
            if uniq.size == 1 and k_t % BLOCK32 == 0:
                report.kinds[role] = "bitnet32"
                return bitnet32_linear_from_codes(
                    np.ascontiguousarray(codes),
                    np.full((k_t // BLOCK32, n_t), uniq[0], np.float32))
            from ..obs.warn_once import warn_once

            warn_once(
                f"{name}: transposed {flavor.value} tensor with per-block "
                "scales cannot keep the packed kernel layout — "
                "dequantizing to dense (HBM inflates ~8x)")
        elif scales is None and flavor != I2SFlavor.GGML_QK256_NO_SCALE:
            from ..obs.warn_once import warn_once

            warn_once(
                f"{name}: {flavor.value} block structure did not align "
                "(cols % 32 != 0) — dequantizing to dense")

    w = _to_float(reader, info)
    w = w.reshape(shape if len(shape) == 2 else (out_dim, in_dim))
    if transposed:
        w = w.T  # now [out, in]
    report.kinds[role] = "dense"
    report.dequantized.append(name)
    dtype = param_dtype if param_dtype is not None else jnp.bfloat16
    return dense_linear(_as_param(w.T.copy(), dtype))  # [K=in, N=out]


def _stack_linears(lins: list[TernaryLinear]) -> TernaryLinear:
    kinds = {l.kind for l in lins}
    if len(kinds) != 1:
        raise ModelError(f"cannot stack heterogeneous linear kinds {kinds}")
    kind = kinds.pop()
    stack = lambda xs: None if xs[0] is None else jnp.stack(xs)
    return TernaryLinear(
        kind=kind,
        k=lins[0].k,
        n=lins[0].n,
        weight=stack([l.weight for l in lins]),
        packed=stack([l.packed for l in lins]),
        scales=stack([l.scales for l in lins]),
    )


def _resolve_checkpoint(path: str) -> str:
    """Format dispatch (reference ``ModelLoader::load``, loader.rs:52-75):
    GGUF passes through; a SafeTensors file or an HF checkpoint directory
    is converted once to a cached sibling GGUF (mtime-validated) via the
    st2gguf converter (LayerNorms preserved in f16, config.json honored).
    """
    import os as _os

    is_st = path.endswith(".safetensors")
    is_dir = _os.path.isdir(path)
    if is_dir:
        sts = [f for f in sorted(_os.listdir(path))
               if f.endswith(".safetensors")]
        if not sts:
            raise ModelError(f"{path}: directory has no .safetensors")
        is_st = True
    if not is_st:
        return path

    from ..tools.st2gguf import convert_safetensors_to_gguf

    src_mtime = max(
        _os.path.getmtime(_os.path.join(path, f))
        for f in _os.listdir(path) if f.endswith(".safetensors")
    ) if is_dir else _os.path.getmtime(path)
    cache = (path.rstrip("/") + ".converted.gguf") if is_dir \
        else path[: -len(".safetensors")] + ".converted.gguf"
    if (not _os.path.exists(cache)
            or _os.path.getmtime(cache) < src_mtime):
        convert_safetensors_to_gguf(path, cache)
    return cache


def load_model(
    path: str,
    mode: str = "auto",
    max_seq_len: int | None = None,
    param_dtype=jnp.bfloat16,
) -> tuple[ModelConfig, BitNetParams, LoadReport]:
    """Load a BitNet checkpoint: GGUF natively, SafeTensors / HF
    checkpoint directories via a cached conversion (``ModelLoader``
    format dispatch, loader.rs:52-75).

    mode: 'auto' keeps I2_S weights packed (fused-kernel/XLA-unpack path);
          'dense' dequantizes everything to ``param_dtype``.
    """
    path = _resolve_checkpoint(path)
    report = LoadReport(path=path, flavors={}, kinds={}, dequantized=[])
    with GGUFReader(path) as r:
        cfg = config_from_gguf(r)
        report.config = cfg
        # arch envelopes + HBM estimate before committing to the load
        # (production_loader.rs:27-140)
        from .arch_registry import resolve_arch, validate_config_for_arch
        from .memory import validate_memory

        spec = resolve_arch(cfg.architecture)
        validate_config_for_arch(cfg, spec)
        validate_memory(cfg, strict=False)
        names = set(r.tensors)

        emb_name = find_global(names, "token_embd")
        if emb_name is None:
            raise ModelError("no token embedding tensor found")
        # GGUF vocab may be padded beyond the tokenizer's real vocab
        # (reference: real_vocab_size, bitnet-tokenizers/src/lib.rs:111-120)
        embed = _to_float(r, r.tensors[emb_name]).reshape(-1, cfg.hidden_size)
        if embed.shape[0] < cfg.vocab_size:
            raise ModelError(
                f"embedding rows {embed.shape[0]} < vocab {cfg.vocab_size}")
        embed = embed[: cfg.vocab_size]

        H, F = cfg.hidden_size, cfg.intermediate_size
        nh, nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        per_layer: dict[str, list] = {k: [] for k in (
            "attn_norm", "wq", "wk", "wv", "wo",
            "ffn_norm", "w_gate", "w_up", "w_down")}
        for i in range(cfg.num_layers):
            per_layer["attn_norm"].append(jnp.asarray(
                _to_float(r, r.tensors[require_layer(names, "attn_norm", i)])
                .reshape(H), dtype=jnp.float32))
            per_layer["ffn_norm"].append(jnp.asarray(
                _to_float(r, r.tensors[require_layer(names, "ffn_norm", i)])
                .reshape(H), dtype=jnp.float32))
            per_layer["wq"].append(_load_linear(
                r, require_layer(names, "attn_q", i), nh * D, H, mode, report, "wq", param_dtype))
            per_layer["wk"].append(_load_linear(
                r, require_layer(names, "attn_k", i), nkv * D, H, mode, report, "wk", param_dtype))
            per_layer["wv"].append(_load_linear(
                r, require_layer(names, "attn_v", i), nkv * D, H, mode, report, "wv", param_dtype))
            per_layer["wo"].append(_load_linear(
                r, require_layer(names, "attn_output", i), H, nh * D, mode, report, "wo", param_dtype))
            per_layer["w_gate"].append(_load_linear(
                r, require_layer(names, "ffn_gate", i), F, H, mode, report, "w_gate", param_dtype))
            per_layer["w_up"].append(_load_linear(
                r, require_layer(names, "ffn_up", i), F, H, mode, report, "w_up", param_dtype))
            per_layer["w_down"].append(_load_linear(
                r, require_layer(names, "ffn_down", i), H, F, mode, report, "w_down", param_dtype))
            # BitNet 2B-4T sub-layernorms (optional; applied in
            # block_forward — the reference only maps these names)
            asn = find_layer(names, "attn_sub_norm", i)
            if asn is not None:
                per_layer.setdefault("attn_sub_norm", []).append(jnp.asarray(
                    _to_float(r, r.tensors[asn]).reshape(nh * D),
                    dtype=jnp.float32))
            fsn = find_layer(names, "ffn_sub_norm", i)
            if fsn is not None:
                per_layer.setdefault("ffn_sub_norm", []).append(jnp.asarray(
                    _to_float(r, r.tensors[fsn]).reshape(F),
                    dtype=jnp.float32))

        for role in ("attn_sub_norm", "ffn_sub_norm"):
            if role in per_layer and len(per_layer[role]) != cfg.num_layers:
                raise ModelError(
                    f"{role} present for only {len(per_layer[role])} of "
                    f"{cfg.num_layers} layers")
        if "attn_sub_norm" in per_layer:
            cfg = cfg.replace(use_sub_norm=True)
            report.config = cfg

        blocks = BlockParams(
            attn_norm=jnp.stack(per_layer["attn_norm"]),
            wq=_stack_linears(per_layer["wq"]),
            wk=_stack_linears(per_layer["wk"]),
            wv=_stack_linears(per_layer["wv"]),
            wo=_stack_linears(per_layer["wo"]),
            ffn_norm=jnp.stack(per_layer["ffn_norm"]),
            w_gate=_stack_linears(per_layer["w_gate"]),
            w_up=_stack_linears(per_layer["w_up"]),
            w_down=_stack_linears(per_layer["w_down"]),
            attn_sub_norm=(jnp.stack(per_layer["attn_sub_norm"])
                           if "attn_sub_norm" in per_layer else None),
            ffn_sub_norm=(jnp.stack(per_layer["ffn_sub_norm"])
                          if "ffn_sub_norm" in per_layer else None),
        )

        fn_name = find_global(names, "output_norm")
        if fn_name is None:
            raise ModelError("no output_norm tensor found")
        final_norm = jnp.asarray(
            _to_float(r, r.tensors[fn_name]).reshape(H), dtype=jnp.float32)

        lm_head = None
        out_name = find_global(names, "output")
        if out_name is not None:
            lm_head = _load_linear(
                r, out_name, cfg.vocab_size, H, mode, report, "lm_head", param_dtype)

        S = max_seq_len or cfg.max_seq_len
        sin, cos = build_rope_tables(D, S, cfg.rope_base)

        params = BitNetParams(
            embed=_as_param(embed, param_dtype),
            blocks=blocks,
            final_norm=final_norm,
            lm_head=lm_head,
            rope_sin=jnp.asarray(sin),
            rope_cos=jnp.asarray(cos),
        )
        return cfg, params, report
