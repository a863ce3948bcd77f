"""Orientation-flipped I2_S tensors must stay PACKED (VERDICT r2 Weak #7).

The loader repacks transposed QK256/uniform-scale codes into the kernel
layout instead of dequantizing to dense (reference re-derives orientation
and keeps QK256 packed, formats/gguf/loader.rs:1427-1480).
"""

import numpy as np
import pytest

from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
from bitnet_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def transposed_qk256(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "mini_qk256_t.gguf"
    spec = MiniModelSpec(hidden_size=256, intermediate_size=512,
                         num_heads=4, num_kv_heads=2, quant="qk256",
                         transposed=True)
    return generate_mini_gguf(str(path), spec)


def test_transposed_qk256_stays_packed(transposed_qk256):
    cfg, params, report = load_model(transposed_qk256.path)
    # every linear keeps the packed kernel path — no dense fallback
    assert set(report.kinds.values()) == {"qk256"}, report.kinds
    assert report.dequantized == []
    assert params.blocks.wk.packed is not None
    assert params.blocks.wk.weight is None


def test_transposed_qk256_logits_match_straight(transposed_qk256,
                                                tmp_path_factory):
    """Transposed and straight storage of the same weights produce the
    same model."""
    p2 = tmp_path_factory.mktemp("models") / "mini_qk256_s.gguf"
    spec = MiniModelSpec(hidden_size=256, intermediate_size=512,
                         num_heads=4, num_kv_heads=2, quant="qk256",
                         transposed=False)
    straight = generate_mini_gguf(str(p2), spec)

    from bitnet_tpu.config import EngineConfig
    from bitnet_tpu.engine import InferenceEngine

    ecfg = EngineConfig(max_seq_len=64)
    lg_t = InferenceEngine.from_gguf(
        transposed_qk256.path, ecfg).eval_ids([1, 7, 20, 3])
    lg_s = InferenceEngine.from_gguf(str(p2), ecfg).eval_ids([1, 7, 20, 3])
    np.testing.assert_allclose(lg_t, lg_s, rtol=2e-2, atol=2e-2)


def test_fused_payload_route_matches_codes_route(tmp_path_factory):
    """The loader's fused payload→words native path (straight qk256
    tensors) produces bit-identical packed words to the generic
    codes→repack route (which transposed tensors still take)."""
    import jax

    from bitnet_tpu.gguf.reader import GGUFReader
    from bitnet_tpu.native import qk256_extract_codes
    from bitnet_tpu.ops.linear import qk256_linear_from_codes

    path = tmp_path_factory.mktemp("models") / "mini_qk256_p.gguf"
    spec = MiniModelSpec(hidden_size=256, intermediate_size=512,
                         num_heads=4, num_kv_heads=2, quant="qk256")
    m = generate_mini_gguf(str(path), spec)
    cfg, params, report = load_model(m.path)
    assert set(report.kinds.values()) == {"qk256"}

    r = GGUFReader(m.path)
    try:
        name = "blk.0.attn_k.weight"
        info = r.tensors[name]
        out_dim, in_dim = info.logical_shape
        codes = qk256_extract_codes(
            np.asarray(r.tensor_bytes(name)), out_dim, in_dim)
        want = qk256_linear_from_codes(codes.T.copy())
    finally:
        r.close()
    got = params.blocks.wk.packed[0]   # [L, Kp/16, Np] stacked, layer 0
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(want.packed))


def test_transposed_bitnet32_uniform_scale_stays_packed(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "mini_b32_t.gguf"
    spec = MiniModelSpec(hidden_size=256, intermediate_size=512,
                         num_heads=4, num_kv_heads=2, quant="bitnet32",
                         transposed=True)
    m = generate_mini_gguf(str(path), spec)
    cfg, params, report = load_model(m.path)
    # bitnet32 per-block scales are NOT uniform → transposed linears fall
    # back to dense LOUDLY, straight ones stay packed
    assert report.kinds["wo"] == "bitnet32"     # square → straight
    # the flipped k/v/ffn linears either repacked (uniform) or dense
    for role in ("wk", "wv", "w_gate", "w_up", "w_down"):
        assert report.kinds[role] in ("bitnet32", "dense")
