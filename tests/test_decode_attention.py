"""Fused decode-attention kernel vs the XLA attention path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.ops.attention import attention
from bitnet_tpu.ops.decode_attention import decode_attention


@pytest.mark.parametrize("B,S,H,KV,D,pos", [
    (1, 64, 8, 2, 128, 17),
    (2, 128, 4, 4, 128, 63),   # MHA (G=1), different batch rows
    (3, 32, 8, 2, 128, 0),     # empty cache: only the new token
])
def test_matches_xla_attention(rng, B, S, H, KV, D, pos):
    k_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    positions = jnp.full((B,), pos, jnp.int32)

    out = decode_attention(q, k_new, v_new, k_cache, v_cache, positions,
                           interpret=True)

    # reference: write the new token at slot pos, run the XLA path
    b = jnp.arange(B)[:, None]
    kc = k_cache.at[b, positions[:, None]].set(k_new[:, None][:, 0][:, None])
    vc = v_cache.at[b, positions[:, None]].set(v_new[:, None][:, 0][:, None])
    ref = attention(q[:, None], kc, vc, positions[:, None], positions + 1
                    )[:, 0]
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_ragged_positions(rng):
    B, S, H, KV, D = 4, 64, 8, 4, 128
    k_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((B, S, KV, D)) * 0.3,
                          jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, KV, D)) * 0.3, jnp.bfloat16)
    positions = jnp.asarray([0, 5, 31, 63], jnp.int32)

    out = decode_attention(q, k_new, v_new, k_cache, v_cache, positions,
                           interpret=True)
    b = jnp.arange(B)[:, None]
    kc = k_cache.at[b, positions[:, None]].set(k_new[:, None][:, 0][:, None])
    vc = v_cache.at[b, positions[:, None]].set(v_new[:, None][:, 0][:, None])
    ref = attention(q[:, None], kc, vc, positions[:, None], positions + 1
                    )[:, 0]
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_engine_decode_uses_fused_path(mini_gguf_qk256):
    """Greedy decode via kernel_path='pallas' (fused attention, interpret)
    matches the XLA path on CPU within bf16 tolerance."""
    from bitnet_tpu.config import EngineConfig, GenerationConfig
    from bitnet_tpu.engine import InferenceEngine
    from bitnet_tpu.models import load_model

    cfg, params, _ = load_model(mini_gguf_qk256.path,
                                param_dtype=jnp.float32)
    gen = GenerationConfig(max_new_tokens=6, greedy=True)
    outs = {}
    for kp in ("xla", "pallas"):
        eng = InferenceEngine(cfg, params, EngineConfig(
            max_seq_len=64, kernel_path=kp))
        outs[kp] = eng.generate([1, 7, 20], gen).token_ids
    assert outs["pallas"] == outs["xla"]


class TestStackedKernels:
    """Scalar-prefetch stacked variants (decode hot loop: weights/caches
    indexed by layer without materialized slices)."""

    def _mk(self, B=1, H=4, KV=2, D=64, S=32, L=3, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((L, B, S, KV, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((L, B, S, KV, D)), jnp.float32)
        pos = jnp.asarray([7] * B, jnp.int32)
        return q, kn, vn, kc, vc, pos

    def test_stacked_matches_per_layer(self):
        from bitnet_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_stacked,
        )

        q, kn, vn, kc, vc, pos = self._mk()
        for l in (0, 2):
            ref = decode_attention(q, kn, vn, kc[l], vc[l], pos,
                                   interpret=True)
            got = decode_attention_stacked(jnp.int32(l), q, kn, vn, kc, vc,
                                           pos, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_inplace_writes_row_and_matches(self):
        from bitnet_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_stacked_inplace,
        )

        q, kn, vn, kc, vc, pos = self._mk()
        l = 1
        kc0_np = np.asarray(kc[0])      # inputs are DONATED by the call
        ref = decode_attention(q, kn, vn, kc[l], vc[l], pos, interpret=True)
        got, kc2, vc2 = decode_attention_stacked_inplace(
            jnp.int32(l), q, kn, vn, kc, vc, pos, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # the new k/v row landed at (l, :, pos); other layers untouched
        np.testing.assert_allclose(np.asarray(kc2[l, 0, 7]),
                                   np.asarray(kn[0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vc2[l, 0, 7]),
                                   np.asarray(vn[0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(kc2[0]), kc0_np)

    def test_inplace_drops_oob_write(self):
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_stacked_inplace,
        )

        q, kn, vn, kc, vc, _ = self._mk()
        S = kc.shape[2]
        kc_np = np.asarray(kc)          # inputs are DONATED by the call
        _, kc2, vc2 = decode_attention_stacked_inplace(
            jnp.int32(0), q, kn, vn, kc, vc,
            jnp.asarray([S], jnp.int32), interpret=True)
        np.testing.assert_allclose(np.asarray(kc2), kc_np)

    def test_stacked_matmul_matches_normed(self):
        from bitnet_tpu.models.bitnet import _scale_vec
        from bitnet_tpu.ops.linear import (
            TernaryLinear,
            linear_apply_normed,
        )
        from bitnet_tpu.ops.ternary_matmul import ternary_matmul_stacked

        rng = np.random.default_rng(3)
        L, K, N = 3, 256, 128
        packed = jnp.asarray(rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(L, K // 16, N), dtype=np.int32))
        scales = jnp.asarray(rng.uniform(0.01, 0.03, L), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal((L, K)) * 0.1 + 1.0,
                            jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
        lin_all = TernaryLinear(kind="qk256", k=K, n=N, packed=packed,
                                scales=scales)
        sv = _scale_vec(lin_all)
        for l in range(L):
            lin_l = TernaryLinear(kind="qk256", k=K, n=N, packed=packed[l],
                                  scales=scales[l])
            ref = linear_apply_normed(lin_l, x, gamma[l], path="w2a8")
            got = ternary_matmul_stacked(
                jnp.int32(l), x, packed, sv, gamma,
                k_dim=K, n_dim=N, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


class TestRopeFusedKernel:
    """decode_attention_qkv (opt-in BITNET_ROPE_FUSED path): in-kernel
    RoPE + q/k/v slicing must match apply_rope + decode_attention."""

    def test_qkv_rope_fused_matches_unfused(self):
        from bitnet_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_qkv,
        )
        from bitnet_tpu.ops.rope import apply_rope, build_rope_tables

        rng = np.random.default_rng(5)
        B, H, KV, D, S = 1, 4, 2, 64, 32
        QR = H + 2 * KV
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        pos = jnp.asarray([9] * B, jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin), jnp.asarray(cos)

        # unfused reference: slice, rope in XLA, run the plain kernel
        rows = qkv.reshape(B, QR, D)
        posq = pos[:, None]
        q = apply_rope(rows[:, 0:H][:, None], sin, cos, posq)[:, 0]
        kn = apply_rope(rows[:, H:H + KV][:, None], sin, cos, posq)[:, 0]
        vn = rows[:, H + KV:]
        ref = decode_attention(q, kn, vn, kc, vc, pos, interpret=True)

        got, kr, vr = decode_attention_qkv(
            qkv, sin[pos], cos[pos], kc, vc, pos, n_heads=H,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(kr), np.asarray(kn),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(vr), np.asarray(vn),
                                   rtol=1e-6, atol=1e-6)

    def test_qkv_rope_fused_quant_matches_unfused(self):
        """decode_attention_qkv_quant: in-kernel rope + row quantization +
        int8-stream attention must match apply_rope → _quantize_kv →
        decode_attention_quant."""
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_quant,
            decode_attention_qkv_quant,
        )
        from bitnet_tpu.ops.rope import apply_rope, build_rope_tables

        rng = np.random.default_rng(7)
        B, H, KV, D, S = 1, 4, 2, 64, 32
        QR = H + 2 * KV
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kf = rng.standard_normal((B, S, KV, D)).astype(np.float32)
        vf = rng.standard_normal((B, S, KV, D)).astype(np.float32)
        kc, ks = _quantize_kv(jnp.asarray(kf), jnp.int8)
        vc, vs = _quantize_kv(jnp.asarray(vf), jnp.int8)
        pos = jnp.asarray([9] * B, jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin), jnp.asarray(cos)

        # unfused reference: slice + rope in XLA, quantize new rows in
        # XLA, run the plain quant kernel over round-tripped rows
        rows = qkv.reshape(B, QR, D)
        posq = pos[:, None]
        q = apply_rope(rows[:, 0:H][:, None], sin, cos, posq)[:, 0]
        kn = apply_rope(rows[:, H:H + KV][:, None], sin, cos, posq)[:, 0]
        vn = rows[:, H + KV:]
        kq_ref, ksr = _quantize_kv(kn[:, None], jnp.int8)
        vq_ref, vsr = _quantize_kv(vn[:, None], jnp.int8)
        kn_rt = kq_ref[:, 0].astype(jnp.float32) * ksr[:, 0][..., None]
        vn_rt = vq_ref[:, 0].astype(jnp.float32) * vsr[:, 0][..., None]
        ref = decode_attention_quant(q, kn_rt, vn_rt, kc, vc, ks, vs,
                                     pos, interpret=True)

        got, kq, vq, ks_o, vs_o = decode_attention_qkv_quant(
            qkv, sin[pos], cos[pos], kc, vc, ks, vs, pos, n_heads=H,
            interpret=True)
        # bf16-level tolerance: decode_attention_quant's wrapper rounds
        # the round-tripped new rows (and q) through bf16 in XLA; the
        # fused kernel keeps them f32 until the dot — strictly tighter
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=4e-3, atol=4e-3)
        np.testing.assert_array_equal(np.asarray(kq),
                                      np.asarray(kq_ref[:, 0]))
        np.testing.assert_array_equal(np.asarray(vq),
                                      np.asarray(vq_ref[:, 0]))
        np.testing.assert_allclose(np.asarray(ks_o), np.asarray(ksr[:, 0]),
                                   rtol=1e-6, atol=0)
        np.testing.assert_allclose(np.asarray(vs_o), np.asarray(vsr[:, 0]),
                                   rtol=1e-6, atol=0)


class TestBatchedKernel:
    def test_batched_matches_per_b_kernel(self):
        """decode_attention_batched (whole batch per grid step) must match
        decode_attention exactly at the same chunking, including per-b
        masking off different pos values and new-token fold-in."""
        from bitnet_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_batched,
        )

        rng = np.random.default_rng(11)
        B, H, KV, D, S = 8, 4, 2, 64, 128
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention(q, kn, vn, kc, vc, pos, interpret=True,
                               chunk=32)
        got = decode_attention_batched(q, kn, vn, kc, vc, pos,
                                       interpret=True, chunk=32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_batched_engine_tokens_match_xla_attention(self, mini_gguf_qk256,
                                                       monkeypatch):
        """B=4 stacked decode with BITNET_BATCHED_ATTN=1 (pre-write-cache
        pallas kernel) must produce the same tokens as the default XLA
        einsum attention path."""
        import jax.numpy as jnp
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models.loader import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def run(flag):
            monkeypatch.setenv("BITNET_BATCHED_ATTN", flag)
            eng = InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=4,
                             kv_cache_dtype="f32", compute_dtype="f32",
                             kernel_path="w2a8"))
            return [r.token_ids for r in eng.generate_batch(prompts, gen)]

        base = run("0")
        got = run("1")
        assert got == base

    def test_batched_quant_matches_per_b_kernel(self):
        """decode_attention_quant_batched must match decode_attention_quant
        exactly at the same chunking (int8 stream + in-VMEM scale dequant,
        whole batch per grid step)."""
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_quant,
            decode_attention_quant_batched,
        )

        rng = np.random.default_rng(13)
        B, H, KV, D, S = 8, 4, 2, 64, 128
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.integers(-127, 128, (B, S, KV, D)), jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 128, (B, S, KV, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(1e-3, 2e-2, (B, S, KV)), jnp.float32)
        vs = jnp.asarray(rng.uniform(1e-3, 2e-2, (B, S, KV)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention_quant(q, kn, vn, kc, vc, ks, vs, pos,
                                     interpret=True, chunk=32)
        got = decode_attention_quant_batched(q, kn, vn, kc, vc, ks, vs,
                                             pos, interpret=True, chunk=32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_batched_engine_tokens_match_int8_kv(self, mini_gguf_qk256,
                                                 monkeypatch):
        """B=4 stacked decode + int8 KV with BITNET_BATCHED_ATTN=1 must
        agree with the default dequant-in-XLA einsum attention path
        (near-identical numerics: the kernel keeps bf16 q/cache rounding,
        the XLA path dequantizes to f32 — require full prefix match on a
        short greedy run)."""
        import jax.numpy as jnp
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models.loader import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def run(flag):
            monkeypatch.setenv("BITNET_BATCHED_ATTN", flag)
            eng = InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=4,
                             kv_cache_dtype="int8", compute_dtype="f32",
                             kernel_path="w2a8"))
            return [r.token_ids for r in eng.generate_batch(prompts, gen)]

        base = run("0")
        got = run("1")
        agree = sum(a == b for a, b in zip(base, got))
        assert agree >= 3, (base, got)


class TestKernelGeometries:
    """Parity across GQA geometries (KV, G, D, S, chunk) — guards the
    shared _gqa_helpers factory all kernels now use."""

    @pytest.mark.parametrize("KV,G,D,S,chunk", [
        (1, 4, 64, 64, 16),    # MQA
        (2, 1, 64, 96, 32),    # MHA-ish (G=1), S not a chunk power
        (5, 4, 128, 128, 64),  # 2B-4T geometry (scaled S)
        (3, 2, 64, 80, 16),    # odd KV
    ])
    def test_batched_vs_per_b_all_geometries(self, KV, G, D, S, chunk):
        from bitnet_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_batched,
        )

        H = KV * G
        B = 3
        rng = np.random.default_rng(KV * 100 + G)
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention(q, kn, vn, kc, vc, pos, interpret=True,
                               chunk=chunk)
        got = decode_attention_batched(q, kn, vn, kc, vc, pos,
                                       interpret=True, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("KV,G", [(1, 4), (2, 2), (5, 4)])
    def test_rope_fused_quant_geometries(self, KV, G):
        """Rope-fused int8 kernel across head geometries vs the unfused
        quant reference (same recipe as the main parity test)."""
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_quant,
            decode_attention_qkv_quant,
        )
        from bitnet_tpu.ops.rope import apply_rope, build_rope_tables

        H = KV * G
        B, D, S = 1, 64, 32
        QR = H + 2 * KV
        rng = np.random.default_rng(KV * 10 + G)
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kf = rng.standard_normal((B, S, KV, D)).astype(np.float32)
        vf = rng.standard_normal((B, S, KV, D)).astype(np.float32)
        kc, ks = _quantize_kv(jnp.asarray(kf), jnp.int8)
        vc, vs = _quantize_kv(jnp.asarray(vf), jnp.int8)
        pos = jnp.asarray([11] * B, jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin), jnp.asarray(cos)

        rows = qkv.reshape(B, QR, D)
        posq = pos[:, None]
        q = apply_rope(rows[:, 0:H][:, None], sin, cos, posq)[:, 0]
        kn = apply_rope(rows[:, H:H + KV][:, None], sin, cos, posq)[:, 0]
        vn = rows[:, H + KV:]
        kq_ref, ksr = _quantize_kv(kn[:, None], jnp.int8)
        vq_ref, vsr = _quantize_kv(vn[:, None], jnp.int8)
        kn_rt = kq_ref[:, 0].astype(jnp.float32) * ksr[:, 0][..., None]
        vn_rt = vq_ref[:, 0].astype(jnp.float32) * vsr[:, 0][..., None]
        ref = decode_attention_quant(q, kn_rt, vn_rt, kc, vc, ks, vs,
                                     pos, interpret=True)
        got, kq, vq, _, _ = decode_attention_qkv_quant(
            qkv, sin[pos], cos[pos], kc, vc, ks, vs, pos, n_heads=H,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=4e-3, atol=4e-3)
        np.testing.assert_array_equal(np.asarray(kq),
                                      np.asarray(kq_ref[:, 0]))


class TestBatchedRopeFused:
    def test_qkv_batched_matches_per_b(self):
        """decode_attention_qkv_batched vs decode_attention_qkv at the
        same chunking: exact (same math, same order)."""
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_qkv,
            decode_attention_qkv_batched,
        )
        from bitnet_tpu.ops.rope import build_rope_tables

        rng = np.random.default_rng(17)
        B, H, KV, D, S = 6, 4, 2, 64, 64
        QR = H + 2 * KV
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin)[pos], jnp.asarray(cos)[pos]
        ref_a, ref_k, ref_v = decode_attention_qkv(
            qkv, sin, cos, kc, vc, pos, n_heads=H, interpret=True,
            chunk=32)
        got_a, got_k, got_v = decode_attention_qkv_batched(
            qkv, sin, cos, kc, vc, pos, n_heads=H, interpret=True,
            chunk=32)
        np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

    def test_batched_rope_fused_engine_tokens(self, mini_gguf_qk256,
                                              monkeypatch):
        """B=4 + BITNET_BATCHED_ATTN=1 routes the rope-fused batched
        kernel; tokens must match the default einsum path."""
        import jax.numpy as jnp
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models.loader import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def run(flag):
            monkeypatch.setenv("BITNET_BATCHED_ATTN", flag)
            eng = InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=4,
                             kv_cache_dtype="f32", compute_dtype="f32",
                             kernel_path="w2a8"))
            return [r.token_ids for r in eng.generate_batch(prompts, gen)]

        base = run("0")
        got = run("1")
        agree = sum(a == b for a, b in zip(base, got))
        assert agree >= 3, (base, got)

    def test_qkv_quant_batched_matches_per_b(self):
        """decode_attention_qkv_quant_batched vs the B<=2 rope-fused
        quant kernel: exact at the same chunking."""
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_qkv_quant,
            decode_attention_qkv_quant_batched,
        )
        from bitnet_tpu.ops.rope import build_rope_tables

        rng = np.random.default_rng(19)
        B, H, KV, D, S = 5, 4, 2, 64, 64
        QR = H + 2 * KV
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        vf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        kc, ks = _quantize_kv(kf, jnp.int8)
        vc, vs = _quantize_kv(vf, jnp.int8)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin)[pos], jnp.asarray(cos)[pos]
        ref = decode_attention_qkv_quant(
            qkv, sin, cos, kc, vc, ks, vs, pos, n_heads=H,
            interpret=True, chunk=32)
        got = decode_attention_qkv_quant_batched(
            qkv, sin, cos, kc, vc, ks, vs, pos, n_heads=H,
            interpret=True, chunk=32)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    def test_batched_rope_fused_quant_engine_tokens(self, mini_gguf_qk256,
                                                    monkeypatch):
        """B=4 + int8 KV + BITNET_BATCHED_ATTN=1 routes the rope-fused
        quant batched kernel; tokens must agree with the default path."""
        import jax.numpy as jnp
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models.loader import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def run(flag):
            monkeypatch.setenv("BITNET_BATCHED_ATTN", flag)
            eng = InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=4,
                             kv_cache_dtype="int8", compute_dtype="f32",
                             kernel_path="w2a8"))
            return [r.token_ids for r in eng.generate_batch(prompts, gen)]

        base = run("0")
        got = run("1")
        agree = sum(a == b for a, b in zip(base, got))
        assert agree >= 3, (base, got)


class TestBatchedV2:
    """Round-4 whole-batch v2 kernels (ops/decode_attention_v2.py) — the
    B>2 default: low per-chunk instruction count (q_wide scratch, wide
    context accumulator, MXU scale expand).  Must match the v1 per-b
    kernels at the same chunking."""

    def test_batched_v2_matches_per_b(self):
        from bitnet_tpu.ops.decode_attention import decode_attention
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_batched_v2,
        )

        rng = np.random.default_rng(23)
        B, H, KV, D, S = 6, 4, 2, 64, 64
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention(q, kn, vn, kc, vc, pos, interpret=True,
                               chunk=32)
        got = decode_attention_batched_v2(q, kn, vn, kc, vc, pos,
                                          interpret=True, chunk=32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-3, rtol=2e-3)

    def test_quant_batched_v2_matches_per_b(self):
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import decode_attention_quant
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_quant_batched_v2,
        )

        rng = np.random.default_rng(29)
        B, H, KV, D, S = 5, 4, 2, 64, 64
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        vf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        kc, ks = _quantize_kv(kf, jnp.int8)
        vc, vs = _quantize_kv(vf, jnp.int8)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention_quant(q, kn, vn, kc, vc, ks, vs, pos,
                                     interpret=True, chunk=32)
        got = decode_attention_quant_batched_v2(
            q, kn, vn, kc, vc, ks, vs, pos, interpret=True, chunk=32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-3, rtol=2e-3)

    @pytest.mark.parametrize("B", [24, 32, 48, 64])
    def test_batched_v2_grouped_matches_per_b(self, B):
        """B>16 rides the batch-group grid axis (round-5 _pick_group:
        per-group scratch instead of whole-batch, so B=32 pools no
        longer fall back to einsum)."""
        from bitnet_tpu.ops.decode_attention import decode_attention
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_batched_v2,
        )

        rng = np.random.default_rng(31 + B)
        H, KV, D, S = 4, 2, 64, 64
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention(q, kn, vn, kc, vc, pos, interpret=True,
                               chunk=32)
        got = decode_attention_batched_v2(q, kn, vn, kc, vc, pos,
                                          interpret=True, chunk=32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-3, rtol=2e-3)

    def test_batched_v2_stacked_grouped_matches_per_b(self):
        """The STACKED whole-batch wrapper (the in-model B>2 path) must
        also ride the batch-group axis — B=32 OOMed the VMEM scope in
        the round-5 serving sweep before grouping."""
        from bitnet_tpu.ops.decode_attention import decode_attention
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_batched_v2_stacked,
        )

        rng = np.random.default_rng(41)
        B, H, KV, D, S, L = 32, 4, 2, 64, 64, 3
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((L, B, S, KV, D)),
                         jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((L, B, S, KV, D)),
                         jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        for layer in (0, 2):
            ref = decode_attention(q, kn, vn, kc[layer], vc[layer], pos,
                                   interpret=True, chunk=32)
            got = decode_attention_batched_v2_stacked(
                jnp.int32(layer), q, kn, vn, kc, vc, pos,
                interpret=True, chunk=32)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref, np.float32),
                                       atol=2e-3, rtol=2e-3)

    def test_quant_batched_v2_stacked_grouped_matches_per_b(self):
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import decode_attention_quant
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_quant_batched_v2_stacked,
        )

        rng = np.random.default_rng(43)
        B, H, KV, D, S, L = 32, 4, 2, 64, 64, 2
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kf = jnp.asarray(rng.standard_normal((L, B, S, KV, D)),
                         jnp.float32)
        vf = jnp.asarray(rng.standard_normal((L, B, S, KV, D)),
                         jnp.float32)
        kc, ks = _quantize_kv(kf, jnp.int8)
        vc, vs = _quantize_kv(vf, jnp.int8)
        ks_t = jnp.swapaxes(ks, 2, 3)
        vs_t = jnp.swapaxes(vs, 2, 3)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention_quant(q, kn, vn, kc[1], vc[1], ks[1],
                                     vs[1], pos, interpret=True, chunk=32)
        got = decode_attention_quant_batched_v2_stacked(
            jnp.int32(1), q, kn, vn, kc, vc, ks_t, vs_t, pos,
            interpret=True, chunk=32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-3, rtol=2e-3)

    def test_quant_batched_v2_grouped_matches_per_b(self):
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import decode_attention_quant
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_quant_batched_v2,
        )

        rng = np.random.default_rng(37)
        B, H, KV, D, S = 32, 4, 2, 64, 64
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, D)), jnp.float32)
        kf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        vf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        kc, ks = _quantize_kv(kf, jnp.int8)
        vc, vs = _quantize_kv(vf, jnp.int8)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ref = decode_attention_quant(q, kn, vn, kc, vc, ks, vs, pos,
                                     interpret=True, chunk=32)
        got = decode_attention_quant_batched_v2(
            q, kn, vn, kc, vc, ks, vs, pos, interpret=True, chunk=32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-3, rtol=2e-3)

    def test_qkv_batched_v2_matches_per_b(self):
        from bitnet_tpu.ops.decode_attention import decode_attention_qkv
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_qkv_batched_v2,
        )
        from bitnet_tpu.ops.rope import build_rope_tables

        rng = np.random.default_rng(31)
        B, H, KV, D, S = 6, 4, 2, 64, 64
        QR = H + 2 * KV
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin)[pos], jnp.asarray(cos)[pos]
        ref_a, ref_k, ref_v = decode_attention_qkv(
            qkv, sin, cos, kc, vc, pos, n_heads=H, interpret=True,
            chunk=32)
        got_a, got_k, got_v = decode_attention_qkv_batched_v2(
            qkv, sin, cos, kc, vc, pos, n_heads=H, interpret=True,
            chunk=32)
        np.testing.assert_allclose(np.asarray(got_a, np.float32),
                                   np.asarray(ref_a, np.float32),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

    def test_qkv_quant_batched_v2_matches_per_b(self):
        from bitnet_tpu.models.bitnet import _quantize_kv
        from bitnet_tpu.ops.decode_attention import (
            decode_attention_qkv_quant,
        )
        from bitnet_tpu.ops.decode_attention_v2 import (
            decode_attention_qkv_quant_batched_v2,
        )
        from bitnet_tpu.ops.rope import build_rope_tables

        rng = np.random.default_rng(37)
        B, H, KV, D, S = 5, 4, 2, 64, 64
        QR = H + 2 * KV
        qkv = jnp.asarray(rng.standard_normal((B, QR * D)), jnp.float32)
        kf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        vf = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.float32)
        kc, ks = _quantize_kv(kf, jnp.int8)
        vc, vs = _quantize_kv(vf, jnp.int8)
        pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        sin, cos = build_rope_tables(D, S, 10000.0)
        sin, cos = jnp.asarray(sin)[pos], jnp.asarray(cos)[pos]
        ref = decode_attention_qkv_quant(
            qkv, sin, cos, kc, vc, ks, vs, pos, n_heads=H,
            interpret=True, chunk=32)
        got = decode_attention_qkv_quant_batched_v2(
            qkv, sin, cos, kc, vc, ks, vs, pos, n_heads=H,
            interpret=True, chunk=32)
        np.testing.assert_allclose(np.asarray(got[0], np.float32),
                                   np.asarray(ref[0], np.float32),
                                   atol=2e-3, rtol=2e-3)
        for r, g in zip(ref[1:], got[1:]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    def test_v2_default_engine_tokens(self, mini_gguf_qk256, monkeypatch):
        """The B=4 DEFAULT plan is now qkv_batched_v2 — tokens must match
        the einsum path (BITNET_BATCHED_ATTN=0)."""
        import jax.numpy as jnp
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models.loader import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def run(flag):
            if flag is None:
                monkeypatch.delenv("BITNET_BATCHED_ATTN", raising=False)
            else:
                monkeypatch.setenv("BITNET_BATCHED_ATTN", flag)
            eng = InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=4,
                             kv_cache_dtype="f32", compute_dtype="f32",
                             kernel_path="w2a8"))
            return [r.token_ids for r in eng.generate_batch(prompts, gen)]

        base = run("0")
        got = run(None)
        agree = sum(a == b for a, b in zip(base, got))
        assert agree >= 3, (base, got)

    def test_v2_default_int8_engine_tokens(self, mini_gguf_qk256,
                                           monkeypatch):
        import jax.numpy as jnp
        from bitnet_tpu.config import EngineConfig, GenerationConfig
        from bitnet_tpu.engine import InferenceEngine
        from bitnet_tpu.models.loader import load_model

        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        prompts = [[2, 7, 11], [3, 5, 8, 12, 30], [40, 41], [9]]

        def run(flag):
            if flag is None:
                monkeypatch.delenv("BITNET_BATCHED_ATTN", raising=False)
            else:
                monkeypatch.setenv("BITNET_BATCHED_ATTN", flag)
            eng = InferenceEngine(
                cfg, params,
                EngineConfig(max_seq_len=64, max_batch_size=4,
                             kv_cache_dtype="int8", compute_dtype="f32",
                             kernel_path="w2a8"))
            return [r.token_ids for r in eng.generate_batch(prompts, gen)]

        base = run("0")
        got = run(None)
        agree = sum(a == b for a, b in zip(base, got))
        assert agree >= 3, (base, got)


class TestDecodeAttnPlan:
    """decode_attn_plan is the single source of truth for rows-mode
    kernel selection — pin its gating table."""

    @pytest.mark.parametrize("B,dt,env,want", [
        (1, None, {}, "qkv_v2s"),                      # round-4 default
        (2, "int8", {}, "qkv_quant_v2s"),
        (1, None, {"BITNET_B1_ATTN": "v1"}, "qkv"),
        (2, "int8", {"BITNET_B1_ATTN": "v1"}, "qkv_quant"),
        # fp8 default ON since the round-5 on-chip cast verify
        # (exp_r5_fp8.py cosine 0.99999); =0 restores the einsum fallback
        (1, "fp8", {}, "qkv_quant_v2s"),
        (1, "fp8", {"BITNET_FP8_KERNEL": "1"}, "qkv_quant_v2s"),
        (1, "fp8", {"BITNET_FP8_KERNEL": "0"}, "einsum"),
        # B>2 default: the v2 whole-batch kernels on FLAT caches, einsum
        # on 5D (where the pallas path pays the relayout copy storm)
        (8, None, {"_flat": "1"}, "batched_v2"),
        (8, "int8", {"_flat": "1"}, "quant_batched_v2"),
        (8, None, {}, "einsum"),
        (8, "int8", {}, "einsum"),
        (8, None, {"BITNET_BATCHED_ATTN": "v2", "_flat": "1"},
         "batched_v2"),
        (8, "int8", {"BITNET_BATCHED_ATTN": "v2", "_flat": "1"},
         "quant_batched_v2"),
        (8, None, {"BITNET_BATCHED_ATTN": "v2qkv"}, "qkv_batched_v2"),
        (8, "int8", {"BITNET_BATCHED_ATTN": "v2qkv"},
         "qkv_quant_batched_v2"),
        (8, None, {"BITNET_BATCHED_ATTN": "0"}, "einsum"),
        (8, "int8", {"BITNET_BATCHED_ATTN": "0"}, "einsum"),
        (8, None, {"BITNET_BATCHED_ATTN": "1"}, "qkv_batched"),
        (8, "int8", {"BITNET_BATCHED_ATTN": "1"}, "qkv_quant_batched"),
        (8, None, {"BITNET_BATCHED_ATTN": "1", "BITNET_ROPE_FUSED": "0"},
         "batched"),
        (8, "int8", {"BITNET_BATCHED_ATTN": "1", "BITNET_ROPE_FUSED": "0"},
         "quant_batched"),
        (1, None, {"BITNET_ROPE_FUSED": "0"}, "flash"),
        (1, "int8", {"BITNET_ROPE_FUSED": "0"}, "flash_quant"),
        (8, None, {"BITNET_DECODE_ATTN_MAX_B": "16",
                   "BITNET_ROPE_FUSED": "0"}, "flash"),
    ])
    def test_plan_table(self, B, dt, env, want, monkeypatch):
        from bitnet_tpu.models.bitnet import decode_attn_plan

        for k in ("BITNET_BATCHED_ATTN", "BITNET_ROPE_FUSED",
                  "BITNET_FP8_KERNEL", "BITNET_DECODE_ATTN_MAX_B",
                  "BITNET_CACHE_YS", "BITNET_B1_ATTN"):
            monkeypatch.delenv(k, raising=False)
        env = dict(env)
        flat = env.pop("_flat", None) == "1"
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        dtype = {None: None, "int8": jnp.int8,
                 "fp8": jnp.float8_e4m3fn}[dt]
        assert decode_attn_plan(B, dtype, flat=flat) == want
