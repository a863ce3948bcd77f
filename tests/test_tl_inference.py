"""TL1/TL2 runtime-quantized INFERENCE path (VERDICT r2 Missing #2).

The reference ships runtime TL quantizers + table-lookup kernels
(bitnet-quantization/src/tl1.rs:19-82, tl2.rs; AVX paths x86.rs:541,655).
Here any loadable model re-quantizes at engine init into the TL kernel
layout (per-K-block scales, levels {-2,-1,0,1}, zero-point-2 unpack) and
rides the same fused Pallas kernel family — BASELINE config #3.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.ops.linear import (
    TernaryLinear,
    dense_linear,
    dequantize_weight,
    linear_apply,
    tl_linear_from_codes,
)
from bitnet_tpu.quant.tl import (
    TL1_BLOCK,
    TL2_BLOCK,
    dequantize_tl1,
    quantize_linear_tl,
    quantize_params_tl,
    quantize_tl1,
)


class TestTLLinear:
    @pytest.mark.parametrize("block", [TL1_BLOCK, TL2_BLOCK])
    def test_quantize_matches_flat_codec(self, block):
        """Per-[K,N]-column quantization == the flat [out,in] codec."""
        rng = np.random.default_rng(0)
        out_dim, in_dim = 96, 256
        w = rng.standard_normal((out_dim, in_dim)).astype(np.float32)
        lin = quantize_linear_tl(dense_linear(jnp.asarray(w.T)), block)
        assert lin.kind == "tl"
        got = np.asarray(dequantize_weight(lin, jnp.float32))  # [K, N]
        # flat codec reference (row-major [out, in])
        payload, scales = (quantize_tl1(w) if block == TL1_BLOCK
                           else __import__("bitnet_tpu.quant.tl",
                                           fromlist=["quantize_tl2"]
                                           ).quantize_tl2(w))
        from bitnet_tpu.quant.tl import dequantize_tl2
        deq = (dequantize_tl1(payload, w.size, scales) if block == TL1_BLOCK
               else dequantize_tl2(payload, w.size, scales))
        ref = deq.reshape(out_dim, in_dim).T               # [K, N]
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("path", ["xla", "pallas", "w2a8"])
    def test_matmul_matches_dense(self, path):
        rng = np.random.default_rng(1)
        K, N, M = 256, 128, 4
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
        lin = quantize_linear_tl(dense_linear(jnp.asarray(w)), TL1_BLOCK)
        wd = np.asarray(dequantize_weight(lin, jnp.float32))
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        y = np.asarray(linear_apply(lin, x, path=path), np.float32)
        ref = np.asarray(x, np.float32) @ wd
        np.testing.assert_allclose(y, ref, rtol=5e-2, atol=5e-2)

    def test_codes_cover_four_levels(self):
        rng = np.random.default_rng(2)
        w = rng.standard_normal((64, 128)).astype(np.float32)
        lin = quantize_linear_tl(dense_linear(jnp.asarray(w.T)), TL1_BLOCK)
        from bitnet_tpu.ops.linear import unpack_words_host

        codes = unpack_words_host(np.asarray(lin.packed), lin.k)
        assert set(np.unique(codes)) <= {0, 1, 2, 3}
        assert 0 in codes and 1 in codes  # -2 level actually used


class TestTLEngine:
    def test_tl_kernel_matches_tl_dequant_dense(self, mini_gguf_f32):
        """The packed TL kernel path == a dense model built from the SAME
        TL-dequantized weights (codec loss is intrinsic to 2-bit; kernel
        correctness is what's gated here)."""
        tl = InferenceEngine.from_gguf(
            mini_gguf_f32.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32",
                         weight_quant="tl1"))
        assert "weight_quant_tl1" in tl.kernel_recorder
        assert tl.params.blocks.wq.kind == "tl"

        def densify(lin):
            if lin is None:
                return None
            if lin.packed is not None and lin.packed.ndim == 3:
                per = [dequantize_weight(dataclasses.replace(
                    lin, packed=lin.packed[i],
                    scales=lin.scales[i]), jnp.float32)
                    for i in range(lin.packed.shape[0])]
                return TernaryLinear(kind="dense", k=lin.k, n=lin.n,
                                     weight=jnp.stack(per))
            return dense_linear(dequantize_weight(lin, jnp.float32))

        b = tl.params.blocks
        dense_params = dataclasses.replace(
            tl.params,
            blocks=dataclasses.replace(
                b, **{r: densify(getattr(b, r))
                      for r in ("wq", "wk", "wv", "wo",
                                "w_gate", "w_up", "w_down")}),
            lm_head=densify(tl.params.lm_head))
        ref_eng = InferenceEngine(
            tl.cfg, dense_params,
            EngineConfig(max_seq_len=64, compute_dtype="f32"),
            tokenizer=tl.tokenizer)
        a = ref_eng.eval_ids([1, 7, 20, 3]).reshape(-1)
        bb = tl.eval_ids([1, 7, 20, 3]).reshape(-1)
        cos = float(a @ bb / (np.linalg.norm(a) * np.linalg.norm(bb) + 1e-9))
        assert cos > 0.999, cos
        r = tl.generate([1, 5, 9], GenerationConfig(max_new_tokens=6,
                                                    greedy=True))
        assert len(r.token_ids) >= 1

    def test_tl2_with_fused_projections(self, mini_gguf_qk256):
        # the 256-wide fixture has 128-aligned projection widths
        tl = InferenceEngine.from_gguf(
            mini_gguf_qk256.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32",
                         weight_quant="tl2", fuse_projections=True))
        assert tl.params.blocks.wqkv is not None
        assert tl.params.blocks.wqkv.kind == "tl"
        r = tl.generate([2, 4, 8], GenerationConfig(max_new_tokens=5,
                                                    greedy=True))
        assert len(r.token_ids) >= 1

    def test_tl_on_qk256_checkpoint(self, mini_gguf_qk256):
        """TL re-quantization of an already-ternary checkpoint (the 2B
        scenario: QK256 GGUF → runtime TL kernels)."""
        tl = InferenceEngine.from_gguf(
            mini_gguf_qk256.path,
            EngineConfig(max_seq_len=64, weight_quant="tl1"))
        base = InferenceEngine.from_gguf(
            mini_gguf_qk256.path, EngineConfig(max_seq_len=64))
        a = base.eval_ids([1, 7, 20]).reshape(-1)
        b = tl.eval_ids([1, 7, 20]).reshape(-1)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        # ternary values {-1,0,1} are exactly representable in TL levels
        assert cos > 0.995, cos


class TestTLStackedDecode:
    """TL/bitnet32 kinds ride the stacked decode loop via
    ternary_matmul_stacked_tl (scalar-prefetch weight+scale stacks; the
    2·sum32 correction reads scales[l] through XLA dynamic-slice fusion)."""

    def test_stacked_tl_kernel_matches_2d(self):
        from bitnet_tpu.ops.ternary_matmul import (
            _ternary_matmul_2d,
            ternary_matmul_stacked_tl,
        )

        rng = np.random.default_rng(5)
        L, M, K, N = 3, 4, 256, 256
        packs, scs = [], []
        from bitnet_tpu.ops.linear import _repack_words

        for _ in range(L):
            codes = rng.integers(0, 4, (K, N)).astype(np.uint8)
            packs.append(_repack_words(codes))
            scs.append(rng.uniform(0.5, 1.5, (K // 32, N)).astype(
                np.float32))
        packed = jnp.stack([jnp.asarray(p) for p in packs])
        scales = jnp.stack([jnp.asarray(s) for s in scs])
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        for li in range(L):
            ref = _ternary_matmul_2d(
                x, packed[li], scales[li], kind="tl", variant="pallas",
                k_dim=K, n_dim=N, bm=16, bn=128, bkt=1, interpret=True,
                out_dtype=jnp.float32)
            got = ternary_matmul_stacked_tl(
                jnp.int32(li), x, packed, scales, k_dim=K, n_dim=N,
                lut_bias=False, interpret=True, blocks=(16, 128, 1))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("lut_bias", [False, True])
    @pytest.mark.parametrize("mode", ["norm", "nonorm", "glu_resid"])
    def test_fused_tl_kernel_matches_unfused(self, lut_bias, mode):
        """The round-4 fused TL kernel (in-kernel norm/SwiGLU/residual,
        unbiased (v-2)*s32 weights, no XLA correction matmul) must match
        XLA prep + ternary_matmul_stacked_tl."""
        import jax

        from bitnet_tpu.models.bitnet import rms_norm
        from bitnet_tpu.ops.linear import _repack_words
        from bitnet_tpu.ops.ternary_matmul import (
            ternary_matmul_stacked_tl,
            ternary_matmul_stacked_tl_fused,
        )

        rng = np.random.default_rng(11 + int(lut_bias))
        L, M, K, N = 3, 2, 256, 256
        glu = mode == "glu_resid"
        packs, scs = [], []
        for _ in range(L):
            codes = rng.integers(0, 4, (K, N)).astype(np.uint8)
            packs.append(_repack_words(codes))
            scs.append(rng.uniform(0.5, 1.5, (K // 32, N)).astype(
                np.float32))
        packed = jnp.stack([jnp.asarray(p) for p in packs])
        scales = jnp.stack([jnp.asarray(s) for s in scs])
        gamma = (None if mode == "nonorm" else jnp.asarray(
            rng.uniform(0.5, 1.5, (L, K)), jnp.float32))
        x = jnp.asarray(rng.standard_normal((M, 2 * K if glu else K)),
                        jnp.float32)
        resid = (jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
                 if glu else None)
        eps = 1e-5
        for li in range(L):
            x2 = x
            if glu:
                x2 = jax.nn.silu(x2[:, :K]) * x2[:, K:]
            if gamma is not None:
                x2 = rms_norm(x2, gamma[li], eps)
            ref = ternary_matmul_stacked_tl(
                jnp.int32(li), x2, packed, scales, k_dim=K, n_dim=N,
                lut_bias=lut_bias, interpret=True, blocks=(16, 128, 1))
            if resid is not None:
                ref = ref + resid
            got = ternary_matmul_stacked_tl_fused(
                jnp.int32(li), x, packed, scales, gamma, k_dim=K,
                n_dim=N, eps=eps, glu=glu, resid=resid,
                lut_bias=lut_bias, interpret=True, blocks=(16, 128, 1))
            g = np.asarray(got, np.float64)
            r = np.asarray(ref, np.float64)
            # bf16 rounding paths differ (fused rounds (v-2)*s32 once;
            # unfused rounds v*s32 then subtracts an f32 correction) —
            # gate on magnitude-relative error + cosine, not elementwise
            atol = 0.02 * np.abs(r).max()
            np.testing.assert_allclose(g, r, atol=atol)
            cos = float((g * r).sum()
                        / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12))
            assert cos > 0.9999, cos

    @pytest.mark.parametrize("lut_bias", [False, True])
    @pytest.mark.parametrize("mode", ["norm", "nonorm", "glu_resid"])
    def test_tl_w2a8_kernel_exact(self, lut_bias, mode):
        """The round-5 int8-MXU TL kernel must match an EXACT float64
        reference implementing the same semantics (SwiGLU/norm → per-token
        absmax int8 → per-32-block integer dot → f32 block-scale fma):
        the per-block factorization is exact, so the gate is tight
        (relerr < 1e-4), unlike the bf16 kernels' rounding-tolerance
        gates."""
        import jax

        from bitnet_tpu.ops.linear import _repack_words, unpack_words_host
        from bitnet_tpu.ops.ternary_matmul import (
            ternary_matmul_stacked_tl_w2a8,
        )

        rng = np.random.default_rng(31 + int(lut_bias))
        L, M, K, N = 2, 2, 512, 256
        glu = mode == "glu_resid"
        packs, scs = [], []
        for _ in range(L):
            codes = rng.integers(0, 4, (K, N)).astype(np.uint8)
            packs.append(_repack_words(codes))
            scs.append(rng.uniform(0.5, 1.5, (K // 32, N)).astype(
                np.float32))
        packed = jnp.stack([jnp.asarray(p) for p in packs])
        scales = jnp.stack([jnp.asarray(s) for s in scs])
        gamma = (None if mode == "nonorm" else jnp.asarray(
            rng.uniform(0.5, 1.5, (L, K)), jnp.float32))
        x = jnp.asarray(rng.standard_normal((M, 2 * K if glu else K)),
                        jnp.float32)
        resid = (jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
                 if glu else None)
        eps = 1e-5
        for li in range(L):
            x2 = np.asarray(x, np.float64)
            if glu:
                g_ = x2[:, :K]
                x2 = g_ / (1 + np.exp(-g_)) * x2[:, K:]
            if gamma is not None:
                var = (x2 * x2).mean(1, keepdims=True)
                x2 = x2 / np.sqrt(var + eps) * np.asarray(
                    gamma[li], np.float64)
            absmax = np.maximum(np.abs(x2).max(1, keepdims=True), 1e-8)
            sx = absmax / 127.0
            q = np.clip(np.round(x2 / sx), -127, 127)
            c = unpack_words_host(np.asarray(packs[li]),
                                  K)[:, :N].astype(np.int64)
            v = (c + (c >= 2) - 2) if lut_bias else (c - 2)
            w = v * np.repeat(np.asarray(scs[li], np.float64), 32, axis=0)
            ref = (q @ w) * sx
            if resid is not None:
                ref = ref + np.asarray(resid, np.float64)
            got = ternary_matmul_stacked_tl_w2a8(
                jnp.int32(li), x, packed, scales, gamma, k_dim=K,
                n_dim=N, eps=eps, glu=glu, resid=resid, lut_bias=lut_bias,
                interpret=True, blocks=(16, 128, 1))
            g = np.asarray(got, np.float64)
            relerr = np.abs(g - ref).max() / (np.abs(ref).max() + 1e-9)
            assert relerr < 1e-4, (lut_bias, mode, li, relerr)

    def test_tl_w2a8_rejects_unaligned_k(self):
        from bitnet_tpu.errors import KernelError
        from bitnet_tpu.ops.ternary_matmul import (
            ternary_matmul_stacked_tl_w2a8,
        )

        packed = jnp.zeros((1, 16, 128), jnp.int32)   # Kp = 256
        scales = jnp.ones((1, 8, 128), jnp.float32)
        x = jnp.zeros((1, 200), jnp.float32)
        with pytest.raises(KernelError):
            ternary_matmul_stacked_tl_w2a8(
                jnp.int32(0), x, packed, scales, None, k_dim=200,
                n_dim=128, interpret=True)

    def test_fused_tl_rejects_unaligned_k(self):
        from bitnet_tpu.errors import KernelError
        from bitnet_tpu.ops.ternary_matmul import (
            ternary_matmul_stacked_tl_fused,
        )

        packed = jnp.zeros((1, 16, 128), jnp.int32)   # Kp = 256
        scales = jnp.ones((1, 8, 128), jnp.float32)
        x = jnp.zeros((1, 200), jnp.float32)
        with pytest.raises(KernelError):
            ternary_matmul_stacked_tl_fused(
                jnp.int32(0), x, packed, scales, None, k_dim=200,
                n_dim=128, interpret=True)

    def test_tl_w2a8_engine_matches_xla(self, mini_gguf_qk256):
        """TL decode through the stacked loop (kernel_path w2a8) must
        agree with the XLA TL path on logits cosine and a greedy prefix."""
        tl_fast = InferenceEngine.from_gguf(
            mini_gguf_qk256.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32",
                         weight_quant="tl2", kernel_path="w2a8"))
        tl_ref = InferenceEngine.from_gguf(
            mini_gguf_qk256.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32",
                         weight_quant="tl2", kernel_path="xla"))
        a = tl_ref.eval_ids([1, 7, 20, 3]).reshape(-1)
        b = tl_fast.eval_ids([1, 7, 20, 3]).reshape(-1)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.99, cos
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        fast = tl_fast.generate([1, 5, 9], gen).token_ids
        ref = tl_ref.generate([1, 5, 9], gen).token_ids
        agree = sum(1 for x2, y2 in zip(fast, ref) if x2 == y2)
        assert agree >= 4, (fast, ref)

    def test_bitnet32_w2a8_engine_stacked(self, mini_gguf_bitnet32):
        """A bitnet32-flavor GGUF decodes through the stacked loop too."""
        fast = InferenceEngine.from_gguf(
            mini_gguf_bitnet32.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32",
                         kernel_path="w2a8"))
        ref = InferenceEngine.from_gguf(
            mini_gguf_bitnet32.path,
            EngineConfig(max_seq_len=64, compute_dtype="f32",
                         kernel_path="xla"))
        a = ref.eval_ids([1, 7, 20, 3]).reshape(-1)
        b = fast.eval_ids([1, 7, 20, 3]).reshape(-1)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.99, cos
        gen = GenerationConfig(max_new_tokens=6, greedy=True)
        ft = fast.generate([1, 5, 9], gen).token_ids
        rt = ref.generate([1, 5, 9], gen).token_ids
        agree = sum(1 for x2, y2 in zip(ft, rt) if x2 == y2)
        assert agree >= 4, (ft, rt)
