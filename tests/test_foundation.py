"""Foundation-layer tests: arch registry, kernel registry, memory
estimation, warn-once."""

import warnings

import pytest

from bitnet_tpu.config import EngineConfig, ModelConfig
from bitnet_tpu.errors import KernelError, ModelError
from bitnet_tpu.models.arch_registry import (
    list_architectures,
    resolve_arch,
    validate_config_for_arch,
)
from bitnet_tpu.models.memory import estimate_memory, validate_memory
from bitnet_tpu.obs.warn_once import reset_warnings, warn_once
from bitnet_tpu.ops.registry import (
    available_kernels,
    is_real_compute,
    select_best,
)


class TestArchRegistry:
    def test_known_archs(self):
        names = {s.name for s in list_architectures()}
        assert {"bitnet-b1.58", "bitnet", "llama"} <= names

    def test_resolve_exact(self):
        assert resolve_arch("bitnet-b1.58").uses_sub_norm
        assert not resolve_arch("llama").supports_ternary

    def test_resolve_bitnet_alias(self):
        spec = resolve_arch("bitnet-experimental-x")
        assert spec.supports_ternary and spec.name == "bitnet-experimental-x"

    def test_resolve_unknown_warns_llama(self):
        reset_warnings()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            spec = resolve_arch("qwen3")
        assert spec.family == "llama"
        assert any("qwen3" in str(x.message) for x in w)

    def test_envelope_violation(self):
        cfg = ModelConfig(num_layers=30)
        spec = resolve_arch("bitnet-b1.58")
        validate_config_for_arch(cfg, spec)           # fine
        big = ModelConfig(num_layers=30, vocab_size=600_000)
        with pytest.raises(ModelError, match="vocab"):
            validate_config_for_arch(big, spec)


class TestKernelRegistry:
    def test_cpu_excludes_pallas(self):
        ids = {k.kernel_id for k in available_kernels("cpu")}
        assert "ternary_matmul_xla" in ids
        assert "ternary_matmul_qk256_pallas" not in ids

    def test_tpu_includes_pallas_and_wins(self):
        ids = {k.kernel_id for k in available_kernels("tpu")}
        assert "ternary_matmul_qk256_pallas" in ids
        assert select_best("matmul", "tpu").path == "pallas"
        assert select_best("matmul", "cpu").path == "xla"

    def test_unknown_op(self):
        with pytest.raises(KernelError):
            select_best("convolution_3d", "cpu")

    def test_real_compute_gate(self):
        assert is_real_compute("ternary_matmul_qk256_pallas")
        assert not is_real_compute("ternary_matmul_interpret")
        assert not is_real_compute("mock_gemv")


class TestMemoryEstimate:
    def test_2b_shape_is_plausible(self):
        cfg = ModelConfig()      # 2B defaults
        est = estimate_memory(cfg, EngineConfig(max_seq_len=2048))
        # packed ternary 2B ≈ 0.55-0.75 GiB matrices + 0.15 GiB embed
        assert 0.4 * 2**30 < est.param_bytes < 1.5 * 2**30
        assert est.total_bytes < 4 * 2**30
        d = est.as_dict()
        assert d["total_gib"] > 0

    def test_kv_dtype_scales(self):
        cfg = ModelConfig()
        bf16 = estimate_memory(cfg, EngineConfig(kv_cache_dtype="bf16"))
        int8 = estimate_memory(cfg, EngineConfig(kv_cache_dtype="int8"))
        assert int8.kv_cache_bytes < bf16.kv_cache_bytes

    def test_kv_dtype_auto_resolves_by_context_length(self):
        """'auto' = int8 only once the KV read dominates (measured v5e
        crossover — exp_round3b: int8 wins at S=4096, loses at S=1024)."""
        short = EngineConfig(kv_cache_dtype="auto", max_seq_len=1024)
        long = EngineConfig(kv_cache_dtype="auto", max_seq_len=4096)
        assert short.resolve_kv_cache_dtype() == "bf16"
        assert long.resolve_kv_cache_dtype() == "int8"
        # batched pools: int8 wins already at S=1024 on the flat-cache
        # whole-batch v2 kernels (round-4 on-chip: 1.72 vs 2.00 ms/step)
        pool = EngineConfig(kv_cache_dtype="auto", max_seq_len=1024,
                            max_batch_size=8)
        assert pool.resolve_kv_cache_dtype() == "int8"
        explicit = EngineConfig(kv_cache_dtype="fp8", max_seq_len=8192)
        assert explicit.resolve_kv_cache_dtype() == "fp8"
        # memory estimate follows the resolved dtype
        cfg = ModelConfig()
        est_auto = estimate_memory(cfg, long)
        est_int8 = estimate_memory(cfg, EngineConfig(
            kv_cache_dtype="int8", max_seq_len=4096))
        assert est_auto.kv_cache_bytes == est_int8.kv_cache_bytes

    def test_strict_validation_raises(self):
        cfg = ModelConfig()
        with pytest.raises(ModelError, match="HBM"):
            validate_memory(cfg, hbm_bytes=2**20, strict=True)

    def test_tolerant_validation_warns(self):
        reset_warnings()
        cfg = ModelConfig()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            est = validate_memory(cfg, hbm_bytes=2**20, strict=False)
        assert est.total_bytes > 2**20
        assert any("HBM" in str(x.message) for x in w)


class TestWarnOnce:
    def test_once_only(self):
        reset_warnings()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert warn_once("dup message") is True
            assert warn_once("dup message") is False
        assert len(w) == 1
