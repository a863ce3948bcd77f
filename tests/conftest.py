"""Test configuration.

Tests run on CPU with 8 virtual devices so the *real* collective code paths
are exercised without TPU hardware (SURVEY.md §4 item 8).  This must happen
before jax is imported anywhere.
"""

import os

# FORCE cpu: the environment exports JAX_PLATFORMS=axon (real TPU tunnel)
# and a sitecustomize imports jax at interpreter startup, latching that
# value — so the env var alone is NOT enough; jax.config.update is.
# Tests must be deterministic and must not hold the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Fast tier: `pytest -m "not slow"` is the documented inner loop (~3-5 min);
# the full suite (~30 min: multi-process gloo runs, 8-device GSPMD, paged
# scheduler parity) stays the merge gate.  Heavy modules are marked
# wholesale here so new tests in them inherit the tier; individually heavy
# tests elsewhere carry explicit @pytest.mark.slow.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    "test_multihost", "test_parallel", "test_sharded_engine",
    "test_scheduler_paged", "test_scheduler_parity", "test_scheduler_stress",
    "test_serve", "test_native", "test_batch_api", "test_health_ws",
    "test_speculative", "test_checkpoint_obs", "test_recovery",
}
_SLOW_TESTS = (
    "TestQuantizedKVStacked", "TestPagedForward", "TestQuantizedCacheAccuracy",
    "test_ring_buffer_matches_full_cache_windowed",
    "test_prefill_then_decode_matches_full_forward",
    "test_model_forward_uses_fused_path",
    "test_property_random_shapes",
    "test_top_p_keeps_argmax_and_probability_mass",
    "test_fp8_kv_generates_close_to_f32",
    "test_q8_0_gguf_loads_and_generates",
    "test_distribution_roughly_matches",
    "TestMirostat",
    "test_ring_matches_allgather_sp",
    "TestMultiStepSegments", "TestContextOverflow",
)


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = it.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if (mod.removesuffix(".py") in _SLOW_MODULES
                or any(pat in it.nodeid for pat in _SLOW_TESTS)):
            it.add_marker(pytest.mark.slow)
    # Suite-order shuffle lane (make test-shuffled): order-dependent
    # leaks must not hide behind the default file ordering.  Shuffles at
    # MODULE granularity (session fixtures stay shared within a module;
    # intra-module order is also shuffled) with a printed seed so any
    # failure reproduces with BITNET_TEST_SHUFFLE=<seed>.
    seed_env = os.environ.get("BITNET_TEST_SHUFFLE")
    if seed_env:
        import random as _random
        import time as _time

        seed = (int(seed_env) if seed_env not in ("1", "random")
                else int(_time.time()) % 100000)
        rnd = _random.Random(seed)
        by_mod: dict[str, list] = {}
        for it in items:
            by_mod.setdefault(it.nodeid.split("::", 1)[0], []).append(it)
        mods = list(by_mod)
        rnd.shuffle(mods)
        items[:] = [it for m in mods
                    for it in rnd.sample(by_mod[m], len(by_mod[m]))]
        print(f"\n# suite order shuffled with seed {seed} "
              f"(BITNET_TEST_SHUFFLE={seed} reproduces)")


@pytest.fixture()
def rng():
    # function-scoped: a session-scoped generator made every test's data
    # depend on which tests ran before it (order-dependent tolerance
    # flakes — seen in TestPallasVsXLAPath, 1/4096 elements past atol
    # only under specific file orderings)
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def mini_gguf_f32(tmp_path_factory):
    from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

    path = tmp_path_factory.mktemp("models") / "mini_f32.gguf"
    return generate_mini_gguf(str(path), MiniModelSpec(quant="f32"))


@pytest.fixture(scope="session")
def mini_gguf_qk256(tmp_path_factory):
    from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

    path = tmp_path_factory.mktemp("models") / "mini_qk256.gguf"
    # hidden must produce K >= 256 columns for at least some matrices to
    # exercise multi-block rows: intermediate 512 over hidden 256
    spec = MiniModelSpec(
        hidden_size=256, intermediate_size=512, num_heads=4, num_kv_heads=2,
        quant="qk256",
    )
    return generate_mini_gguf(str(path), spec)


@pytest.fixture(scope="session")
def mini_gguf_bitnet32(tmp_path_factory):
    from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

    path = tmp_path_factory.mktemp("models") / "mini_b32.gguf"
    return generate_mini_gguf(str(path), MiniModelSpec(quant="bitnet32"))
