"""Sharded-execution tests on the 8-device virtual CPU mesh.

Unlike the reference — whose distributed layer is an in-process simulation
(``CommBackend::Simulated``, SURVEY.md §2.3) — these tests exercise the
REAL collective code path: GSPMD partitions the same jitted forward across
8 XLA devices and inserts psum/all-gather; results must match the
single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from bitnet_tpu.engine.cache import allocate_cache
from bitnet_tpu.models import load_model
from bitnet_tpu.models.bitnet import forward_cache, logits as model_logits
from bitnet_tpu.parallel import (
    make_mesh,
    param_pspecs,
    shard_cache,
    shard_params,
    token_pspec,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def run_step(cfg, params, tokens, positions, cache, T):
    h, cache = forward_cache(cfg, params, tokens, positions, cache, T, "xla")
    return model_logits(cfg, params, h), cache


class TestShardedForward:
    @pytest.mark.parametrize("dp,tp", [(1, 2), (4, 2), (2, 2), (8, 1)])
    def test_sharded_matches_single_device(self, mini_gguf_qk256, dp, tp):
        m = mini_gguf_qk256
        cfg, params, _ = load_model(m.path, param_dtype=jnp.float32)
        B, T, S = max(2, dp), 8, 32
        rng = np.random.default_rng(0)
        toks = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
        pos = np.tile(np.arange(T, dtype=np.int32)[None], (B, 1))

        # single device
        cache1 = allocate_cache(cfg, B, S, "f32")
        lg1, _ = jax.jit(lambda p, t, q, c: run_step(cfg, p, t, q, c, T)
                         )(params, jnp.asarray(toks), jnp.asarray(pos), cache1)

        # sharded
        mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])
        sp = shard_params(mesh, cfg, params)
        sc = shard_cache(mesh, allocate_cache(cfg, B, S, "f32"))
        ts = NamedSharding(mesh, token_pspec())
        tok_s = jax.device_put(toks, ts)
        pos_s = jax.device_put(pos, ts)
        with mesh:
            lg2, _ = jax.jit(lambda p, t, q, c: run_step(cfg, p, t, q, c, T)
                             )(sp, tok_s, pos_s, sc)

        np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                                   rtol=5e-4, atol=5e-4)

    def test_sharded_decode_step(self, mini_gguf_qk256):
        """Prefill then one decode step under tp=2: cache sharding survives."""
        m = mini_gguf_qk256
        cfg, params, _ = load_model(m.path, param_dtype=jnp.float32)
        B, T, S = 2, 4, 16
        mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
        sp = shard_params(mesh, cfg, params)
        sc = shard_cache(mesh, allocate_cache(cfg, B, S, "f32"))
        rng = np.random.default_rng(1)
        toks = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
        pos = np.tile(np.arange(T, dtype=np.int32)[None], (B, 1))
        with mesh:
            lg, sc = jax.jit(
                lambda p, t, q, c: run_step(cfg, p, t, q, c, T)
            )(sp, jnp.asarray(toks), jnp.asarray(pos), sc)
            nxt = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)
            h, sc = forward_cache(cfg, sp, nxt[:, None],
                                  jnp.full((B, 1), T, jnp.int32), sc, 1, "xla")
            lg2 = model_logits(cfg, sp, h)
        assert np.isfinite(np.asarray(lg2)).all()

    def test_param_specs_cover_tree(self, mini_gguf_qk256):
        cfg, params, _ = load_model(mini_gguf_qk256.path,
                                    param_dtype=jnp.float32)
        specs = param_pspecs(cfg, params)
        # same treedef: every param leaf has a spec
        l1 = jax.tree.structure(params)
        l2 = jax.tree.structure(specs)
        assert l1 == l2


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        lg = out[0]
        assert lg.shape[0] == 1 and np.isfinite(np.asarray(lg)).all()

    def test_dryrun_multichip(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out
