"""Pipeline parallelism: layer stages over a mesh axis, GPipe microbatching.

The reference only *plans* pipelines (``bitnet-gpu-hal/src/
execution_planner.rs:664-736`` DAG planner, ``src/shard_planner.rs:12-400``
``ShardStrategy{Uniform,WeightBalanced,ActivationBalanced}``) and never
executes across processes.  This module both plans and EXECUTES: layers are
sharded over a ``stage`` mesh axis, activations flow stage→stage with
``jax.lax.ppermute`` over ICI, and microbatches fill the pipe GPipe-style
(S + M - 1 ticks for M microbatches over S stages).

Design notes (TPU-first):
- params.blocks is already stacked on a leading [L] axis — pipeline
  sharding is just a PartitionSpec placing L/num_stages layers per stage;
  no per-stage parameter objects.
- the whole schedule runs inside ONE ``shard_map`` + ``lax.fori_loop``:
  per-tick work is (local-layer scan over a microbatch) + one ppermute —
  XLA overlaps the send with the next tick's compute.
- embedding and the LM head are computed on every stage replica (they are
  cheap and replicated) but only stage 0's input / last stage's output are
  real; this avoids separate embed/head stages and keeps the loop uniform.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..errors import ConfigError

STAGE_AXIS = "stage"


# ---------------------------------------------------------------------------
# Stage planning (reference shard_planner.rs strategies)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class StagePlan:
    """Layer ranges per stage: stage i owns layers [bounds[i], bounds[i+1])."""

    num_stages: int
    bounds: tuple[int, ...]

    @property
    def layers_per_stage(self) -> list[int]:
        return [self.bounds[i + 1] - self.bounds[i]
                for i in range(self.num_stages)]


def plan_stages(
    cfg: ModelConfig,
    num_stages: int,
    strategy: str = "uniform",
    layer_costs: list[float] | None = None,
) -> StagePlan:
    """Assign layers to stages.

    - ``uniform``: equal layer counts (ShardStrategy::Uniform)
    - ``weight_balanced``: balance per-layer parameter bytes
      (ShardStrategy::WeightBalanced) — uniform for BitNet (identical
      blocks) unless ``layer_costs`` is given
    - ``cost``: balance explicit ``layer_costs``
    """
    L = cfg.num_layers
    if num_stages < 1 or num_stages > L:
        raise ConfigError(f"num_stages {num_stages} not in [1, {L}]")
    if strategy not in ("uniform", "weight_balanced", "cost"):
        raise ConfigError(f"unknown stage strategy {strategy!r}")
    if strategy == "uniform" or layer_costs is None:
        base, rem = divmod(L, num_stages)
        sizes = [base + (1 if i < rem else 0) for i in range(num_stages)]
    else:
        if len(layer_costs) != L:
            raise ConfigError("layer_costs length != num_layers")
        total = sum(layer_costs)
        target = total / num_stages
        sizes, acc, count = [], 0.0, 0
        for c in layer_costs:
            acc += c
            count += 1
            if acc >= target and len(sizes) < num_stages - 1:
                sizes.append(count)
                acc, count = 0.0, 0
        sizes.append(count)
        while len(sizes) < num_stages:
            sizes.append(0)
    bounds = [0]
    for s in sizes:
        bounds.append(bounds[-1] + s)
    if 0 in sizes:
        raise ConfigError(
            f"stage plan has an empty stage: {sizes} (reduce num_stages)")
    return StagePlan(num_stages=num_stages, bounds=tuple(bounds))


def make_pipeline_mesh(num_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < num_stages:
        raise ConfigError(
            f"{num_stages} stages need ≥{num_stages} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:num_stages])
    return Mesh(arr, (STAGE_AXIS,))


def pipeline_param_specs(cfg: ModelConfig, params) -> object:
    """PartitionSpecs: blocks sharded on L over ``stage``, rest replicated."""
    from ..models.bitnet import BitNetParams

    def block_spec(leaf):
        return P(STAGE_AXIS)          # shard leading (stacked-L) axis

    blocks = jax.tree.map(block_spec, params.blocks)
    return BitNetParams(
        embed=P(),
        blocks=blocks,
        final_norm=P(),
        lm_head=jax.tree.map(lambda _: P(), params.lm_head)
        if params.lm_head is not None else None,
        rope_sin=P(),
        rope_cos=P(),
    )


def shard_pipeline_params(mesh: Mesh, cfg: ModelConfig, params):
    specs = pipeline_param_specs(cfg, params)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs)


# ---------------------------------------------------------------------------
# GPipe execution
# ---------------------------------------------------------------------------
def pipeline_forward(
    cfg: ModelConfig,
    params,                       # blocks sharded on L over `stage`
    tokens: jnp.ndarray,          # [B, T]
    q_positions: jnp.ndarray,     # [B, T]
    k_cache: jnp.ndarray,         # [L, B, S, KV, D] sharded on L
    v_cache: jnp.ndarray,
    kv_valid_len: jnp.ndarray,    # [B]
    mesh: Mesh,
    num_microbatches: int,
    kernel_path: str = "xla",
):
    """Pipelined forward: returns (logits [B, T, V], k_cache, v_cache).

    ``B`` must be divisible by ``num_microbatches``.  Caller is responsible
    for jitting; cache layers ride sharded on the stage axis so each
    stage's KV writes stay local.
    """
    from ..models.bitnet import block_forward, embed_tokens
    from ..models.bitnet import logits as model_logits
    from ..ops.rmsnorm import rms_norm

    B, T = tokens.shape
    M = num_microbatches
    if B % M != 0:
        raise ConfigError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M
    S_axis = mesh.shape[STAGE_AXIS]
    H = cfg.hidden_size

    # embed on every stage replica (cheap); reshape to [M, mb, T, H]
    x_all = embed_tokens(params, tokens).astype(jnp.float32)
    x_mbs = x_all.reshape(M, mb, T, H)
    pos_mbs = q_positions.reshape(M, mb, T)
    len_mbs = kv_valid_len.reshape(M, mb)

    blocks_spec = jax.tree.map(lambda _: P(STAGE_AXIS), params.blocks)
    cache_spec = P(STAGE_AXIS)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(blocks_spec, P(), P(), P(), P(), P(),
                  cache_spec, cache_spec),
        out_specs=(P(STAGE_AXIS), cache_spec, cache_spec),
        check_vma=False,
    )
    def run(blocks_local, x_mbs, pos_mbs, len_mbs, rope_sin, rope_cos,
            kc_local, vc_local):
        stage = jax.lax.axis_index(STAGE_AXIS)
        n_ticks = M + S_axis - 1

        def layers_fn(x, pos, kc, vc, vl):
            """Apply this stage's local layers to one microbatch."""
            def body(carry, xs):
                h = carry
                bp, kcl, vcl = xs
                y, kcl, vcl, _, _ = block_forward(
                    cfg, h, bp, rope_sin, rope_cos, pos, kcl, vcl, vl,
                    kernel_path)
                return y, (kcl, vcl)

            x, (kc, vc) = jax.lax.scan(body, x, (blocks_local, kc, vc))
            return x, kc, vc

        def tick(t, carry):
            x_buf, out_buf, kc, vc = carry
            m = t - stage               # microbatch index this stage works on
            active = (m >= 0) & (m < M)
            m_safe = jnp.clip(m, 0, M - 1)

            # stage 0 ingests microbatch t from the input queue
            x_in = jax.lax.dynamic_index_in_dim(x_mbs, m_safe, 0,
                                                keepdims=False)
            x_cur = jnp.where(stage == 0, x_in, x_buf)

            pos = jax.lax.dynamic_index_in_dim(pos_mbs, m_safe, 0, False)
            vl = jax.lax.dynamic_index_in_dim(len_mbs, m_safe, 0, False)
            kc_mb = jax.lax.dynamic_slice_in_dim(kc, m_safe * mb, mb, 1)
            vc_mb = jax.lax.dynamic_slice_in_dim(vc, m_safe * mb, mb, 1)

            y, kc_mb, vc_mb = layers_fn(x_cur, pos, kc_mb, vc_mb, vl)

            # only commit KV/output when this stage actually had work
            kc = jnp.where(
                active,
                jax.lax.dynamic_update_slice_in_dim(kc, kc_mb, m_safe * mb, 1),
                kc)
            vc = jnp.where(
                active,
                jax.lax.dynamic_update_slice_in_dim(vc, vc_mb, m_safe * mb, 1),
                vc)
            out_buf = jnp.where(
                (stage == S_axis - 1) & active,
                jax.lax.dynamic_update_slice_in_dim(
                    out_buf, y[None], m_safe, 0),
                out_buf)

            # hand activations to the next stage (ring; last→0 is ignored)
            y_next = jax.lax.ppermute(
                y, STAGE_AXIS,
                [(i, (i + 1) % S_axis) for i in range(S_axis)])
            return y_next, out_buf, kc, vc

        x_buf = jnp.zeros((mb, T, H), jnp.float32)
        out_buf = jnp.zeros((M, mb, T, H), jnp.float32)
        x_buf, out_buf, kc_local, vc_local = jax.lax.fori_loop(
            0, n_ticks, tick, (x_buf, out_buf, kc_local, vc_local))
        # out_specs concatenates stage outputs on axis 0; only the last
        # stage's buffer is real — caller slices it off.
        return out_buf[None], kc_local, vc_local

    out_stages, k_cache, v_cache = run(
        params.blocks, x_mbs, pos_mbs, len_mbs,
        params.rope_sin, params.rope_cos, k_cache, v_cache)
    # [S_axis, M, mb, T, H] → take the last stage, restore [B, T, H]
    hidden = out_stages[-1].reshape(B, T, H)
    hidden = rms_norm(hidden, params.final_norm, cfg.rms_norm_eps)
    lg = model_logits(cfg, params, hidden, kernel_path)
    return lg, k_cache, v_cache
