"""PartitionSpecs for BitNet parameters, KV cache, and activations.

This is the *real* implementation of what the reference only scaffolds
(``bitnet-inference/src/tensor_parallel.rs:15-306``,
``bitnet-gpu-hal/src/tensor_parallel_v2.rs:421-545`` TPLinear/TPEmbedding):

- column-parallel qkv / gate / up  →  weights sharded on N (``model`` axis);
  attention heads and FFN columns become locally-owned shards,
- row-parallel o / down            →  weights sharded on K; XLA inserts the
  ``psum`` (all-reduce) the reference simulates in software,
- KV cache sharded on the KV-heads axis, batch on ``data``,
- logits sharded on vocab when the lm head is untied.

The specs drive ``jax.jit``'s SPMD partitioner (GSPMD): we annotate inputs
with NamedShardings and let XLA place collectives on ICI — no hand-written
transport (SURVEY.md §5 "Distributed communication backend").
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..engine.cache import KVCache
from ..models.bitnet import BitNetParams, BlockParams
from ..ops.linear import TernaryLinear
from .mesh import DATA_AXIS, MODEL_AXIS


def _lin_specs(template: TernaryLinear, col_parallel: bool,
               stacked: bool = True) -> TernaryLinear:
    """Spec tree shaped like ``template`` (same pytree metadata).

    Weight layout is [K, N] ([L, K, N] stacked).  Column-parallel shards N
    on ``model``; row-parallel shards K.  ``packed`` rows are K/4 and
    ``scales`` rows are K/32 — sharding the leading (row) dim of both keeps
    every shard on whole interleave tiles as long as K/tp is a multiple of
    the 256-row granule, which holds for all BitNet dims with tp ≤ 8.
    """
    lead = (None,) if stacked else ()
    if col_parallel:
        mat = P(*lead, None, MODEL_AXIS)
    else:
        mat = P(*lead, MODEL_AXIS, None)
    scales = None
    if template.scales is not None:
        if template.scales.ndim >= (2 + len(lead)):
            if template.scales.shape[-2] == 1:
                # qk256 per-COLUMN vectors [.., 1, N] (concat_linears /
                # _colvec_scales): follow the N shard for col-parallel;
                # replicate for row-parallel (their rows don't shard)
                scales = (P(*lead, None, MODEL_AXIS) if col_parallel
                          else P(*lead, None, None))
            else:
                # per-K-BLOCK scales [.., K/32, N] follow the weight shard
                scales = mat
        else:
            # per-layer scalars → replicate
            scales = P()
    return dataclasses.replace(
        template,
        weight=mat if template.weight is not None else None,
        packed=mat if template.packed is not None else None,
        scales=scales,
    )


def param_pspecs(cfg: ModelConfig, params: BitNetParams) -> BitNetParams:
    """PartitionSpec tree matching ``params``' structure exactly."""
    b = params.blocks

    def opt(t: TernaryLinear | None, col: bool):
        return _lin_specs(t, col) if t is not None else None

    blocks = BlockParams(
        attn_norm=P(None, None),
        wq=opt(b.wq, True),
        wk=opt(b.wk, True),
        wv=opt(b.wv, True),
        wo=_lin_specs(b.wo, False),        # row-parallel → psum
        ffn_norm=P(None, None),
        w_gate=opt(b.w_gate, True),
        w_up=opt(b.w_up, True),
        w_down=_lin_specs(b.w_down, False),  # row-parallel → psum
        wqkv=opt(b.wqkv, True),
        w_gateup=opt(b.w_gateup, True),
        # sub-norm gains align with the column-parallel activation shards
        attn_sub_norm=(P(None, MODEL_AXIS)
                       if b.attn_sub_norm is not None else None),
        ffn_sub_norm=(P(None, MODEL_AXIS)
                      if b.ffn_sub_norm is not None else None),
    )
    lm_head = None
    if params.lm_head is not None:
        lm_head = _lin_specs(params.lm_head, True, stacked=False)
    return BitNetParams(
        embed=P(None, None),        # replicated (tied head needs full rows)
        blocks=blocks,
        final_norm=P(None),
        lm_head=lm_head,
        rope_sin=P(None, None),
        rope_cos=P(None, None),
        embed_q=(P(None, None) if params.embed_q is not None else None),
        embed_q_scale=(P(None) if params.embed_q_scale is not None
                       else None),
    )


def cache_pspecs(cache: KVCache) -> KVCache:
    """[L, B, S, KV, D]: batch on data, KV heads on model."""
    kv = P(None, DATA_AXIS, None, MODEL_AXIS, None)
    sc = P(None, DATA_AXIS, None, MODEL_AXIS)
    return dataclasses.replace(
        cache,
        k=kv, v=kv,
        lengths=P(DATA_AXIS),
        k_scale=sc if cache.k_scale is not None else None,
        v_scale=sc if cache.v_scale is not None else None,
    )


def _put(mesh: Mesh, tree, specs):
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        tree, specs,
    )


def shard_params(mesh: Mesh, cfg: ModelConfig,
                 params: BitNetParams) -> BitNetParams:
    return _put(mesh, params, param_pspecs(cfg, params))


def shard_cache(mesh: Mesh, cache: KVCache) -> KVCache:
    return _put(mesh, cache, cache_pspecs(cache))


def token_pspec() -> P:
    return P(DATA_AXIS, None)


def validate_mesh_for(cfg: ModelConfig, batch_size: int, mesh: Mesh,
                      params: BitNetParams | None = None) -> None:
    """Shared guard for sharding an engine/scheduler onto a mesh
    (divisibility + no fused projections — the fused QKV concat would be
    column-sharded across head boundaries)."""
    from ..errors import ConfigError

    ndp = mesh.shape[DATA_AXIS]
    ntp = mesh.shape[MODEL_AXIS]
    if ndp < 1 or ntp < 1:
        raise ConfigError(f"degenerate mesh shape dp={ndp} tp={ntp}")
    if batch_size % ndp != 0:
        raise ConfigError(
            f"batch/slot count {batch_size} not divisible by data axis "
            f"{ndp}")
    if cfg.num_kv_heads % ntp != 0:
        raise ConfigError(
            f"num_kv_heads {cfg.num_kv_heads} not divisible by model "
            f"axis {ntp}")
    if params is not None and params.blocks.wqkv is not None:
        raise ConfigError(
            "mesh sharding requires unfused projections "
            "(EngineConfig(fuse_projections=False))")


def allocate_sharded_cache(mesh: Mesh, cfg: ModelConfig, batch_size: int,
                           max_seq_len: int, dtype: str = "bf16") -> KVCache:
    """Allocate the KV cache directly WITH its NamedShardings — never
    materializing the whole pool on one device first (a large pool would
    OOM device 0 before resharding)."""
    import jax.numpy as jnp

    from ..engine.cache import _DTYPES

    L, KV, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    jdtype = _DTYPES[dtype]
    quantized = dtype in ("int8", "fp8")
    kv_sh = NamedSharding(mesh, P(None, DATA_AXIS, None, MODEL_AXIS, None))
    sc_sh = NamedSharding(mesh, P(None, DATA_AXIS, None, MODEL_AXIS))
    len_sh = NamedSharding(mesh, P(DATA_AXIS))
    shape = (L, batch_size, max_seq_len, KV, D)
    scale_shape = (L, batch_size, max_seq_len, KV)
    return KVCache(
        k=jnp.zeros(shape, jdtype, device=kv_sh),
        v=jnp.zeros(shape, jdtype, device=kv_sh),
        lengths=jnp.zeros((batch_size,), jnp.int32, device=len_sh),
        k_scale=(jnp.ones(scale_shape, jnp.float32, device=sc_sh)
                 if quantized else None),
        v_scale=(jnp.ones(scale_shape, jnp.float32, device=sc_sh)
                 if quantized else None),
        quantized=quantized,
    )


def allocate_sharded_paged_cache(mesh: Mesh, cfg: ModelConfig,
                                 batch_size: int, num_pages: int,
                                 page_size: int = 16,
                                 max_blocks_per_seq: int | None = None,
                                 dtype: str = "bf16"):
    """Paged page-pool cache allocated WITH its NamedShardings.

    Layout: the pool ``[L, P, page, KV, D]`` shards KV heads on ``model``
    (the same axis the dense cache uses) and is REPLICATED across ``data``
    — pages have no batch identity, any data shard may gather any page
    (the vLLM-on-TP layout).  Block tables / lengths shard their batch
    axis on ``data`` so the gathered view partitions like the dense cache.
    """
    import jax.numpy as jnp

    from ..engine.cache import _DTYPES
    from ..engine.paged_cache import PagedKVCache, PagePool
    from ..errors import InferenceError

    if dtype in ("int8", "fp8"):
        raise InferenceError("paged cache: quantized pages not yet supported")
    if max_blocks_per_seq is None:
        max_blocks_per_seq = num_pages
    L, KV, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    jdtype = _DTYPES[dtype]
    kv_sh = NamedSharding(mesh, P(None, None, None, MODEL_AXIS, None))
    tab_sh = NamedSharding(mesh, P(DATA_AXIS, None))
    len_sh = NamedSharding(mesh, P(DATA_AXIS))
    shape = (L, num_pages, page_size, KV, D)
    cache = PagedKVCache(
        k=jnp.zeros(shape, jdtype, device=kv_sh),
        v=jnp.zeros(shape, jdtype, device=kv_sh),
        tables=jnp.full((batch_size, max_blocks_per_seq), -1, jnp.int32,
                        device=tab_sh),
        lengths=jnp.zeros((batch_size,), jnp.int32, device=len_sh),
        page_size=page_size,
    )
    return cache, PagePool(num_pages)
