"""Benchmark harness — prints ONE JSON line for the driver.

Metric: decode tokens/s/chip on a bitnet-b1.58-2B-shaped model
(H=2560, F=6912, L=30, 20 heads / 5 KV heads, vocab 32000 — SURVEY.md §6),
QK256 ternary weights kept packed in HBM, fused Pallas unpack+MXU kernels.

This measures the SHIPPED configuration — fused q|k|v and gate|up
projections (what ``EngineConfig`` defaults produce via
``fuse_block_params``) and the engine's default kernel path (w2a8 on TPU:
int8-MXU with per-token int8 activations, the reference's own W2A8
numerics).  The JSON carries B=1 / B=8 / prefill numbers plus the
HBM-roofline fraction so perf claims are reproducible from this harness
alone (VERDICT round 1, "reconcile bench and README").

``vs_baseline`` is relative to the reference's strongest published decode
number: ~55 tok/s on an RTX 4090 (BASELINE.md, GPU_PERFORMANCE_EXPECTATIONS
measured row).

Timing methodology: see bitnet_tpu/obs/timing.py — loop-in-jit with data
dependence, scalar fetch, loop-length differencing (the axon relay makes
naive block_until_ready timing meaningless).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_BASELINE_TOK_S = 55.0  # RTX 4090 measured (BASELINE.md)

# v5e HBM ≈ 819 GB/s. Per-token decode bytes (the B=1 roofline) are
# computed from the model config by _decode_bytes(): packed ternary
# weight stream + int8 tied-logits head read + KV cache read/write.
# For 2B-4T at S=1024 that is ≈ 521 + 82 + 79 MB.
_HBM_GBPS = 819.0
# v5e MXU peaks (per chip): 393.7 int8 TOPS, 196.9 bf16 TFLOPS.  Prefill
# MFU is measured against a MIXED floor: the ternary W2A8 matmuls + int8
# logits head ride the int8 MXU, attention rides bf16 (see
# _prefill_floor_s; derivation in docs/perf/round5-serving-log.md).
_INT8_OPS = 393.7e12
_BF16_FLOPS = 196.9e12

# Synthetic model parameterizations (no checkpoints in this environment;
# the compute/memory profile is exact). "2b" = bitnet-b1.58-2B-4T
# (driver configs #1-#4); "8b" = Llama-3-8B-1.58 shapes (config #5's
# 8B-class model — ~2 GB packed, single-chip resident; multi-host
# sharding of the same config is exercised by __graft_entry__.py).
_SHAPES = {
    "2b": dict(vocab_size=32000, hidden_size=2560, intermediate_size=6912,
               num_layers=30, num_heads=20, num_kv_heads=5, head_dim=128),
    "8b": dict(vocab_size=128256, hidden_size=4096, intermediate_size=14336,
               num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128),
    # CPU-smoke shape for the --mesh scaling harness (tp≤2 shards the
    # 2 kv heads; virtual-device runs are indicative only)
    "mini": dict(vocab_size=512, hidden_size=256, intermediate_size=512,
                 num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64),
}


def _decode_bytes(cfg, S: int = 1024, kind: str = "qk256") -> float:
    """HBM bytes one B=1 decode step must move (roofline denominator)."""
    H, F = cfg.hidden_size, cfg.intermediate_size
    qkvo = H * (cfg.num_heads * cfg.head_dim) * 2 \
        + H * (cfg.num_kv_heads * cfg.head_dim) * 2
    ffn = 3 * H * F
    elems = cfg.num_layers * (qkvo + ffn)
    weights = elems / 4.0                              # 2-bit packed
    if kind in ("tl", "bitnet32"):
        # per-32-row-block f32 scale planes stream alongside the codes
        weights += elems / 32.0 * 4.0
    head = cfg.vocab_size * H                          # int8 tied logits
    # K+V bf16 full-cache read; the one-row write is negligible
    kv = cfg.num_layers * S * cfg.num_kv_heads * cfg.head_dim * 2 * 2
    return weights + head + kv


def _prefill_floor_s(cfg, T: int = 512) -> float:
    """Compute-bound seconds for a B=1 T-token prefill: MAC ops split by
    the MXU mode each op actually runs in (W2A8 matmuls and the int8
    tied-logits head are int8×int8→int32; attention QK/AV are bf16).
    Causal attention halves the T² score work."""
    H, F = cfg.hidden_size, cfg.intermediate_size
    nh, D = cfg.num_heads, cfg.head_dim
    qkvo = H * (nh * D) * 2 + H * (cfg.num_kv_heads * D) * 2
    ffn = 3 * H * F
    elems = cfg.num_layers * (qkvo + ffn)
    int8_ops = 2.0 * elems * T + 2.0 * cfg.vocab_size * H * T
    bf16_ops = cfg.num_layers * 2 * (2.0 * T * T * nh * D) * 0.5
    # weight stream is read once per prefill — HBM floor, usually ≪ MXU
    hbm_s = _decode_bytes(cfg, S=T) / (_HBM_GBPS * 1e9)
    mxu_s = int8_ops / _INT8_OPS + bf16_ops / _BF16_FLOPS
    return max(mxu_s, hbm_s)


def build_synthetic_2b(seed: int = 0, fuse: bool = True):
    return build_synthetic("2b", seed=seed, fuse=fuse)


def build_synthetic(size: str = "2b", seed: int = 0, fuse: bool = True,
                    kind: str = "qk256"):
    """BitNet-shaped model with random ternary weights.

    No checkpoint is available in this environment; weights are synthetic
    but the compute/memory profile is exactly the real model's.
    ``kind`` selects the quant format the stacks are built in: ``qk256``
    (per-tensor scalar scales — the 2B-4T GGUF flavor) or ``tl`` /
    ``bitnet32`` (per-32-row-block f32 scale planes — BASELINE config #3's
    TL1/TL2 table-lookup parameterization; rides the same stacked decode
    loop via ``ternary_matmul_stacked_tl``).
    """
    import jax.numpy as jnp

    from bitnet_tpu.config import ModelConfig
    from bitnet_tpu.models.bitnet import (
        BitNetParams,
        BlockParams,
        fuse_block_params,
    )
    from bitnet_tpu.ops.linear import TernaryLinear
    from bitnet_tpu.ops.rope import build_rope_tables

    cfg = ModelConfig(
        max_seq_len=4096, rope_base=500000.0, **_SHAPES[size],
    )
    rng = np.random.default_rng(seed)
    L, H, F, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def lin_stack(k, n, scale):
        # random packed words ARE random ternary codes in our interleaved
        # layout — no repack needed for synthetic weights; one RNG call for
        # the whole [L, K/16, N] stack keeps host-side build time low
        kp = -(-k // 256) * 256
        npad = -(-n // 128) * 128
        packed = jnp.asarray(rng.integers(
            np.iinfo(np.int32).min, np.iinfo(np.int32).max,
            size=(L, kp // 16, npad), dtype=np.int32))
        if kind in ("tl", "bitnet32"):
            # per-32-row-block scale planes (the real TL/bitnet32 layout;
            # they stream from HBM with the codes, so the profile is exact)
            scales = jnp.asarray(rng.uniform(
                0.5 * scale, 1.5 * scale,
                size=(L, kp // 32, npad)).astype(np.float32))
            return TernaryLinear(kind=kind, k=k, n=n, packed=packed,
                                 scales=scales)
        return TernaryLinear(kind="qk256", k=k, n=n, packed=packed,
                             scales=jnp.full((L,), scale, jnp.float32))

    s = 0.02  # keeps activations sane through 30 layers
    blocks = BlockParams(
        attn_norm=jnp.ones((L, H), jnp.float32),
        wq=lin_stack(H, nh * D, s),
        wk=lin_stack(H, nkv * D, s),
        wv=lin_stack(H, nkv * D, s),
        wo=lin_stack(nh * D, H, s),
        ffn_norm=jnp.ones((L, H), jnp.float32),
        w_gate=lin_stack(H, F, s),
        w_up=lin_stack(H, F, s),
        w_down=lin_stack(F, H, s),
    )
    if fuse:
        blocks = fuse_block_params(blocks)
    sin, cos = build_rope_tables(D, cfg.max_seq_len, cfg.rope_base)
    params = BitNetParams(
        embed=jnp.asarray(
            rng.standard_normal((V, H), dtype=np.float32) * 0.02,
            jnp.bfloat16),
        blocks=blocks,
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=None,
        rope_sin=jnp.asarray(sin),
        rope_cos=jnp.asarray(cos),
    )
    return cfg, params


def bench_decode(cfg, params, kernel_path: str, B: int = 1, S: int = 1024,
                 n_hi: int = 48, n_lo: int = 12) -> float:
    """Seconds per decode step (batch B), full 30-layer model."""
    import jax
    import jax.numpy as jnp

    from bitnet_tpu.engine.cache import decode_cache_layout
    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer

    # flat [L, B, S, KV*D] when the decode plan rides the stacked pallas
    # kernels (round-4: the 5D carry forced S-minor relayout copies)
    if decode_cache_layout(B, "bf16") == "flat":
        kc0 = jnp.zeros(
            (cfg.num_layers, B, S, cfg.num_kv_heads * cfg.head_dim),
            jnp.bfloat16)
    else:
        kc0 = jnp.zeros(
            (cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
            jnp.bfloat16)

    def step(prm, carry):
        tok, pos, kc, vc = carry
        h, kc, vc, _, _ = forward(
            cfg, prm, tok[:, None],
            jnp.minimum(pos, S - 1)[:, None], kc, vc,
            jnp.minimum(pos, S - 1), 1, kernel_path)
        lg = model_logits(cfg, prm, h, kernel_path)[:, 0, :]
        nxt = jnp.argmax(lg, -1).astype(jnp.int32)
        return nxt, pos + 1, kc, vc

    def mk(i):
        return (jnp.full((B,), (i * 7) % cfg.vocab_size, jnp.int32),
                jnp.zeros((B,), jnp.int32), kc0, jnp.zeros_like(kc0))

    return chain_timer(step, mk, n_hi, n_lo, pairs=3, const_arg=params)


def bench_prefill(cfg, params, kernel_path: str, T: int = 512,
                  S: int = 1024) -> float:
    """Seconds per T-token prefill (batch 1)."""
    import jax
    import jax.numpy as jnp

    from bitnet_tpu.models.bitnet import forward
    from bitnet_tpu.obs.timing import chain_timer

    B = 1
    kc0 = jnp.zeros((cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim),
                    jnp.bfloat16)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))

    def step(prm, carry):
        tok, kc, vc = carry
        h, kc, vc, _, _ = forward(cfg, prm, tok, pos, kc, vc,
                                  jnp.zeros((B,), jnp.int32), T, kernel_path)
        nxt = (tok + h[:, -1, :1].astype(jnp.int32) % 13 + 1) % cfg.vocab_size
        return nxt, kc, vc

    def mk(i):
        return (jnp.full((B, T), (i * 11) % cfg.vocab_size, jnp.int32),
                kc0, jnp.zeros_like(kc0))

    return chain_timer(step, mk, 6, 2, pairs=3, const_arg=params)


def _fail_json(msg: str) -> None:
    print(json.dumps({
        "metric": "bitnet-2B decode tokens/s/chip",
        "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
        "error": msg}), flush=True)


def _wait_for_relay() -> bool:
    """Ride out axon relay flaps (observed multi-hour outages
    2026-08-17): probe the TPU in a SUBPROCESS (the plugin latches the
    platform at import — a failed probe must not poison this process)
    and retry for up to BITNET_BENCH_RELAY_WAIT_S before giving up.
    Returns False when the relay stayed unreachable."""
    import subprocess

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True          # no relay configured — CPU/other backend
    max_wait = float(os.environ.get("BITNET_BENCH_RELAY_WAIT_S", "900"))
    deadline = time.time() + max_wait
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "print('RELAY_OK', (x @ x).sum())")
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True, timeout=150)
            if r.returncode == 0 and "RELAY_OK" in r.stdout:
                if attempt > 1:
                    print(f"# relay back after {attempt} probes",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"# relay probe {attempt} failed; retrying "
              f"({deadline - time.time():.0f}s left)", file=sys.stderr)
        time.sleep(min(60.0, max(1.0, deadline - time.time())))


def bench_sharded(cfg, params, kernel_path: str, dp: int, tp: int,
                  S: int = 1024, n_hi: int = 24, n_lo: int = 6) -> dict:
    """Sharded decode-step benchmark over a dp×tp mesh on whatever
    devices exist (virtual CPU today, chips tomorrow) — VERDICT r3 #9:
    the scaling row mirrors `xtask benchmark` determinism
    (/root/reference/xtask/src/main.rs:740-743).

    Weak scaling: the mesh runs B = dp sequences (one per data shard)
    against a single-device B=1 run of the same step; efficiency =
    (B / t_mesh) / (n_dev · (1 / t_single))."""
    import jax
    import jax.numpy as jnp

    from bitnet_tpu.engine.cache import allocate_cache
    from bitnet_tpu.models.bitnet import forward, logits as model_logits
    from bitnet_tpu.obs.timing import chain_timer
    from bitnet_tpu.parallel import make_mesh, shard_cache, shard_params

    n_dev = dp * tp
    mesh = make_mesh(dp=dp, tp=tp)
    B = dp

    def step_fn(prm, carry):
        tok, pos, kc, vc = carry
        h, kc, vc, _, _ = forward(
            cfg, prm, tok[:, None], jnp.minimum(pos, S - 1)[:, None],
            kc, vc, jnp.minimum(pos, S - 1), 1, kernel_path)
        lg = model_logits(cfg, prm, h, kernel_path)[:, 0, :]
        nxt = jnp.argmax(lg, -1).astype(jnp.int32)
        return nxt, pos + 1, kc, vc

    # single-device reference (B=1, unsharded, 5D cache to match the
    # sharded run's plan — einsum — so efficiency isolates SCALING)
    kc1 = jnp.zeros((cfg.num_layers, 1, S, cfg.num_kv_heads,
                     cfg.head_dim), jnp.bfloat16)

    def mk1(i):
        return (jnp.full((1,), (i * 7) % cfg.vocab_size, jnp.int32),
                jnp.zeros((1,), jnp.int32), kc1, jnp.zeros_like(kc1))

    t_single = chain_timer(step_fn, mk1, n_hi, n_lo, pairs=2,
                           const_arg=params)

    params_s = shard_params(mesh, cfg, params)
    cache = shard_cache(mesh, allocate_cache(cfg, B, S, "bf16"))

    def mkm(i):
        return (jnp.full((B,), (i * 7) % cfg.vocab_size, jnp.int32),
                jnp.zeros((B,), jnp.int32), cache.k, cache.v)

    t_mesh = chain_timer(step_fn, mkm, n_hi, n_lo, pairs=2,
                         const_arg=params_s)
    eff = (B / t_mesh) / (n_dev * (1.0 / t_single)) * 100.0
    # on a virtual (time-shared) mesh the honest yardstick is the
    # SERIALIZED time: n_dev devices' work on one host — ideal t_mesh =
    # n_dev * t_single there, not t_single.  Readings above 100% are
    # NOISE (the single-device baseline ran slow on the shared host,
    # e.g. 189.9% in BENCH_r04) — the reported value is capped at 100
    # and the raw reading kept alongside so it can't be misread as
    # super-linear scaling (VERDICT r4 weak #6).
    eff_serial = (n_dev * t_single) / t_mesh * 100.0
    return {
        "scaling_efficiency_vs_serialized_pct": round(
            min(eff_serial, 100.0), 1),
        "scaling_efficiency_vs_serialized_raw_pct": round(eff_serial, 1),
        "yardstick_note": (
            "virtual time-shared mesh: ideal t_mesh = n_dev*t_single; "
            "raw > 100% means a noisy serialized baseline, capped"),
        "metric": f"bitnet-{cfg.hidden_size}h sharded decode scaling "
                  f"(dp={dp} tp={tp}, weak scaling vs 1 device)",
        "value": round(B / t_mesh, 2),
        "unit": "tok/s",
        "mesh": f"dp{dp}xtp{tp}",
        "n_devices": n_dev,
        "decode_ms_per_step": round(t_mesh * 1e3, 3),
        "single_device_ms_per_step": round(t_single * 1e3, 3),
        "scaling_efficiency_pct": round(eff, 1),
        "vs_baseline": round(eff / 80.0, 2),   # BASELINE: ≥80% 1→8 chips
    }


def main() -> None:
    if not _wait_for_relay():
        _fail_json("TPU relay unreachable (probes failed for "
                   f"{os.environ.get('BITNET_BENCH_RELAY_WAIT_S', '900')}s)")
        sys.exit(3)
    # backend-init watchdog: PJRT client creation blocks FOREVER when the
    # axon relay is down (observed 2026-08-17: make_c_api_client hang) —
    # emit a machine-readable failure line instead of dying silently.
    # Disarmed as soon as the backend answers.
    import threading

    watchdog_s = float(os.environ.get("BITNET_BENCH_WATCHDOG_S", "900"))
    armed = threading.Event()
    armed.set()

    def _watchdog():
        time.sleep(watchdog_s)
        if armed.is_set():
            print(json.dumps({
                "metric": "bitnet-2B decode tokens/s/chip",
                "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
                "error": f"backend init timed out after {watchdog_s:.0f}s "
                         "(TPU relay unreachable)"}), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # persistent compile cache: repeat driver runs skip the slow remote
    # compiles (harmless if the backend ignores it)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bitnet_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    backend = jax.default_backend()
    armed.clear()   # backend answered — disarm the watchdog
    kernel_path = "w2a8" if backend == "tpu" else "xla"
    size = os.environ.get("BITNET_BENCH_MODEL", "2b").lower()
    qkind = os.environ.get("BITNET_BENCH_KIND", "qk256").lower()
    t0 = time.time()
    cfg, params = build_synthetic(size, fuse=True, kind=qkind)
    if kernel_path == "w2a8":
        # int8 tied-logits head (EngineConfig logits_dtype='int8'): halves
        # the dominant [V, H] HBM read of the LM head
        from bitnet_tpu.models.bitnet import quantize_head

        params = quantize_head(params)
    build_s = time.time() - t0
    print(f"# model built in {build_s:.1f}s; backend={backend} "
          f"kernel_path={kernel_path} fused_projections=True "
          f"logits_dtype={'int8' if kernel_path == 'w2a8' else 'bf16'}",
          file=sys.stderr)

    # --mesh DPxTP: sharded scaling row instead of the standard bench
    # (virtual CPU mesh today: set JAX_PLATFORMS=cpu XLA_FLAGS=
    # --xla_force_host_platform_device_count=N; real chips tomorrow)
    mesh_arg = None
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--mesh" and i < len(sys.argv) - 0:
            mesh_arg = sys.argv[i + 1] if i + 1 < len(sys.argv) else None
        elif a.startswith("--mesh="):
            mesh_arg = a.split("=", 1)[1]
    if mesh_arg:
        dp, tp = (int(x) for x in mesh_arg.lower().split("x"))
        import jax as _jax

        need = dp * tp
        have = len(_jax.devices())
        if have < need:
            _fail_json(f"--mesh {mesh_arg} needs {need} devices, "
                       f"have {have}")
            sys.exit(3)
        row = bench_sharded(cfg, params, kernel_path, dp, tp)
        row["backend"] = backend
        if backend != "tpu":
            row["note"] = "virtual CPU mesh — scaling indicative only"
        print(json.dumps(row))
        return

    # repeat the headline measurement and keep the MIN: the relay's
    # documented 15-50% drift only ever ADDS time, so the fastest sample
    # is the closest to the chip (VERDICT r3 weak #7 — single samples made
    # round-over-round deltas noise).  Spread is recorded in the JSON.
    n_rep = int(os.environ.get("BITNET_BENCH_REPEATS", "3"))
    b1_samples = [bench_decode(cfg, params, kernel_path, B=1)
                  for _ in range(n_rep)]
    dt_decode = min(b1_samples)
    b1_spread_pct = ((max(b1_samples) - dt_decode) / dt_decode * 100.0
                     if len(b1_samples) > 1 else 0.0)
    tok_s = 1.0 / dt_decode
    roofline_ms = _decode_bytes(cfg, kind=qkind) / (_HBM_GBPS * 1e9) * 1e3
    roofline_pct = roofline_ms / (dt_decode * 1e3) * 100.0
    print(f"# decode B=1: {dt_decode*1e3:.2f} ms/token → {tok_s:.1f} tok/s "
          f"({roofline_pct:.0f}% of ~{roofline_ms:.2f} ms HBM roofline)",
          file=sys.stderr)

    b8_tok_s = None
    try:
        dt_b8 = min(bench_decode(cfg, params, kernel_path, B=8)
                    for _ in range(max(1, n_rep - 1)))
        b8_tok_s = 8.0 / dt_b8
        print(f"# decode B=8: {dt_b8*1e3:.2f} ms/step → "
              f"{b8_tok_s:.0f} tok/s aggregate", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# batched decode bench failed: {e}", file=sys.stderr)

    prefill_tok_s = None
    prefill_mfu_pct = None
    try:
        dt_prefill = bench_prefill(cfg, params, kernel_path)
        prefill_tok_s = 512 / dt_prefill
        prefill_mfu_pct = _prefill_floor_s(cfg, 512) / dt_prefill * 100.0
        print(f"# prefill: {dt_prefill*1e3:.1f} ms/512 tokens → "
              f"{prefill_tok_s:.0f} tok/s "
              f"({prefill_mfu_pct:.0f}% of the mixed int8/bf16 MXU floor)",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# prefill bench failed: {e}", file=sys.stderr)

    # embedded multi-chip scaling row (VERDICT r4 #5b: a --mesh row in
    # every capture): re-invoke this script on a virtual 8-device CPU
    # mesh (mini shapes — the scaling harness, not a perf claim) and
    # attach its JSON.  BITNET_BENCH_MESH=0 skips.
    mesh_row = None
    if os.environ.get("BITNET_BENCH_MESH", "1") == "1":
        try:
            import subprocess

            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)   # sitecustomize latch
            env.update(JAX_PLATFORMS="cpu",
                       XLA_FLAGS="--xla_force_host_platform_device_count=8",
                       BITNET_BENCH_MODEL=os.environ.get(
                           "BITNET_BENCH_MESH_SIZE", "mini"),
                       BITNET_BENCH_MESH="0")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mesh",
                 "4x2"], capture_output=True, text=True, timeout=600,
                env=env)
            for line in reversed(r.stdout.strip().splitlines()):
                if line.startswith("{"):
                    mesh_row = json.loads(line)
                    break
            if mesh_row is None:
                mesh_row = {"error": (r.stdout + r.stderr)[-300:]}
        except Exception as e:  # pragma: no cover
            mesh_row = {"error": repr(e)[:300]}
        print(f"# mesh scaling row (virtual CPU, mini shapes): "
              f"{json.dumps(mesh_row)[:200]}", file=sys.stderr)

    print(json.dumps({
        "metric": f"bitnet-{size.upper()} decode tokens/s/chip "
                  f"({qkind.upper()} fused Pallas "
                  f"{'W2A8' if qkind == 'qk256' else 'stacked-TL'}, "
                  "fused projections, synthetic weights, B=1, S=1024)",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / REFERENCE_BASELINE_TOK_S, 2),
        "decode_ms_per_token_b1": round(dt_decode * 1e3, 3),
        "b1_samples_ms": [round(s * 1e3, 3) for s in b1_samples],
        "b1_spread_pct": round(b1_spread_pct, 1),
        "roofline_pct": round(roofline_pct, 1),
        "decode_tok_s_b8": None if b8_tok_s is None else round(b8_tok_s, 1),
        "prefill_tok_s": (None if prefill_tok_s is None
                          else round(prefill_tok_s, 1)),
        "prefill_mfu_pct": (None if prefill_mfu_pct is None
                            else round(prefill_mfu_pct, 1)),
        "mesh_scaling": mesh_row,
        "kernel_path": kernel_path,
    }))


if __name__ == "__main__":
    main()
