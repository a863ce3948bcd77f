"""Multi-host (DCN) execution entry.

The reference only scaffolds ranks (``bitnet-gpu-hal/src/
distributed_inference.rs:30-292`` — enums + in-process simulation).  Here
the real thing: ``jax.distributed.initialize`` brings every host's chips
into one global device pool, the mesh places **tensor-parallel groups
inside a host (ICI)** and the **data axis across hosts (DCN)**, and XLA's
GSPMD inserts the cross-host collectives.  No hand-written transport.

Launch contract (one process per host):

    BITNET_COORDINATOR=host0:8476 BITNET_NUM_PROCESSES=2 \
    BITNET_PROCESS_ID=$RANK python -m bitnet_tpu.server --model m.gguf \
        --shard 2,4

or programmatically::

    from bitnet_tpu.parallel.multihost import init_distributed, host_mesh
    init_distributed()                       # env-driven
    mesh = host_mesh(tp=4)                   # dp = hosts × local/4

Serving story (SURVEY hard-part #4): ONE frontend process (process 0)
owns the HTTP server and the continuous-batching scheduler; every host
participates in the jitted decode step through GSPMD — scheduler state
(slot tables, stop criteria) lives only on the frontend, while model and
KV shards live on all hosts.  Requests never need replicated scheduler
state because the decode program is a single SPMD computation launched
from process 0 (multi-controller strictness: all processes must call the
same jitted computations — process 0 drives, workers loop in
``worker_loop``).

CPU validation without hardware: ``jax_cpu_collectives_implementation =
"gloo"`` gives REAL cross-process collectives over 2×N virtual CPU
devices (tests/test_multihost.py + the driver dryrun) — unlike the
reference, whose multi-node story is type-level only.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS

COORD_ENV = "BITNET_COORDINATOR"
NPROC_ENV = "BITNET_NUM_PROCESSES"
PID_ENV = "BITNET_PROCESS_ID"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the multi-host cluster (no-op when single-process).

    Arguments default to ``BITNET_COORDINATOR`` / ``BITNET_NUM_PROCESSES``
    / ``BITNET_PROCESS_ID``.  Returns True when distributed mode is on.
    On CPU backends, enables gloo collectives first (must precede backend
    initialization).
    """
    coordinator_address = coordinator_address or os.environ.get(COORD_ENV)
    if coordinator_address is None:
        return False
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get(NPROC_ENV, "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get(PID_ENV, "0"))
    if jax.distributed.is_initialized():
        # idempotence: callers may init before serve() does (e.g. to warm
        # the backend on the main thread).  NOTE even a same-value
        # jax.config.update here would invalidate the backend cache and
        # re-register the cpu client with the coordination service
        # (ALREADY_EXISTS: cpu:global_topology) — touch nothing.
        return True
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jax / already initialized — TPU path doesn't need it
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_mesh(tp: int | None = None, dp: int | None = None) -> Mesh:
    """(data, model) mesh over ALL global devices with TP inside hosts.

    Device order: each process's local devices are contiguous; ``tp``
    groups are carved within a process so tensor-parallel collectives ride
    ICI, and the data axis spans processes so only batch-parallel traffic
    crosses DCN (the scaling-book layout for serving).
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    local = jax.local_device_count()
    if tp is None:
        tp = local if dp is None else n // dp
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} global devices")
    if tp > local or local % tp != 0:
        raise ValueError(
            f"tp={tp} must divide local device count {local} so TP stays "
            f"on ICI (got {n} devices on {n // local} hosts)")
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def is_primary() -> bool:
    """True on the frontend process (owns the server / scheduler)."""
    return jax.process_index() == 0


# ---------------------------------------------------------------------------
# CPU dryrun: 2 processes × N virtual devices, real gloo collectives
# ---------------------------------------------------------------------------
_WORKER = textwrap.dedent("""
    import os, sys
    pid, nproc, port, local = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], int(sys.argv[4]))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, sys.argv[5])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bitnet_tpu.parallel.multihost import init_distributed, host_mesh
    init_distributed(f"localhost:{port}", nproc, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from bitnet_tpu.engine.cache import allocate_cache
    from bitnet_tpu.models.bitnet import forward_cache, logits as mlg
    from bitnet_tpu.parallel import shard_params, shard_cache, token_pspec
    from __graft_entry__ import _mini_model

    cfg, params, _ = _mini_model()
    mesh = host_mesh(tp=2)
    dp = mesh.devices.shape[0]
    B, T, S = 2 * dp, 8, 32
    params = shard_params(mesh, cfg, params)
    cache = shard_cache(mesh, allocate_cache(cfg, B, S, "f32"))
    tokens = jax.device_put(
        np.tile(np.arange(T, dtype=np.int32)[None] % cfg.vocab_size, (B, 1)),
        NamedSharding(mesh, token_pspec()))
    positions = jax.device_put(
        np.tile(np.arange(T, dtype=np.int32)[None], (B, 1)),
        NamedSharding(mesh, token_pspec()))

    from jax.sharding import PartitionSpec as P

    @jax.jit
    def step(params, tokens, positions, cache):
        h, cache = forward_cache(cfg, params, tokens, positions, cache, T,
                                 kernel_path="xla")
        nxt = jnp.argmax(mlg(cfg, params, h)[:, -1, :], -1)
        # replicate so every process can read the result locally (a
        # data-sharded output has non-addressable shards cross-host)
        return jax.lax.with_sharding_constraint(
            nxt, NamedSharding(mesh, P()))

    with mesh:
        nxt = step(params, tokens, positions, cache)
        np.asarray(nxt)
        import time
        t0 = time.perf_counter()
        for _ in range(4):
            nxt2 = step(params, tokens, positions, cache)
        np.asarray(nxt2)
        rate = 4 / (time.perf_counter() - t0)
    if pid == 0:
        print("MULTIHOST_TOKENS", ",".join(map(str, np.asarray(nxt))),
              flush=True)
        print(f"MULTIHOST_RATE {rate:.2f}", flush=True)
    jax.distributed.shutdown()
""")


def dryrun_multihost(num_processes: int = 2, local_devices: int = 4,
                     port: int = 18477, repo_root: str | None = None
                     ) -> list[int]:
    """Spawn a real multi-process CPU cluster and run one sharded prefill.

    Returns the next-token ids from process 0.  Raises on failure —
    callers decide whether to treat it as fatal.
    """
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(num_processes),
             str(port), str(local_devices), repo_root],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env={**os.environ, "JAX_PLATFORMS": "cpu"}))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            raise RuntimeError("multihost dryrun timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(f"multihost worker failed (rc={rc}): "
                               f"{err[-800:]}")
    toks = rate = None
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_TOKENS"):
                toks = [int(t) for t in line.split()[1].split(",")]
            elif line.startswith("MULTIHOST_RATE"):
                rate = float(line.split()[1])
    if toks is None:
        raise RuntimeError("no MULTIHOST_TOKENS line from process 0")
    if rate is not None:
        print(f"# multihost sharded step rate: {rate:.2f} steps/s "
              f"({num_processes} processes, virtual CPU — scaling "
              f"indicative only; real DCN efficiency needs ≥2 TPU hosts)")
    return toks
