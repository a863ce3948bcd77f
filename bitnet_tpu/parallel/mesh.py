"""Device mesh construction.

The TPU-native replacement for the reference's simulated multi-device
orchestration (``bitnet-gpu-hal/src/distributed_inference.rs``,
``parallel_communication.rs``): one ``jax.sharding.Mesh`` over pod-slice
axes, with XLA owning the ICI/DCN transport — the entire hand-written
comm layer collapses into PartitionSpecs (SURVEY.md §5).

Axis conventions:
- ``data``  — batch/data parallelism (continuous-batching shards ride here)
- ``model`` — tensor parallelism (attention heads / FFN columns)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: int | None = None,
    tp: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh.

    Defaults: tp = all devices, dp = 1.  ``dp * tp`` must equal the device
    count used.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = 1, n
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp < n:
        devices = devices[: dp * tp]   # use a prefix of the device pool
        n = len(devices)
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
