"""Device capability probing.

Rebuild of ``bitnet-device-probe`` (``src/lib.rs:65-510``: CPU SIMD level,
GPU runtime availability, aggregate ``DeviceProbe``) for the single-target
world: what matters on TPU is platform kind, chip generation, chip count,
HBM size, and whether we are on real hardware or a CPU-host simulation —
this gates kernel-path selection ('pallas' vs 'xla'), test skips, and the
honest-compute receipt's environment block.
"""

from __future__ import annotations

import dataclasses
import os
import platform as _platform


@dataclasses.dataclass(frozen=True)
class DeviceProbe:
    """Aggregate probe result (reference DeviceProbe, lib.rs:483)."""

    platform: str                 # 'tpu' | 'cpu' | 'gpu'
    device_kind: str              # e.g. 'TPU v5e', 'cpu'
    num_devices: int
    num_local_devices: int
    process_index: int
    num_processes: int
    hbm_bytes: int | None         # per-device, when exposed
    supports_pallas: bool         # fused ternary kernel path available
    host_arch: str
    host_os: str

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)

    @property
    def is_tpu(self) -> bool:
        return self.platform == "tpu"

    @property
    def recommended_kernel_path(self) -> str:
        return "pallas" if self.supports_pallas else "xla"


def probe_device() -> DeviceProbe:
    """Probe the JAX runtime (reference probe_device, lib.rs:510)."""
    import jax

    devs = jax.devices()
    local = jax.local_devices()
    # memory_stats is only legal on ADDRESSABLE devices — under multi-host
    # (jax.distributed), devices[0] may belong to another process
    d0 = local[0] if local else devs[0]
    platform = d0.platform
    hbm = None
    try:
        stats = getattr(d0, "memory_stats", lambda: None)()
    except Exception:
        stats = None
    if stats:
        hbm = stats.get("bytes_limit")
    return DeviceProbe(
        platform=platform,
        device_kind=getattr(d0, "device_kind", platform),
        num_devices=len(devs),
        num_local_devices=len(local),
        process_index=jax.process_index(),
        num_processes=jax.process_count(),
        hbm_bytes=hbm,
        supports_pallas=platform == "tpu",
        host_arch=_platform.machine(),
        host_os=_platform.system().lower(),
    )


def assert_real_hardware(probe: DeviceProbe | None = None) -> None:
    """Strict-mode gate: refuse to run 'real compute' on a simulated
    backend (strict_mode.rs:87-158 bans mock paths)."""
    from .errors import ConfigError

    p = probe or probe_device()
    if not p.is_tpu:
        raise ConfigError(
            f"strict mode requires TPU hardware, found platform "
            f"{p.platform!r} ({p.device_kind})")
