"""Device mesh construction and sharding helpers.

This is the TPU-native replacement for the reference's process topology
(reference: NODE_{0,1,2}_IP static addressing, config/__init__.py:81-97):
instead of three HTTP-separated processes, every on-device stage attaches to
one `jax.sharding.Mesh` with `dp` (data / database-shard) and `tp` (tensor)
axes, and cross-stage data stays in HBM.

Tests fake an 8-device mesh on CPU via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md section 4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def force_host_devices(n: int) -> None:
    """Fake `n` CPU devices in-process. Must run before first jax use."""
    flags = os.environ.get("XLA_FLAGS", "")
    flag = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = f"{flags} {flag}".strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


@dataclass(frozen=True)
class MeshContext:
    """The shared device-mesh handle every on-device component uses."""

    mesh: Mesh

    @property
    def dp(self) -> int:
        return self.mesh.shape[DP_AXIS]

    @property
    def tp(self) -> int:
        return self.mesh.shape[TP_AXIS]

    @property
    def n_devices(self) -> int:
        return self.dp * self.tp

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def rows_dp(self) -> NamedSharding:
        """Shard dim 0 over dp — database rows, batch entries."""
        return NamedSharding(self.mesh, P(DP_AXIS))

    @property
    def cols_tp(self) -> NamedSharding:
        """Shard last dim over tp — weight matrices' output features."""
        return NamedSharding(self.mesh, P(None, TP_AXIS))

    def put(self, x, sharding: Optional[NamedSharding] = None):
        return jax.device_put(x, sharding or self.replicated)


def make_mesh(
    dp: int = 0,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    """Build a dp x tp mesh. dp=0 infers dp from available devices / tp.

    Multi-host: jax.devices() is global after jax.distributed.initialize
    (core/distributed.py) and is process-major, so reshaping to (dp, tp)
    keeps each tp group inside one host's ICI domain while dp crosses hosts
    over DCN — the intended axis split (SURVEY.md section 2.6)."""
    devs = list(devices if devices is not None else jax.devices())
    if tp <= 0:
        tp = 1
    if dp <= 0:
        dp = max(1, len(devs) // tp)
    need = dp * tp
    if need > len(devs):
        raise ValueError(
            f"mesh dp={dp} x tp={tp} needs {need} devices, have {len(devs)}"
        )
    if jax.process_count() > 1:
        from .distributed import validate_mesh_for_hosts

        validate_mesh_for_hosts(dp, tp)
    grid = np.array(devs[:need]).reshape(dp, tp)
    return MeshContext(mesh=Mesh(grid, (DP_AXIS, TP_AXIS)))


def mesh_from_settings(settings) -> MeshContext:
    from .distributed import init_distributed

    init_distributed(settings)
    devices = None
    if settings.device_platform:
        devices = jax.devices(settings.device_platform)
    return make_mesh(dp=settings.mesh_dp, tp=settings.mesh_tp, devices=devices)
