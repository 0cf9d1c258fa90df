"""Multi-host initialization and mesh construction.

The reference has no distributed communication layer whatsoever — no
NCCL/MPI/Gloo, no torch.distributed (survey §5.8).  The TPU-native
equivalent is PJRT + XLA collectives: ``jax.distributed.initialize()``
wires the hosts together, a global mesh lays ``space`` along ICI-adjacent
devices so halo ppermutes stay on-chip-interconnect while ``data`` may
span DCN (it only communicates for scalar metric psums).

This module is exercised in CI via the virtual-device path (a CPU mesh
with ``--xla_force_host_platform_device_count``, see tests/conftest.py);
on a real pod slice call :func:`initialize_multihost` once per process
before any JAX computation.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from custereomatching_tpu.config import MeshConfig


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime (idempotent).

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env vars).  Safe to call on a single host —
    failures to auto-detect are swallowed so single-process runs work.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except Exception:
        if num_processes not in (None, 1):
            raise


def make_global_mesh(config: MeshConfig) -> Mesh:
    """A ``(data, space)`` mesh over ALL processes' devices.

    Lays ``space`` over the fastest-varying (ICI-contiguous) device
    dimension via ``mesh_utils.create_device_mesh``, so the per-step halo
    ppermute rides ICI; ``data`` spans the remainder (hosts/DCN).
    """
    from jax.experimental import mesh_utils

    n = config.num_devices
    if n != len(jax.devices()):
        raise ValueError(
            f"mesh {config.shape} needs exactly all {len(jax.devices())} "
            f"global devices, got {n}")
    devices = mesh_utils.create_device_mesh(config.shape)
    return Mesh(devices, config.axis_names)


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded leading batch axis this process
    should feed (for ``jax.make_array_from_process_local_data``-style
    input pipelines)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
