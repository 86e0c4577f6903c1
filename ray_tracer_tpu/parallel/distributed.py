"""Multi-host (pod-slice) scaffolding.

The reference is single-process/single-GPU (SURVEY §2.3); scaling across a
TPU pod slice is a first-class new component. Design (SURVEY §7.1.6 and the
scaling-book recipe): initialize the JAX distributed runtime, build a 2-D
``(host, chip)`` mesh so layouts can distinguish ICI (fast, intra-host) from
DCN (slow, inter-host), shard pixel tiles over BOTH axes (forward rendering
is embarrassingly parallel — zero collectives), replicate the scene per
chip, and let shard_map's transpose insert the parameter-gradient psum for
inverse rendering (hierarchical: ICI reduction before DCN).

Single-host multi-chip works without initialize(); multi-host requires one
initialize() call per process before any jax computation, e.g.:

    from ray_tracer_tpu.parallel import distributed
    distributed.initialize()          # TPU pods: args auto-detected
    mesh = distributed.make_host_chip_mesh()
    img = render_frame_distributed(scene, basis, params, 0, mesh)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

HOST_AXIS = "host"
CHIP_AXIS = "chip"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (idempotent). On TPU pods all arguments
    are auto-detected from the environment; on CPU/GPU fleets pass them
    explicitly."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def make_host_chip_mesh(devices=None) -> Mesh:
    """(host, chip) mesh: axis 0 spans processes (DCN), axis 1 the chips
    within each process (ICI). With one process this is (1, n_chips)."""
    devices = list(jax.devices() if devices is None else devices)
    n_proc = max(jax.process_count(), 1)
    per_host = len(devices) // n_proc
    # jax.devices() orders by process; reshape preserves host grouping
    grid = np.array(devices).reshape(n_proc, per_host)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def pixel_sharding_spec():
    """PartitionSpec for the flat pixel axis: split over host AND chip —
    (host·chip)-way data parallelism with scene replicated."""
    from jax.sharding import PartitionSpec as P
    return P((HOST_AXIS, CHIP_AXIS))
