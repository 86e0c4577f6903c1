"""Device mesh helpers.

The reference is strictly single-device (SURVEY §2.3); scaling is a
first-class new component here: a 1-D ``jax.sharding.Mesh`` over all chips
(ICI within a slice; add a host axis over DCN later), pixel tiles sharded,
scene replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "devices"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_map_fn(fn, mesh: Mesh, in_specs, out_specs):
    """Version-tolerant shard_map wrapper."""
    try:
        from jax import shard_map as _sm  # jax >= 0.6 public API
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
