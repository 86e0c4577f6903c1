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
    """Version-tolerant shard_map wrapper.

    Varying-axes checking is disabled (check_vma / check_rep): the render
    body contains pallas_call, whose out_shapes carry no varying-axes
    metadata, so the check rejects it outright on jax >= 0.7 — and the
    body has no collectives for the check to validate anyway (forward
    rendering is embarrassingly parallel; the gradient psum is inserted
    by shard_map's own transpose)."""
    try:
        from jax import shard_map as _sm  # jax >= 0.6 public API
        kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        kw = {"check_rep": False}
    try:
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   **kw)
    except TypeError:  # older/newer kwarg name mismatch
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
