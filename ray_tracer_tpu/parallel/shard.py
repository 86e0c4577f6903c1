"""Data-parallel rendering: pixel tiles sharded over the device mesh.

The renderer analog of DP (SURVEY §2.3 / §7.1.6): the frame's flat pixel
array is split evenly across devices with ``shard_map``; the scene and
camera basis are replicated per chip (they're small — even the teapot is
~1.5 MB of triangles); forward rendering is embarrassingly parallel with
ZERO collectives. Inverse rendering all-reduces parameter gradients over
ICI — that psum is inserted automatically by shard_map's transpose because
the scene enters replicated (see grad/inverse.py).

``render_pixels`` already takes pixel ids as an argument, so the per-device
body is literally the single-chip code — this is the whole point of the
flat-pixel design in renderer.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import CameraBasis
from ..renderer import render_pixels
from ..scene import Scene
from ..utils.config import RenderParams
from .mesh import AXIS, make_mesh, shard_map_fn


def _padded_ids(n: int, n_dev: int):
    """Flat pixel ids padded to a multiple of n_dev (surplus lanes repeat
    the last pixel; they're dropped after the gather)."""
    per = -(-n // n_dev)
    total = per * n_dev
    ids = jnp.arange(total, dtype=jnp.uint32)
    return jnp.minimum(ids, jnp.uint32(n - 1)), total


@functools.partial(jax.jit, static_argnames=("params", "mesh"))
def _render_sharded(scene: Scene, basis: CameraBasis, params: RenderParams,
                    frame_index, mesh: Mesh):
    W, H = params.width, params.height
    n = W * H
    ids, total = _padded_ids(n, mesh.devices.size)

    def body(scene, basis, frame_index, ids):
        return render_pixels(scene, basis, params, frame_index, ids)

    # shard the flat pixel axis over EVERY mesh axis: works for the 1-D
    # ('devices',) mesh and the multi-host ('host', 'chip') mesh alike
    pix_spec = P(tuple(mesh.axis_names))
    fn = shard_map_fn(
        body, mesh,
        in_specs=(P(), P(), P(), pix_spec),
        out_specs=pix_spec,
    )
    ids = jax.device_put(ids, NamedSharding(mesh, pix_spec))
    img = fn(scene, basis, frame_index, ids)
    return img[:n].reshape(H, W, 3)


def render_frame_distributed(scene: Scene, basis: CameraBasis,
                             params: RenderParams, frame_index,
                             mesh: Optional[Mesh] = None):
    """One frame rendered across all devices → (H, W, 3) on host logical
    layout (sharded along rows until materialized)."""
    mesh = mesh if mesh is not None else make_mesh()
    return _render_sharded(scene, basis, params, jnp.int32(frame_index), mesh)
