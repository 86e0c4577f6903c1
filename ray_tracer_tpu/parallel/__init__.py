"""Multi-device scaling: mesh helpers + sharded rendering."""

from .mesh import AXIS, make_mesh, shard_map_fn
from .shard import render_frame_distributed

__all__ = ["AXIS", "make_mesh", "shard_map_fn", "render_frame_distributed"]
