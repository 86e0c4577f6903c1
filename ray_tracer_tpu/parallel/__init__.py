"""Multi-device scaling: mesh helpers + sharded rendering + multi-host scaffolding."""

from .mesh import AXIS, make_mesh, shard_map_fn
from .shard import render_frame_distributed
from . import distributed

__all__ = ["AXIS", "make_mesh", "shard_map_fn", "render_frame_distributed", "distributed"]
