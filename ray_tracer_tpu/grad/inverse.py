"""Inverse rendering: differentiable loss + multi-device training step.

A brand-new capability on top of the reference pipeline (BASELINE.json north
star): because the renderer is pure JAX and the closest-hit search detaches
only the discrete winner index (ops/intersect.py), ``jax.grad`` flows from
pixel loss to sphere centers/radii, triangle vertices, albedos, emission and
smoothness for free. Visibility (edge) gradients are a separate estimator —
see docs/ROADMAP notes; the hit-index detachment matches the standard
reparameterization-free baseline.

Distributed: gradients of the replicated scene are all-reduced over ICI
automatically — the scene enters ``shard_map`` with spec P() (replicated),
so the transpose of the sharded render inserts the psum. This is the
renderer analog of DP gradient all-reduce (SURVEY §5 'Distributed
communication backend').
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..camera import CameraBasis
from ..renderer import render_frame
from ..parallel.shard import _render_sharded
from ..scene import Scene
from ..utils.config import RenderParams

# Continuous scene leaves that make sense to optimize.
DEFAULT_TRAINABLE = ("sphere_albedo", "sphere_center", "sphere_radius",
                     "tri_albedo", "tri_v0", "tri_v1", "tri_v2")


def split_scene(scene: Scene, fields: Sequence[str] = DEFAULT_TRAINABLE
                ) -> Tuple[Dict[str, jax.Array], Scene]:
    """Partition the scene into (trainable dict, frozen scene)."""
    trainable = {f: getattr(scene, f) for f in fields}
    return trainable, scene


def merge_scene(scene: Scene, trainable: Dict[str, jax.Array]) -> Scene:
    return dataclasses.replace(scene, **trainable)


def image_mse(trainable, scene: Scene, basis: CameraBasis,
              params: RenderParams, frame_index, target, mesh=None):
    """Mean-squared pixel loss of a 1-frame render against ``target``."""
    full = merge_scene(scene, trainable)
    if mesh is None:
        img = render_frame(full, basis, params, frame_index)
    else:
        img = _render_sharded(full, basis, params, frame_index, mesh)
    return jnp.mean((img - target) ** 2)


def make_train_step(params: RenderParams, optimizer=None, mesh=None,
                    edge_samples: int = 0):
    """Build a jitted SGD/Adam step over trainable scene leaves.

    ``edge_samples > 0`` adds the edge-sampled visibility (boundary)
    gradients (grad/edges.py) for geometry fields — without them, autodiff
    sees only shading changes, not silhouette motion.

    Returns (init_fn, step_fn):
      init_fn(scene, fields) -> (trainable, opt_state)
      step_fn(trainable, opt_state, scene, basis, target, frame_index)
          -> (trainable, opt_state, loss)
    """
    optimizer = optimizer or optax.adam(1e-2)

    def init_fn(scene: Scene, fields: Sequence[str] = DEFAULT_TRAINABLE):
        trainable, _ = split_scene(scene, fields)
        return trainable, optimizer.init(trainable)

    @functools.partial(jax.jit, static_argnames=())
    def step_fn(trainable, opt_state, scene, basis, target, frame_index):
        loss, grads = jax.value_and_grad(image_mse)(
            trainable, scene, basis, params, frame_index, target, mesh=mesh)
        if edge_samples:
            from .edges import boundary_gradients
            from ..renderer import render_frame
            full = merge_scene(scene, trainable)
            img = render_frame(full, basis, params, frame_index)
            cot = 2.0 * (img - target) / img.size        # d(mse)/d(img)
            key = jax.random.fold_in(jax.random.PRNGKey(1234), frame_index)
            bg = boundary_gradients(full, basis, params, cot, key,
                                    n_tri_samples=edge_samples,
                                    n_sph_samples=edge_samples)
            grads = {k: v + bg[k] if k in bg else v
                     for k, v in grads.items()}
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return init_fn, step_fn
