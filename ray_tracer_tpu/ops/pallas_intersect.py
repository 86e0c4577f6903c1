"""Pallas TPU closest-hit kernel (brute force).

TPU-native replacement for the WGSL intersection scan
(shaders/ray_tracer.wgsl:149-185). The reference gives each pixel-thread a
serial loop over all primitives; on TPU the same brute force becomes a
2-D tile sweep on the VPU:

  * grid over ray tiles: RT=128 rays live on the 128-lane axis,
  * the whole scene (SoA planes) is VMEM-resident — even the teapot's
    15,704 triangles are only ~0.75 MB packed, far under the ~16 MB VMEM —
    so per-pair values NEVER touch HBM (the reason the jnp oracle can't
    scale: it materializes O(rays × prims) in HBM),
  * triangles stream through the sublane axis in chunks of TT rows; each
    chunk computes Möller–Trumbore on an (TT, RT) tile and folds into a
    running (best_t, best_id) min — two lane-preserving sublane reductions,
  * spheres ride the same loop with the quadratic test.

Layouts: per-pair tiles are (prims=sublanes, rays=lanes), so triangle
scalars broadcast as (TT, 1) column slices of a (TP, 16) plane array and
ray scalars broadcast as (1, RT) row slices — no transposes anywhere.

prim-id convention matches ops/intersect.py: spheres [0, SP), triangles
[SP, SP+TP); t=+inf encodes a miss. The kernel returns only (t, id): hit
attributes are recomputed differentiably outside (hit_attributes), which is
what keeps the renderer differentiable with a detached discrete winner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene

RT = 128          # rays per grid step (lane axis)
TT = 256          # primitive rows per chunk (sublane axis)
BIG_ID = 2 ** 30  # plain int: jnp scalars would be captured as consts
TRI_DET_EPS = 1e-6  # matches wgsl:140


def _pack_tris(scene: Scene):
    """(TP, 16) plane array: [a(3) | e1(3) | e2(3) | n(3) | pad(4)].

    n = e1 × e2 is the unnormalized geometric normal; everything is
    ray-independent so XLA hoists this out of the per-frame loop.
    """
    a = scene.tri_v0
    e1 = scene.tri_v1 - scene.tri_v0
    e2 = scene.tri_v2 - scene.tri_v0
    n = jnp.cross(e1, e2)
    pad = jnp.zeros((a.shape[0], 4), jnp.float32)
    return jnp.concatenate([a, e1, e2, n, pad], axis=1)


def _pack_spheres(scene: Scene):
    """(SP, 8) plane array: [c(3) | r^2 | valid | pad(3)]."""
    pad = jnp.zeros((scene.sphere_center.shape[0], 3), jnp.float32)
    return jnp.concatenate([
        scene.sphere_center,
        (scene.sphere_radius ** 2)[:, None],
        scene.sphere_valid[:, None],
        pad,
    ], axis=1)


def _min_fold(t_pairs, valid, ids, best_t, best_id):
    """Fold an (TT, RT) candidate tile into the running (1, RT) best."""
    t_m = jnp.where(valid, t_pairs, jnp.inf)
    cmin = jnp.min(t_m, axis=0, keepdims=True)                  # (1, RT)
    cid = jnp.min(jnp.where(t_m == cmin, ids, BIG_ID), axis=0,
                  keepdims=True)
    better = cmin < best_t
    return (jnp.where(better, cmin, best_t),
            jnp.where(better, cid, best_id))


def _make_kernel(SP: int, TP: int, t_min: float, tt_s: int, tt_t: int):
    # SP/TP are multiples of 128 (scene padding) and tt_* divides them.
    n_sph_chunks = SP // tt_s
    n_tri_chunks = TP // tt_t

    def kernel(ray_ref, sph_ref, tri_ref, t_out, id_out):
        # ray_ref: (8, RT) rows [ox oy oz dx dy dz · ·]
        ox, oy, oz = ray_ref[0:1, :], ray_ref[1:2, :], ray_ref[2:3, :]
        dx, dy, dz = ray_ref[3:4, :], ray_ref[4:5, :], ray_ref[5:6, :]
        a_quad = dx * dx + dy * dy + dz * dz          # (1, RT), |d|^2

        best_t = jnp.full((1, RT), jnp.inf, jnp.float32)
        best_id = jnp.full((1, RT), BIG_ID, jnp.int32)

        def sphere_chunk(k, carry):
            best_t, best_id = carry
            s = k * tt_s
            tt = tt_s
            cx = sph_ref[pl.ds(s, tt), 0:1]           # (tt, 1)
            cy = sph_ref[pl.ds(s, tt), 1:2]
            cz = sph_ref[pl.ds(s, tt), 2:3]
            r2 = sph_ref[pl.ds(s, tt), 3:4]
            vld = sph_ref[pl.ds(s, tt), 4:5]
            # quadratic: near root only (wgsl:106-123)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz  # (tt, RT)
            b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            disc = b * b - 4.0 * a_quad * c
            t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a_quad)
            valid = (disc >= 0.0) & (t >= t_min) & (vld > 0.5)
            ids = (jax.lax.broadcasted_iota(jnp.int32, (tt, RT), 0)
                   + jnp.int32(s))
            return _min_fold(t, valid, ids, best_t, best_id)

        def tri_chunk(k, carry):
            best_t, best_id = carry
            s = k * tt_t
            tt = tt_t
            ax = tri_ref[pl.ds(s, tt), 0:1]
            ay = tri_ref[pl.ds(s, tt), 1:2]
            az = tri_ref[pl.ds(s, tt), 2:3]
            e1x = tri_ref[pl.ds(s, tt), 3:4]
            e1y = tri_ref[pl.ds(s, tt), 4:5]
            e1z = tri_ref[pl.ds(s, tt), 5:6]
            e2x = tri_ref[pl.ds(s, tt), 6:7]
            e2y = tri_ref[pl.ds(s, tt), 7:8]
            e2z = tri_ref[pl.ds(s, tt), 8:9]
            nx = tri_ref[pl.ds(s, tt), 9:10]
            ny = tri_ref[pl.ds(s, tt), 10:11]
            nz = tri_ref[pl.ds(s, tt), 11:12]
            # Möller–Trumbore, cross/determinant form (wgsl:125-147)
            aox, aoy, aoz = ox - ax, oy - ay, oz - az          # (tt, RT)
            det = -(dx * nx + dy * ny + dz * nz)
            t_num = aox * nx + aoy * ny + aoz * nz
            # dao = ao × d
            daox = aoy * dz - aoz * dy
            daoy = aoz * dx - aox * dz
            daoz = aox * dy - aoy * dx
            u_num = e2x * daox + e2y * daoy + e2z * daoz
            v_num = -(e1x * daox + e1y * daoy + e1z * daoz)
            inv = 1.0 / det
            t = t_num * inv
            u = u_num * inv
            v = v_num * inv
            valid = ((det >= TRI_DET_EPS) & (t >= t_min)
                     & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
            ids = (jax.lax.broadcasted_iota(jnp.int32, (tt, RT), 0)
                   + jnp.int32(SP + s))
            return _min_fold(t, valid, ids, best_t, best_id)

        best_t, best_id = jax.lax.fori_loop(
            0, n_sph_chunks, sphere_chunk, (best_t, best_id))
        best_t, best_id = jax.lax.fori_loop(
            0, n_tri_chunks, tri_chunk, (best_t, best_id))

        # output blocks are (8, RT) — sublane dim must be ≥8 on TPU — so
        # broadcast the (1, RT) result across the 8 rows; caller reads row 0.
        t_out[:, :] = jnp.broadcast_to(best_t, (8, RT))
        id_out[:, :] = jnp.broadcast_to(
            jnp.where(best_id == BIG_ID, jnp.int32(0), best_id), (8, RT))

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def nearest_hit_pallas(scene: Scene, o, d, t_min=1e-4, interpret=False):
    """Closest hit for (R, 3) rays → (t (R,), prim_id (R,) int32).

    Drop-in replacement for ops.intersect.nearest_hit_jnp (same id
    convention); R is padded to a multiple of RT internally.
    """
    R = o.shape[0]
    SP, TP = scene.padded_spheres, scene.padded_tris
    tt_s, tt_t = min(TT, SP), min(TT, TP)

    n_tiles = -(-R // RT)
    Rp = n_tiles * RT
    rays = jnp.concatenate([o, d], axis=1).T                     # (6, R)
    rays = jnp.pad(rays, ((0, 2), (0, Rp - R)))                  # (8, Rp)

    sph = _pack_spheres(scene)                                   # (SP, 8)
    tri = _pack_tris(scene)                                      # (TP, 16)

    kernel = _make_kernel(SP, TP, float(t_min), tt_s, tt_t)
    t_out, id_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SP, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=Rp * (SP * 25 + TP * 45),
            bytes_accessed=Rp * 8 * 4 + SP * 32 + TP * 64 + Rp * 8,
            transcendentals=0,
        ),
    )(rays, sph, tri)

    return t_out[0, :R], id_out[0, :R]
