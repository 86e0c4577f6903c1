"""Pallas TPU closest-hit kernel with cluster culling.

TPU-native replacement for the WGSL intersection scan
(shaders/ray_tracer.wgsl:149-185), evolved from brute force into a
two-level scheme — the TPU answer to a BVH, built around what the hardware
rewards (dense 8×128 SIMD tiles, compiler-visible control flow) instead of
per-thread stack traversal (which would need per-lane gathers TPUs don't
have):

  * grid over ray tiles: RT=128 rays on the 128-lane axis; the whole scene
    (SoA planes) is VMEM-resident (teapot ≈ 1 MB packed << 16 MB VMEM), so
    per-pair values never touch HBM,
  * triangles are Morton-sorted at scene build (scene.SceneBuilder.build)
    and grouped into fixed chunks of CLUSTER rows; each chunk's AABB is
    slab-tested against the whole ray tile first, and `@pl.when` skips the
    chunk's Möller–Trumbore tile (CLUSTER×RT VPU ops) when NO live ray
    enters the box closer than its current best — tile-granular divergence
    as a real scalar branch (the running best lives in VMEM scratch refs
    precisely so the culled block is side-effect-only: lax.cond over
    carried vectors lowers to select and would execute both branches),
  * a per-ray `alive` mask rides row 6 of the ray block: fully-dead tiles
    (wavefront tail after compaction sorting) skip the entire body,
  * spheres ride an unconditional chunk loop (scenes have few).

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
CLUSTER = 128     # triangles per cullable chunk (sublane axis); scene
                  # padding guarantees TP % 128 == 0
SPH_TT = 256      # spheres per chunk
BIG_ID = 2 ** 30  # plain int: jnp scalars would be captured as consts
TRI_DET_EPS = 1e-6  # matches wgsl:140


def _pack_tris(scene: Scene):
    """(TP, 16) plane array: [a(3) | e1(3) | e2(3) | n(3) | pad(4)].

    n = e1 × e2 is the unnormalized geometric normal; ray-independent, so
    XLA hoists the packing out of the per-frame loop.
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


def _cluster_aabbs(scene: Scene, csize: int):
    """(C, 8) cluster bounds [lo(3) | hi(3) | pad(2)] over Morton-sorted
    triangle chunks. Invalid (padding) triangles contribute ±inf so an
    all-padding cluster can never pass the slab test."""
    TP = scene.padded_tris
    C = TP // csize
    valid = (scene.tri_valid > 0.5)[:, None, None]             # (TP,1,1)
    vs = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2], 1)  # (TP,3,3)
    lo = jnp.where(valid, vs, jnp.inf).reshape(C, csize * 3, 3).min(1)
    hi = jnp.where(valid, vs, -jnp.inf).reshape(C, csize * 3, 3).max(1)
    return jnp.concatenate([lo, hi, jnp.zeros((C, 2), jnp.float32)], axis=1)


def _min_fold_refs(t_pairs, valid, ids, bt_ref, bi_ref):
    """Fold an (tt, RT) candidate tile into the running best held in VMEM
    scratch refs (row 0). Refs (not loop-carried values) so that culled
    blocks can be @pl.when-predicated — lax.cond over carried vectors gets
    lowered to select (both branches execute), which defeats culling."""
    t_m = jnp.where(valid, t_pairs, jnp.inf)
    cmin = jnp.min(t_m, axis=0, keepdims=True)                  # (1, RT)
    cid = jnp.min(jnp.where(t_m == cmin, ids, BIG_ID), axis=0,
                  keepdims=True)
    best_t = bt_ref[0:1, :]
    better = cmin < best_t
    bt_ref[0:1, :] = jnp.where(better, cmin, best_t)
    bi_ref[0:1, :] = jnp.where(better, cid, bi_ref[0:1, :])


def _make_kernel(SP: int, TP: int, t_min: float, tt_s: int, csize: int):
    n_sph_chunks = SP // tt_s
    n_clusters = TP // csize

    def kernel(ray_ref, sph_ref, tri_ref, clu_ref, t_out, id_out,
               bt_ref, bi_ref, flag_ref):
        # ray_ref: (8, RT) rows [ox oy oz dx dy dz alive ·]
        ox, oy, oz = ray_ref[0:1, :], ray_ref[1:2, :], ray_ref[2:3, :]
        dx, dy, dz = ray_ref[3:4, :], ray_ref[4:5, :], ray_ref[5:6, :]
        alive = ray_ref[6:7, :] > 0.5
        a_quad = dx * dx + dy * dy + dz * dz          # (1, RT), |d|^2
        # slab-test reciprocals; IEEE inf is fine except 0*inf at lo==o,
        # so substitute a huge finite value for axis-parallel rays
        invdx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        invdy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        invdz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

        bt_ref[0:1, :] = jnp.full((1, RT), jnp.inf, jnp.float32)
        bi_ref[0:1, :] = jnp.full((1, RT), BIG_ID, jnp.int32)

        def sphere_chunk(k, carry):
            s = k * tt_s
            cx = sph_ref[pl.ds(s, tt_s), 0:1]           # (tt, 1)
            cy = sph_ref[pl.ds(s, tt_s), 1:2]
            cz = sph_ref[pl.ds(s, tt_s), 2:3]
            r2 = sph_ref[pl.ds(s, tt_s), 3:4]
            vld = sph_ref[pl.ds(s, tt_s), 4:5]
            # quadratic: near root only (wgsl:106-123)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz  # (tt, RT)
            b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            c = ocx * ocx + ocy * ocy + ocz * ocz - r2
            disc = b * b - 4.0 * a_quad * c
            t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a_quad)
            valid = (disc >= 0.0) & (t >= t_min) & (vld > 0.5) & alive
            ids = (jax.lax.broadcasted_iota(jnp.int32, (tt_s, RT), 0)
                   + jnp.int32(s))
            _min_fold_refs(t, valid, ids, bt_ref, bi_ref)
            return carry

        def tri_block(s):
            """Möller–Trumbore on csize triangles starting at row s."""
            ax = tri_ref[pl.ds(s, csize), 0:1]
            ay = tri_ref[pl.ds(s, csize), 1:2]
            az = tri_ref[pl.ds(s, csize), 2:3]
            e1x = tri_ref[pl.ds(s, csize), 3:4]
            e1y = tri_ref[pl.ds(s, csize), 4:5]
            e1z = tri_ref[pl.ds(s, csize), 5:6]
            e2x = tri_ref[pl.ds(s, csize), 6:7]
            e2y = tri_ref[pl.ds(s, csize), 7:8]
            e2z = tri_ref[pl.ds(s, csize), 8:9]
            nx = tri_ref[pl.ds(s, csize), 9:10]
            ny = tri_ref[pl.ds(s, csize), 10:11]
            nz = tri_ref[pl.ds(s, csize), 11:12]
            # cross/determinant form (wgsl:125-147)
            aox, aoy, aoz = ox - ax, oy - ay, oz - az          # (csize, RT)
            det = -(dx * nx + dy * ny + dz * nz)
            t_num = aox * nx + aoy * ny + aoz * nz
            daox = aoy * dz - aoz * dy                         # ao × d
            daoy = aoz * dx - aox * dz
            daoz = aox * dy - aoy * dx
            u_num = e2x * daox + e2y * daoy + e2z * daoz
            v_num = -(e1x * daox + e1y * daoy + e1z * daoz)
            inv = 1.0 / det
            t = t_num * inv
            u = u_num * inv
            v = v_num * inv
            valid = ((det >= TRI_DET_EPS) & (t >= t_min)
                     & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & alive)
            ids = (jax.lax.broadcasted_iota(jnp.int32, (csize, RT), 0)
                   + (jnp.int32(SP) + s))
            _min_fold_refs(t, valid, ids, bt_ref, bi_ref)

        def cluster_span():
            """Vectorized slab test of ALL cluster AABBs at once → the
            contiguous span [first, last] of entering clusters.

            One (C, RT) batch — no per-cluster scalar loads or branches,
            which otherwise cost as much as the culled triangle math. The
            unconditional span relies on Morton order making entering
            clusters (a compact tile frustum × a space-filling curve)
            contiguous; slack clusters inside the span are just tested.
            """
            C = clu_ref.shape[0]
            lox, loy, loz = clu_ref[:, 0:1], clu_ref[:, 1:2], clu_ref[:, 2:3]
            hix, hiy, hiz = clu_ref[:, 3:4], clu_ref[:, 4:5], clu_ref[:, 5:6]
            t1x, t2x = (lox - ox) * invdx, (hix - ox) * invdx  # (C, RT)
            t1y, t2y = (loy - oy) * invdy, (hiy - oy) * invdy
            t1z, t2z = (loz - oz) * invdz, (hiz - oz) * invdz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                         jnp.minimum(t1y, t2y)),
                             jnp.maximum(jnp.minimum(t1z, t2z), t_min))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                         jnp.maximum(t1y, t2y)),
                             jnp.maximum(t1z, t2z))
            # progressive tightening: spheres already folded into best_t
            enter = (tf >= tn) & alive & (tn < bt_ref[0:1, :])
            flag = jnp.max(jnp.where(enter, 1, 0), axis=1, keepdims=True)
            flag_ref[:, :] = jnp.broadcast_to(flag, flag_ref.shape)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            first = jnp.min(jnp.where(flag > 0, cidx, C))
            last = jnp.max(jnp.where(flag > 0, cidx, -1))
            return first, last

        def span_body(c, carry):
            # per-cluster flag read (one scalar) skips Morton-span slack
            @pl.when(flag_ref[c, 0] > 0)
            def _():
                tri_block(c * csize)
            return carry

        @pl.when(jnp.any(alive))
        def _():
            # fully-dead tiles (compacted wavefront tail) skip everything
            jax.lax.fori_loop(0, n_sph_chunks, sphere_chunk, 0)
            first, last = cluster_span()
            jax.lax.fori_loop(first, last + 1, span_body, 0)

        # output blocks are (8, RT) — sublane dim must be ≥8 on TPU — so
        # broadcast the (1, RT) result across the rows; caller reads row 0.
        best_t, best_id = bt_ref[0:1, :], bi_ref[0:1, :]
        t_out[:, :] = jnp.broadcast_to(best_t, (8, RT))
        id_out[:, :] = jnp.broadcast_to(
            jnp.where(best_id == BIG_ID, jnp.int32(0), best_id), (8, RT))

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def nearest_hit_pallas(scene: Scene, o, d, t_min=1e-4, alive=None,
                       interpret=False):
    """Closest hit for (R, 3) rays → (t (R,), prim_id (R,) int32).

    Drop-in replacement for ops.intersect.nearest_hit_jnp (same id
    convention); R is padded to a multiple of RT internally. ``alive``
    ((R,) bool, optional) marks live wavefront lanes — dead lanes return
    miss and cost (nearly) nothing once sorted into whole-dead tiles.
    """
    R = o.shape[0]
    SP, TP = scene.padded_spheres, scene.padded_tris
    tt_s = min(SPH_TT, SP)
    csize = CLUSTER if TP % CLUSTER == 0 else 128

    n_tiles = -(-R // RT)
    Rp = n_tiles * RT
    if alive is None:
        alive_f = jnp.ones((R,), jnp.float32)
    else:
        alive_f = alive.astype(jnp.float32)
    rays = jnp.concatenate([o, d, alive_f[:, None]], axis=1).T   # (7, R)
    rays = jnp.pad(rays, ((0, 1), (0, Rp - R)))                  # (8, Rp)

    sph = _pack_spheres(scene)                                   # (SP, 8)
    tri = _pack_tris(scene)                                      # (TP, 16)
    clu = _cluster_aabbs(scene, csize)                           # (C, 8)

    kernel = _make_kernel(SP, TP, float(t_min), tt_s, csize)
    t_out, id_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SP, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TP // csize, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, RT), jnp.float32),   # running best t
            pltpu.VMEM((8, RT), jnp.int32),     # running best prim id
            pltpu.VMEM((TP // csize, RT), jnp.int32),  # cluster-enter flags
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=Rp * (SP * 25 + TP * 45),
            bytes_accessed=Rp * 8 * 4 + SP * 32 + TP * 64 + Rp * 8,
            transcendentals=0,
        ),
    )(rays, sph, tri, clu)

    return t_out[0, :R], id_out[0, :R]
