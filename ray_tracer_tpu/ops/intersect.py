"""Closest-hit intersection: pure-jnp oracle + backend dispatch.

The reference's intersection is a per-thread linear scan over all spheres
then all mesh triangles, keeping the closest hit
(shaders/ray_tracer.wgsl:149-185; sphere test :106-123, Möller–Trumbore
:125-147). Here the same brute force is expressed as a two-stage design:

  1. ``nearest_hit``: rays × primitives closest-hit search → per-ray
     ``(t, prim_id)``. Discrete, non-differentiable by construction (inputs
     are detached). Backends: readable broadcast jnp (the oracle) or a
     Pallas MXU kernel (ops/pallas_intersect.py).
  2. ``hit_attributes``: gathers ONLY the winning primitive per ray and
     recomputes t / normal / material *differentiably*. O(rays), pure jnp.

This split is what makes the whole renderer differentiable without a custom
VJP through the search: the argmin index is detached (the standard
"detach discrete choices" treatment) while every continuous quantity is
recomputed from gathered primitive parameters, so gradients flow to sphere
centers/radii, triangle vertices, and material fields via the gather's
scatter-add transpose.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..scene import Scene

TRI_DET_EPS = 1e-6  # back-face / parallel cutoff (shaders/ray_tracer.wgsl:140)
INF = jnp.float32(jnp.inf)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """Per-ray hit record (SoA analog of the WGSL Hit struct, wgsl:91-97)."""

    t: jax.Array                  # (R,)
    hit: jax.Array                # (R,) bool
    prim_id: jax.Array            # (R,) int32 winner id (detached; 0 on miss
                                  # from the pallas path — gate on .hit)
    point: jax.Array              # (R, 3)
    normal: jax.Array             # (R, 3) unit, outward (never flipped —
                                  # matches wgsl sphere/tri normals)
    albedo: jax.Array             # (R, 3)
    emission: jax.Array           # (R, 3)
    emission_strength: jax.Array  # (R,)
    smoothness: jax.Array         # (R,)


# ---------------------------------------------------------------------------
# Stage 1: closest-hit search (oracle backend)
# ---------------------------------------------------------------------------

def sphere_ts(scene: Scene, o, d, t_min):
    """All ray-sphere hit distances, +inf on miss. (R, S).

    Near-root-only quadratic, exactly like wgsl:106-123 (no far root, no
    outward-normal flip), plus the t_min epsilon (deviation D2).
    """
    oc = o[:, None, :] - scene.sphere_center[None, :, :]        # (R, S, 3)
    a = jnp.sum(d * d, axis=-1)[:, None]                         # (R, 1)
    b = 2.0 * jnp.sum(oc * d[:, None, :], axis=-1)               # (R, S)
    c = jnp.sum(oc * oc, axis=-1) - scene.sphere_radius[None, :] ** 2
    disc = b * b - 4.0 * a * c
    t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
    valid = (disc >= 0.0) & (t >= t_min) & (scene.sphere_valid[None, :] > 0.5)
    return jnp.where(valid, t, INF)


def triangle_ts(scene: Scene, o, d, t_min):
    """All ray-triangle hit distances, +inf on miss. (R, T).

    Möller–Trumbore in the cross/determinant form of wgsl:125-147: accepts
    det >= 1e-6 (back-face culled) and u, v, w >= 0.
    """
    e1 = scene.tri_v1 - scene.tri_v0                             # (T, 3)
    e2 = scene.tri_v2 - scene.tri_v0
    n = jnp.cross(e1, e2)                                        # (T, 3)
    ao = o[:, None, :] - scene.tri_v0[None, :, :]                # (R, T, 3)
    dao = jnp.cross(ao, d[:, None, :])                           # (R, T, 3)
    det = -jnp.sum(d[:, None, :] * n[None, :, :], axis=-1)       # (R, T)
    inv = 1.0 / det
    t = jnp.sum(ao * n[None, :, :], axis=-1) * inv
    u = jnp.sum(e2[None, :, :] * dao, axis=-1) * inv
    v = -jnp.sum(e1[None, :, :] * dao, axis=-1) * inv
    w = 1.0 - u - v
    valid = (
        (det >= TRI_DET_EPS) & (t >= t_min)
        & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
        & (scene.tri_valid[None, :] > 0.5)
    )
    return jnp.where(valid, t, INF)


def nearest_hit_jnp(scene: Scene, o, d, t_min):
    """Oracle closest-hit: returns (t (R,), prim_id (R,) int32).

    prim_id in [0, S_pad) = sphere index; [S_pad, S_pad+T_pad) = triangle
    index + S_pad; t = +inf encodes a miss.
    """
    ts = sphere_ts(scene, o, d, t_min)
    tt = triangle_ts(scene, o, d, t_min)
    all_t = jnp.concatenate([ts, tt], axis=1)
    prim_id = jnp.argmin(all_t, axis=1).astype(jnp.int32)
    best_t = jnp.min(all_t, axis=1)
    return best_t, prim_id


# ---------------------------------------------------------------------------
# Stage 2: differentiable winner recompute
# ---------------------------------------------------------------------------

def _safe_normalize(v, eps=1e-24):
    """Normalize with NaN-free gradients at ||v|| → 0 (double-where on the
    squared norm so the backward of rsqrt never sees 0)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = sq > eps
    inv = jax.lax.rsqrt(jnp.where(ok, sq, 1.0))
    return jnp.where(ok, v * inv, v)

def _pack_attrs(scene: Scene):
    """(S+T, 26|42) row-packed primitive attributes, indexed directly by
    prim_id: rows [0, S) are spheres (12 used columns, zero-padded), rows
    [S, S+T) are triangles. ONE table means the winner recompute costs one
    gather per ray — and, critically, its VJP transpose costs one
    scatter-add per bounce instead of two (TPU gathers/scatters are
    row-rate-bound, so halving row ops ≈ halves the backward's cost).
    Scene-only → hoisted out of the bounce scan by XLA.

    Sphere columns: 0:3 center, 3 radius, 4:7 albedo, 7:10 emission,
    10 strength, 11 smoothness.
    Triangle columns: 0:9 v0/v1/v2, 9:18 n0/n1/n2, 18:21 albedo,
    21:24 emission, 24 strength, 25 smoothness; textured scenes append
    26:32 uv0/uv1/uv2, 32:38 tan/bitan, 38 tex id, 39 ntex id.
    """
    width = 40 if scene.num_textures else 26
    sp = jnp.concatenate([
        scene.sphere_center, scene.sphere_radius[:, None],
        scene.sphere_albedo, scene.sphere_emission,
        scene.sphere_emission_strength[:, None],
        scene.sphere_smoothness[:, None],
    ], axis=1)
    sp = jnp.pad(sp, ((0, 0), (0, width - sp.shape[1])))
    cols = [
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_n0, scene.tri_n1, scene.tri_n2,
        scene.tri_albedo, scene.tri_emission,
        scene.tri_emission_strength[:, None],
        scene.tri_smoothness[:, None],
    ]
    if scene.num_textures:
        cols += [scene.tri_uv0, scene.tri_uv1, scene.tri_uv2,
                 scene.tri_tan, scene.tri_bitan,
                 scene.tri_tex[:, None].astype(jnp.float32),
                 scene.tri_ntex[:, None].astype(jnp.float32)]
    tp = jnp.concatenate(cols, axis=1)
    tp = jnp.pad(tp, ((0, 0), (0, width - tp.shape[1])))
    return jnp.concatenate([sp, tp], axis=0)


def _textured_shading(textures, albedo, normal, uv, tex, ntex, tan, bitan,
                      with_normal_maps=True):
    """Texture-map the shading attributes of rays whose winner carries
    texture ids: modulate albedo by the base-color map and rotate the
    normal by the tangent-frame normal map. ``tex``/``ntex`` = -1 lanes
    pass through unchanged (sample_bilinear returns white). Shared by the
    jnp winner-recompute (hit_attributes) and the fused Pallas forward.
    ``with_normal_maps=False`` (static, from scene.num_normal_maps) elides
    the second texture fetch entirely."""
    from ..texture import decode_normal_map, sample_bilinear
    albedo = albedo * sample_bilinear(textures, tex, uv)
    if with_normal_maps:
        nm = decode_normal_map(sample_bilinear(textures, ntex, uv))
        n_mapped = _safe_normalize(
            nm[:, 0:1] * tan + nm[:, 1:2] * bitan + nm[:, 2:3] * normal)
        normal = jnp.where((ntex >= 0)[:, None], n_mapped, normal)
    return albedo, normal


def hit_attributes(scene: Scene, o, d, prim_id, miss, t_min):
    """Gather the winning primitive and recompute the hit differentiably.

    Args:
      scene: Scene pytree (differentiable leaves).
      o, d: ray origins/dirs (R, 3).
      prim_id: winner indices from stage 1 (detached ints).
      miss: (R,) bool, True where no primitive was hit.
      t_min: epsilon (only used to keep recomputed t consistent).

    Returns: Hit.
    """
    S = scene.padded_spheres
    is_tri = prim_id >= S
    # ONE merged-table gather per ray (and one scatter-add in its VJP
    # transpose) — each ray reads its winner's row; both the sphere and
    # triangle recomputes below run on that same row, reinterpreting the
    # columns per their type, and the per-type results are where-selected.
    # Cross-type garbage is fine: every recompute is double-where NaN-safe,
    # and `where` zeroes the unselected branch's cotangents so no gradient
    # flows through a misread column.
    ap = _pack_attrs(scene)[
        jnp.clip(prim_id, 0, S + scene.padded_tris - 1)]  # (R, 26|40)
    sp = ap
    tp = ap

    # --- sphere recompute (wgsl:106-123) ---------------------------------
    # NaN-safe for autodiff: lanes that actually missed (masked downstream)
    # still run this recompute, and d/dx sqrt(max(x,0)) at x<=0 is inf*0=NaN
    # which `where` masking does NOT stop in the backward pass. The standard
    # double-where makes the untaken branch differentiate a benign constant.
    c = sp[:, 0:3]
    r = sp[:, 3]
    oc = o - c
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b * b - 4.0 * a * cc
    disc_ok = disc > 0.0
    safe_disc = jnp.where(disc_ok, disc, 1.0)
    t_sphere = (-b - jnp.where(disc_ok, jnp.sqrt(safe_disc), 0.0)) / (2.0 * a)
    p_sphere = o + d * t_sphere[:, None]
    n_sphere = _safe_normalize(p_sphere - c)

    # --- triangle recompute (wgsl:125-147) --------------------------------
    v0, v1, v2 = tp[:, 0:3], tp[:, 3:6], tp[:, 6:9]
    n0, n1, n2 = tp[:, 9:12], tp[:, 12:15], tp[:, 15:18]
    e1, e2 = v1 - v0, v2 - v0
    ng = jnp.cross(e1, e2)
    ao = o - v0
    dao = jnp.cross(ao, d)
    det = -jnp.sum(d * ng, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    t_tri = jnp.sum(ao * ng, axis=-1) * inv
    u = jnp.sum(e2 * dao, axis=-1) * inv
    v = -jnp.sum(e1 * dao, axis=-1) * inv
    w = 1.0 - u - v
    n_blend = n0 * w[:, None] + n1 * u[:, None] + n2 * v[:, None]
    n_tri = _safe_normalize(n_blend)

    # --- UV/texture shading (extension; static no-op when untextured) ----
    tri_albedo = tp[:, 18:21]
    if scene.num_textures:
        uv = (tp[:, 26:28] * w[:, None] + tp[:, 28:30] * u[:, None]
              + tp[:, 30:32] * v[:, None])
        tri_albedo, n_tri = _textured_shading(
            scene.textures, tri_albedo, n_tri, uv,
            tp[:, 38].astype(jnp.int32), tp[:, 39].astype(jnp.int32),
            tp[:, 32:35], tp[:, 35:38],
            with_normal_maps=scene.num_normal_maps > 0)

    # --- select ------------------------------------------------------------
    it = is_tri[:, None]
    t = jnp.where(is_tri, t_tri, t_sphere)
    normal = jnp.where(it, n_tri, n_sphere)
    point = o + d * t[:, None]
    albedo = jnp.where(it, tri_albedo, sp[:, 4:7])
    emission = jnp.where(it, tp[:, 21:24], sp[:, 7:10])
    emission_strength = jnp.where(is_tri, tp[:, 24], sp[:, 10])
    smoothness = jnp.where(is_tri, tp[:, 25], sp[:, 11])

    hit = jnp.logical_not(miss)
    return Hit(
        t=t, hit=hit, prim_id=jax.lax.stop_gradient(prim_id), point=point,
        normal=normal, albedo=albedo,
        emission=emission, emission_strength=emission_strength,
        smoothness=smoothness,
    )


# ---------------------------------------------------------------------------
# Fused forward path: in-kernel attribute extraction + jnp backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_intersect(scene, o, d, t_min, alive):
    """Closest hit with attributes extracted INSIDE the Pallas kernel
    (nearest_hit_attrs_pallas) — replaces the slow XLA winner-gather on the
    forward path. Differentiable: the backward pass recomputes the winner's
    attributes with the jnp path (hit_attributes) and chains its VJP, so
    gradients to scene/ray leaves match the oracle path exactly."""
    hit, _, _ = _fused_forward(scene, o, d, t_min, alive)
    return hit


def _fused_forward(scene, o, d, t_min, alive):
    from .pallas_intersect import nearest_hit_attrs_pallas
    o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
    scene_s = jax.lax.stop_gradient(scene)
    best_t, prim_id, attrs = nearest_hit_attrs_pallas(
        scene_s, o_s, d_s, t_min, alive=alive)
    miss = jnp.isinf(best_t)
    t = jnp.where(miss, 0.0, best_t)
    normal = _safe_normalize(attrs[:, 0:3])
    albedo = attrs[:, 3:6]
    if scene.num_textures:
        # the kernel emitted interpolated UVs + texture ids + tangent frame
        # (attr rows 11-20); only the texture fetch itself stays outside
        albedo, normal = _textured_shading(
            scene_s.textures, albedo, normal, attrs[:, 11:13],
            attrs[:, 13].astype(jnp.int32), attrs[:, 14].astype(jnp.int32),
            attrs[:, 15:18], attrs[:, 18:21],
            with_normal_maps=scene.num_normal_maps > 0)
    hit = Hit(
        t=t, hit=jnp.logical_not(miss), prim_id=prim_id,
        point=o_s + d_s * t[:, None],
        normal=normal, albedo=albedo,
        emission=attrs[:, 6:9], emission_strength=attrs[:, 9],
        smoothness=attrs[:, 10])
    return hit, prim_id, miss


def _fused_intersect_fwd(scene, o, d, t_min, alive):
    hit, prim_id, miss = _fused_forward(scene, o, d, t_min, alive)
    return hit, (scene, o, d, prim_id, miss)


def _fused_intersect_bwd(t_min, res, g):
    scene, o, d, prim_id, miss = res
    _, vjp = jax.vjp(
        lambda sc, oo, dd: hit_attributes(sc, oo, dd, prim_id, miss, t_min),
        scene, o, d)
    gs, go, gd = vjp(g)
    return gs, go, gd, None


fused_intersect.defvjp(_fused_intersect_fwd, _fused_intersect_bwd)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def occluded(scene: Scene, o, d, t_min=1e-4, backend: str = "jnp",
             alive=None):
    """Shadow query: True where some primitive blocks the segment o → o+d
    (i.e. a hit at t < 1-ε in units of |d|). The Pallas backend uses the
    dedicated early-exit any-hit kernel (no winner tracking, first hit
    settles a lane) instead of a full closest-hit; non-differentiable by
    design (visibility gradients need edge sampling — see docs)."""
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "jnp"
    o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
    scene_s = jax.lax.stop_gradient(scene)
    if backend == "pallas":
        from .pallas_intersect import (anyhit_pallas, env_config,
                                       nearest_hit_pallas, _use_blocked)
        if _use_blocked(scene_s, env_config()):
            # the any-hit kernel keeps the whole scene VMEM-resident;
            # over-budget scenes answer occlusion via the streaming
            # closest-hit instead (correct, no early exit)
            best_t, _ = nearest_hit_pallas(scene_s, o_s, d_s, t_min,
                                           alive=alive)
            return best_t < (1.0 - 1e-3)
        return anyhit_pallas(scene_s, o_s, d_s, t_min, t_max=1.0 - 1e-3,
                             alive=alive)
    best_t, _ = nearest_hit_jnp(scene_s, o_s, d_s, t_min)
    return best_t < (1.0 - 1e-3)


def intersect(scene: Scene, o, d, t_min=1e-4, backend: str = "jnp",
              alive=None) -> Hit:
    """Full closest-hit query → Hit. ``backend``: "jnp" | "pallas" | "auto".

    ``alive`` ((R,) bool, optional): wavefront liveness. The Pallas backend
    skips work for dead lanes/tiles; the jnp oracle is fully vectorized and
    ignores it (dead lanes' results are masked downstream either way).
    """
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "jnp"
    if backend == "pallas":
        # fused path: attributes (incl. UVs/texture ids when textured)
        # extracted in-kernel; only texture fetches run outside
        return fused_intersect(scene, o, d, t_min, alive)
    o_s, d_s = jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
    scene_s = jax.lax.stop_gradient(scene)
    best_t, prim_id = nearest_hit_jnp(scene_s, o_s, d_s, t_min)
    miss = jnp.isinf(best_t)
    return hit_attributes(scene, o, d, prim_id, miss, t_min)
