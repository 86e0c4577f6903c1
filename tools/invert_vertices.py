"""Per-vertex geometry recovery — BASELINE config 5 as written.

Recovers a PER-VERTEX offset field (plus a uniform albedo) of a triangle
mesh from multi-view target renders:

  * interior gradients: autodiff through apply_vertex_offsets (positions
    AND area-weighted recomputed normals, so shading sees geometry) and
    the renderer's detached-winner continuous recompute;
  * visibility gradients: the silhouette-classified physical-edge
    boundary estimator (grad/edges.py + grad/topology.py — the round-5
    hardening: one sample slot per physical edge, importance ∝ projected
    length, silhouette/boundary/crease classification per step), pulled
    back onto unique vertices;
  * a Dirichlet (graph-Laplacian) prior propagates sparse silhouette
    evidence inboard — each view constrains only its own silhouette ring;
  * common random numbers: target re-rendered with the optimization
    render's frame index, so the loss has an exact zero at the truth and
    Monte-Carlo noise cancels instead of rewarding object-out-of-frame
    flattening (same failure catalog as tools/invert_teapot.py).

Views cycle per step (one view per step: V-view coverage at 1-view cost);
the albedo unfreezes after the offsets have converged most of the way
(the two-timescale schedule measured in r3 — a misaligned silhouette band
biases the albedo toward the background mixture).

Usage: python tools/invert_vertices.py [steps] [size] [outfile]
Prints one JSON line with the recovery errors (offset-field RMS relative
to scene extent) and writes it to ``outfile``.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
import ray_tracer_tpu as rt
from ray_tracer_tpu.grad.edges import boundary_gradients
from ray_tracer_tpu.grad.topology import (apply_vertex_offsets,
                                          build_topology, dirichlet_energy,
                                          pull_back_vertex_grads,
                                          sobolev_precondition)
from ray_tracer_tpu.renderer import render_aov, render_frame
from ray_tracer_tpu.utils.retry import retry_transient

TRUE_ALBEDO = np.array([0.7, 0.45, 0.25], np.float32)


def smooth_field(key, verts, ext, rms, waves: int = 4):
    """Smooth random per-vertex field with the requested RMS: a sum of
    low-frequency sinusoids of the position (wavelengths ~ the scene
    extent), so the perturbation is recoverable-by-smoothness rather than
    per-vertex white noise no finite view set could pin down."""
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = jax.random.normal(k1, (waves, 3)) * (2.0 * np.pi / ext)
    phases = jax.random.uniform(k2, (waves,)) * (2.0 * np.pi)
    amps = jax.random.normal(k3, (waves, 3))
    phase = verts @ freqs.T + phases[None, :]            # (V, waves)
    field = jnp.sin(phase) @ amps                        # (V, 3)
    scale = rms / jnp.sqrt(jnp.mean(jnp.sum(field ** 2, axis=-1)))
    return field * scale


def ring_cameras(center, ext, n_views: int, elevation: float = 0.4,
                 radius: float = 0.85, alternate: bool = True):
    """n_views thin-lens cameras on an azimuth ring looking at center.
    ``alternate`` flips the elevation sign on odd views so the object's
    underside is observed too (a one-sided ring leaves the bottom cap
    unconstrained — measured as a normal-error floor on the octasphere)."""
    bases = []
    for i in range(n_views):
        th = 2.0 * np.pi * i / n_views
        el = elevation * (-1.0 if (alternate and i % 2) else 1.0)
        eye = center + ext * np.array(
            [radius * np.cos(th), el, radius * np.sin(th)])
        cam = rt.Camera(origin=tuple(eye), look_at=tuple(center),
                        aspect=1.0, focus_dist=1.0)
        bases.append(rt.camera_basis(cam))
    return bases


def run_vertex_recovery(scene_true, topo, params, bases, steps,
                        start_offsets, start_albedo=None,
                        edge_samples: int = 4096,
                        smooth_weight: float = 0.08,
                        smooth_weight_end: float = 0.08,
                        l2_weight: float = 0.0,
                        lr_scale: float = 0.004,
                        albedo_phase: float = 0.25,
                        frame_cycle: int = 0,
                        sobolev_lam: float = 0.0,
                        ext: float = 1.0, log=True, log_every=None,
                        safe_point=False):
    """The recovery loop. ``scene_true`` must already be representable by
    the model (textures stripped, true albedo baked). Returns
    (offsets (V, 3) np, albedo (3,) np or None, losses list).

    ``smooth_weight`` multiplies the Dirichlet prior in units of
    (offset/ext)^2 — dimensionless, scene-size-agnostic. ``l2_weight``
    adds a weak pull of the offset field toward zero in the same units:
    TANGENTIAL vertex sliding is a null space of any image loss (the
    surface doesn't move when vertices slide along it), so the
    image-consistent solution set is a manifold; the L2 term selects its
    minimum-norm point — the standard treatment of an underdetermined
    inverse problem, and exactly the VERDICT metric (offset-field RMS).
    ``safe_point=True`` pulls the training state to the host each step and
    retries transient relay failures from it (chip runs)."""
    V = topo.num_verts
    n_views = len(bases)
    recover_albedo = start_albedo is not None
    valid = scene_true.tri_valid

    # stack the per-view bases into one pytree; the jitted step indexes it
    basis_stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bases)

    def scene_at(off, alb):
        s = apply_vertex_offsets(scene_true, topo, off)
        if recover_albedo:
            import dataclasses
            s = dataclasses.replace(
                s, tri_albedo=jnp.broadcast_to(alb, s.tri_albedo.shape)
                * valid[:, None])
        return s

    a_phase = int(albedo_phase * steps)
    opt = optax.multi_transform(
        {"o": optax.chain(
            optax.clip_by_global_norm(float(10.0 * ext)),
            optax.adam(optax.cosine_decay_schedule(
                lr_scale * ext, steps, alpha=0.02))),
         "a": optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(optax.join_schedules(
                [optax.constant_schedule(0.0),
                 optax.cosine_decay_schedule(0.03, max(1, steps - a_phase),
                                             alpha=0.02)],
                [a_phase])))},
        {"o": "o", "a": "a"})

    # target-side coverage masks per view, constant across the run
    hit_targets = jnp.stack([
        render_aov(scene_true, jax.tree_util.tree_map(
            lambda x: x[i], basis_stack), params, "hit")
        for i in range(n_views)])

    @jax.jit
    def step(opt_state, off, alb, i):
        basis = jax.tree_util.tree_map(
            lambda x: x[i % n_views], basis_stack)
        hit_t = hit_targets[i % n_views]
        # CRN: same frame index (= same per-pixel streams) for target and
        # render. frame_cycle > 0 cycles a SMALL fixed set of noise
        # realizations instead of a fresh one per step: the loss becomes
        # (piecewise) deterministic with its exact zero still at the
        # truth, so weakly-observed directions descend instead of
        # random-walking on per-step gradient noise (measured: the
        # fresh-frame schedule plateaus 2x higher).
        f = (i % jnp.int32(frame_cycle)) if frame_cycle else i
        target = jax.lax.stop_gradient(
            render_frame(scene_true, basis, params, f))

        def render_only(off_, alb_):
            return render_frame(scene_at(off_, alb_), basis, params, f)

        img, vjp_fn = jax.vjp(render_only, off, alb)
        res = img - target
        loss = jnp.mean(res ** 2)
        cot = 2.0 * res / jnp.float32(res.size)

        # interior gradient; the albedo cotangent is restricted to pixels
        # both coverages agree on (the r3 silhouette-band bias fix)
        w = (render_aov(scene_at(jax.lax.stop_gradient(off),
                                 jax.lax.stop_gradient(alb)),
                        basis, params, "hit") * hit_t)
        g_off, g_alb = vjp_fn(cot)
        if recover_albedo:
            _, g_alb = vjp_fn(2.0 * res * w
                              / (3.0 * jnp.maximum(jnp.sum(w), 1.0)))

        # boundary (visibility) gradient at the CURRENT geometry
        s_cur = scene_at(jax.lax.stop_gradient(off),
                         jax.lax.stop_gradient(alb))
        key = jax.random.fold_in(jax.random.PRNGKey(7172), i)
        bg = boundary_gradients(s_cur, basis, params, cot, key,
                                n_tri_samples=edge_samples,
                                n_sph_samples=0, topology=topo)
        g_off = g_off + pull_back_vertex_grads(topo, bg, valid)

        # priors (dimensionless: offsets measured in exts): Dirichlet
        # smoothness + optional minimum-norm term. The smoothness weight
        # ANNEALS exponentially from smooth_weight to smooth_weight_end
        # over the run: unregularized per-vertex descent DIVERGES from a
        # 10%-extent perturbation (measured 0.117 final RMS), but a
        # strong constant prior holds a prior-data equilibrium ~2x above
        # the reachable error (measured: sw=30 plateaus at 1.8% RMS,
        # sw=5 reaches 1.06%, 30->2 anneal goes lower still).
        sw = smooth_weight * jnp.power(
            jnp.float32(smooth_weight_end / max(smooth_weight, 1e-9)),
            i.astype(jnp.float32) / max(1, steps - 1))

        def prior(o):
            on = o / ext
            # dirichlet_energy is scale-invariant (normalized by base
            # edge length) — pass raw offsets; only the L2 term needs ext
            return (sw * dirichlet_energy(topo, o)
                    + l2_weight * jnp.mean(jnp.sum(on * on, axis=-1)))
        g_off = g_off + jax.grad(prior)(off)

        # Sobolev (Laplacian) preconditioning — see
        # grad.topology.sobolev_precondition. Applied to the TOTAL vertex
        # gradient so large-scale error modes move first instead of the
        # rough per-vertex components crumpling into local minima (the
        # r5 teapot plateau at ~5-6% RMS with every first-order knob).
        if sobolev_lam:
            g_off = sobolev_precondition(topo, g_off, sobolev_lam)

        updates, opt_state2 = opt.update({"o": g_off, "a": g_alb},
                                         opt_state)
        return opt_state2, updates["o"], updates["a"], loss

    off = jnp.asarray(start_offsets, jnp.float32)
    alb = (jnp.asarray(start_albedo, jnp.float32) if recover_albedo
           else jnp.asarray(TRUE_ALBEDO))
    opt_state = opt.init({"o": off, "a": alb})

    losses = []
    log_every = log_every or max(1, steps // 10)
    for i in range(steps):
        if safe_point:
            def one(_i=i, _os=opt_state, _of=off, _al=alb):
                return jax.device_get(step(_os, _of, _al, jnp.int32(_i)))
            opt_state, do, da, loss = retry_transient(
                one, retries=4, base_delay=15.0, max_delay=240.0)
        else:
            opt_state, do, da, loss = step(opt_state, off, alb,
                                           jnp.int32(i))
        off = off + do
        if recover_albedo:
            alb = jnp.clip(alb + da, 0.0, 1.0)
        losses.append(float(loss))
        if log and i % log_every == 0:
            rms = float(jnp.sqrt(jnp.mean(jnp.sum(
                jnp.asarray(off) ** 2, -1)))) / ext
            print(f"step {i:4d} loss {float(loss):.6f} "
                  f"off_rms {rms:.4f}"
                  + (f" alb {np.asarray(alb).round(3)}"
                     if recover_albedo else ""),
                  file=sys.stderr)
    return (np.asarray(off), np.asarray(alb) if recover_albedo else None,
            losses)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out = (sys.argv[3] if len(sys.argv) > 3
           else "artifacts/invert_vertices.json")
    seed = int(os.environ.get("RTT_INVERT_SEED", "1"))
    start_rms = float(os.environ.get("RTT_INVERT_START_RMS", "0.10"))

    from ray_tracer_tpu.io import load_model
    import dataclasses as _dc

    b = rt.SceneBuilder()
    load_model("/root/reference/assets/the_utah_teapot.glb", b,
               placement="origin", albedo=tuple(TRUE_ALBEDO), smoothness=0.0)
    lo, hi = b.bounds()
    scene = b.build()
    # strip textures; the recovery model is a uniform albedo (see
    # tools/invert_teapot.py for the measured two-mesh-mixture attractor)
    scene = _dc.replace(
        scene,
        tri_tex=jnp.full_like(scene.tri_tex, -1),
        tri_albedo=(jnp.broadcast_to(jnp.asarray(TRUE_ALBEDO),
                                     scene.tri_albedo.shape)
                    * scene.tri_valid[:, None]))
    center, ext = (lo + hi) / 2, float(np.linalg.norm(hi - lo))
    topo = build_topology(scene)
    # consistent normal model: truth uses the same recomputed normals the
    # recovery renders with
    scene = apply_vertex_offsets(
        scene, topo, jnp.zeros((topo.num_verts, 3), jnp.float32))

    params = rt.RenderParams(width=size, height=size, bounces=1,
                             skybox=True, rays_per_pixel=1)
    bases = ring_cameras(center, ext,
                         n_views=int(os.environ.get("RTT_INVERT_VIEWS",
                                                    "6")))

    start = smooth_field(jax.random.PRNGKey(seed), topo.base_verts, ext,
                         rms=start_rms * ext)
    start_alb = np.array([0.35, 0.6, 0.55], np.float32)

    t0 = time.time()
    # frame_cycle: the CRN loss cycles a small fixed set of noise
    # realizations (piecewise-deterministic objective with its zero at
    # the truth) — the fresh-noise-per-step schedule plateaus ~2x higher
    # (measured r3, reconfirmed r5 on the teapot: 6.1% RMS without,
    # recovered with; the CPU octasphere test runs frame_cycle=2)
    env = os.environ.get
    off, alb, losses = run_vertex_recovery(
        scene, topo, params, bases, steps, start, start_alb,
        frame_cycle=int(env("RTT_INVERT_FRAME_CYCLE", "2")),
        edge_samples=int(env("RTT_INVERT_EDGE_SAMPLES", "4096")),
        smooth_weight=float(env("RTT_INVERT_SW", "0.08")),
        smooth_weight_end=float(env("RTT_INVERT_SW_END", "0.08")),
        l2_weight=float(env("RTT_INVERT_L2", "0.0")),
        lr_scale=float(env("RTT_INVERT_LR", "0.004")),
        sobolev_lam=float(env("RTT_INVERT_SOBOLEV", "50.0")),
        ext=ext, safe_point=True)

    rms = float(np.sqrt(np.mean(np.sum(off ** 2, -1)))) / ext
    alb_err = float(np.abs(alb - TRUE_ALBEDO).max())
    result = {
        "steps": steps, "resolution": size, "views": len(bases),
        "seconds": round(time.time() - t0, 1),
        "tris": int(scene.num_tris), "vertices": int(topo.num_verts),
        "dof": int(topo.num_verts * 3),
        "device": str(jax.devices()[0]),
        "seed": seed,
        "start_offset_rms_rel_extent": start_rms,
        "offset_rms_rel_extent": round(rms, 5),
        "albedo_error": round(alb_err, 4),
        "recovered": rms < 0.01 and alb_err < 0.05,
    }
    line = json.dumps(result)
    print(line)
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
