"""Inverse rendering demo — BASELINE config 5.

Recovers a rigid vertex offset AND the albedo of the Utah teapot
(15,704 triangles) from target renders, by gradient descent through the
differentiable renderer: interior gradients (albedo, shading) via autodiff
through the fused-kernel custom_vjp, silhouette gradients for the offset
via the edge sampler (grad/edges.py).

Usage: python tools/invert_teapot.py [steps] [size] [outfile]
Prints one JSON line with the recovery errors and writes it to ``outfile``
(default artifacts/invert_teapot.json). Every step syncs the tiny
parameter/optimizer state to the host and retries through transient
relay failures from that safe point — a multi-minute run must survive
the outages that ate round 2's artifacts.
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
from ray_tracer_tpu.io import load_model
from ray_tracer_tpu.grad.edges import boundary_gradients
from ray_tracer_tpu.renderer import render_aov, render_frame
from ray_tracer_tpu.utils.retry import retry_transient

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 192
OUTFILE = sys.argv[3] if len(sys.argv) > 3 else "artifacts/invert_teapot.json"

TRUE_ALBEDO = np.array([0.7, 0.45, 0.25], np.float32)
TRUE_OFFSET = np.zeros(3, np.float32)
START_ALBEDO = np.array([0.35, 0.6, 0.55], np.float32)


def main():
    b = rt.SceneBuilder()
    load_model("/root/reference/assets/the_utah_teapot.glb", b,
               placement="origin", albedo=tuple(TRUE_ALBEDO), smoothness=0.0)
    lo, hi = b.bounds()
    scene = b.build()
    center, ext = (lo + hi) / 2, float(np.linalg.norm(hi - lo))
    cam = rt.Camera(origin=tuple(center + ext * np.array([0.7, 0.4, 0.7])),
                    look_at=tuple(center), aspect=1.0, focus_dist=1.0)
    basis = rt.camera_basis(cam)
    # rpp=2: with a rigid translation the interior radiance changes only
    # through WHICH surface point each pixel sees, so the offset signal is
    # weak relative to 1-rpp Monte-Carlo noise — measured r3: 80 steps at
    # 128^2/rpp1 stall at off_err ~0.06-0.07 and 240 steps at 64^2/rpp1
    # DIVERGE (0.148 -> 0.19). Averaging 2 rays/pixel + 192^2 + 8192 edge
    # samples lifts the gradient SNR enough to converge.
    params = rt.RenderParams(width=SIZE, height=SIZE, bounces=1, skybox=True,
                             rays_per_pixel=2)

    start_offset = jnp.asarray(0.12 * ext * np.array([1.0, -0.6, 0.4]),
                               jnp.float32)

    base = dict(v0=scene.tri_v0, v1=scene.tri_v1, v2=scene.tri_v2)
    valid = scene.tri_valid[:, None]

    def apply(scene0, offset, albedo):
        import dataclasses
        alb = jnp.broadcast_to(albedo, scene0.tri_albedo.shape)
        return dataclasses.replace(
            scene0,
            tri_v0=base["v0"] + offset * valid,
            tri_v1=base["v1"] + offset * valid,
            tri_v2=base["v2"] + offset * valid,
            tri_albedo=alb * valid)

    # target-side coverage mask, constant across the run (true scene)
    hit_target = jax.block_until_ready(
        jax.jit(lambda: render_aov(scene, basis, params, "hit"))())

    @jax.jit
    def step(opt_state, offset, albedo, frame):
        # Common random numbers: the target is re-rendered with the SAME
        # frame index (= same per-pixel RNG streams) as the optimization
        # render. With independent noise, MSE against a fixed target
        # rewards LOW-VARIANCE images — gradient descent happily pushes
        # the object out of frame to flatten the Monte-Carlo noise
        # (observed). With CRN the noise cancels at the optimum and the
        # loss has an exact zero at the true parameters.
        target = jax.lax.stop_gradient(
            render_frame(scene, basis, params, frame))

        def render_only(offset, albedo):
            s = apply(scene, offset, albedo)
            return render_frame(s, basis, params, frame)

        # ONE forward, TWO cotangent pulls on the same linearization:
        # - offset descends the plain MSE (it NEEDS the edge residuals —
        #   they carry the silhouette signal);
        # - albedo descends the MSE restricted to pixels where BOTH the
        #   current render and the target see geometry (primary-ray hit
        #   AOV overlap, stop-gradiented). While the offset is off by even
        #   1-2 px, silhouette pixels compare teapot against sky and their
        #   huge residuals BIAS the albedo toward the sky mixture
        #   (measured r3 on-chip: offset converged to 0.008·extent while
        #   albedo stalled at error 0.38, sky-bright; a 90%-residual trim
        #   was worse — the teapot covers <10% of the frame, so the trim
        #   dropped the teapot itself and albedo chased the sky to 1.0).
        img, vjp_fn = jax.vjp(render_only, offset, albedo)
        res = img - target
        loss = jnp.mean(res ** 2)
        g_off, _ = vjp_fn(2.0 * res / res.size)
        hit_r = render_aov(apply(scene, jax.lax.stop_gradient(offset),
                                 jax.lax.stop_gradient(albedo)),
                           basis, params, "hit")
        w = hit_r * hit_target
        _, g_alb = vjp_fn(2.0 * res * w / (3.0 * jnp.maximum(jnp.sum(w),
                                                             1.0)))
        # silhouette term for the offset (interior grads can't see it)
        s = apply(scene, offset, albedo)
        cot = 2.0 * (img - target) / img.size
        bg = boundary_gradients(s, basis, params, cot,
                                jax.random.fold_in(jax.random.PRNGKey(7),
                                                   frame),
                                n_tri_samples=8192, n_sph_samples=0)
        g_off = g_off + jnp.sum(
            (bg["tri_v0"] + bg["tri_v1"] + bg["tri_v2"]) * valid, axis=0)
        updates, opt_state = opt.update({"o": g_off, "a": g_alb}, opt_state)
        return opt_state, updates["o"], updates["a"], loss

    # Adam's per-coordinate normalization makes lr ≈ step size: the offset
    # lives in world units (teapot extent ~198) and the albedo in [0, 1],
    # so each gets its own scale via multi_transform. The lr MUST decay:
    # with common random numbers the optimum is an exact fixed point, but
    # Adam's g/sqrt(v) ratio stays O(1) as gradients shrink, so constant
    # lr random-walks at step-size amplitude forever (measured: converged
    # by ~step 120, then wandered off).
    # clip_by_global_norm tames the occasional huge boundary-sample
    # outlier (a sample landing on a near-tangent silhouette edge) that
    # otherwise kicks Adam's moments off the descent path.
    #
    # Two-timescale coupling (measured r3 on-chip): while the offset is
    # wrong, the albedo chases the misalignment mixture (teapot pixels
    # matched against sky) AWAY from truth; the offset converged by
    # ~step 120 but a whole-run cosine had already decayed the albedo lr,
    # freezing it at error 0.38. The albedo lr therefore stays CONSTANT
    # until 60% of the run (by when the offset has settled) and only then
    # cosine-decays.
    opt = optax.multi_transform(
        {"o": optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(optax.cosine_decay_schedule(0.015 * ext, STEPS,
                                                   alpha=0.005))),
         "a": optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(optax.join_schedules(
                [optax.constant_schedule(0.03),
                 optax.cosine_decay_schedule(0.03, STEPS - int(0.6 * STEPS),
                                             alpha=0.01)],
                [int(0.6 * STEPS)])))},
        {"o": "o", "a": "a"})
    offset = start_offset
    albedo = jnp.asarray(START_ALBEDO)
    opt_state = opt.init({"o": offset, "a": albedo})

    t0 = time.time()
    for i in range(STEPS):
        # host-side safe point: the whole step state is ~50 floats, so
        # pulling it each iteration costs nothing next to the render; a
        # transient relay failure retries the step from these host copies
        def one_step(_i=i, _os=opt_state, _of=offset, _al=albedo):
            return jax.device_get(step(_os, _of, _al, jnp.int32(_i)))

        opt_state, do, da, loss = retry_transient(
            one_step, retries=4, base_delay=15.0, max_delay=240.0)
        offset = offset + do
        albedo = np.clip(albedo + da, 0.0, 1.0)  # physical range projection
        if i % max(1, STEPS // 10) == 0:
            print(f"step {i:4d} loss {float(loss):.6f} "
                  f"off_err {float(np.linalg.norm(offset))/ext:.4f} "
                  f"alb {np.asarray(albedo).round(3)}", file=sys.stderr)

    import jax as _jax
    off_err = float(np.linalg.norm(np.asarray(offset) - TRUE_OFFSET)) / ext
    alb_err = float(np.abs(np.asarray(albedo) - TRUE_ALBEDO).max())
    result = {
        "steps": STEPS, "resolution": SIZE,
        "seconds": round(time.time() - t0, 1),
        "tris": 15704,
        "device": str(_jax.devices()[0]),
        "start_offset_rel": 0.12 * float(np.linalg.norm([1.0, -0.6, 0.4])),
        "offset_error_rel_extent": round(off_err, 4),
        "albedo_error": round(alb_err, 4),
        "recovered": off_err < 0.02 and alb_err < 0.05,
    }
    line = json.dumps(result)
    print(line)
    if OUTFILE:
        os.makedirs(os.path.dirname(OUTFILE) or ".", exist_ok=True)
        with open(OUTFILE, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
