"""Bisect the per-bounce cost of renderer.trace on the chip.

profile_components r2 found: intersect calls sum to ~115 ms/frame but
trace(b=3) costs ~940 ms — ~700 ms unaccounted inside the scan body. Each
variant here strips one piece of the bounce body to localize it.

Usage: python tools/ab_trace.py [reps] [variant ...]
Writes progress to /tmp/ab_trace.log.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import ray_tracer_tpu as rt
from ray_tracer_tpu import materials
from ray_tracer_tpu.envlight import environment_light
from ray_tracer_tpu.io import load_model
from ray_tracer_tpu.ops.intersect import fused_intersect
from ray_tracer_tpu.renderer import _blocked_order, trace
from ray_tracer_tpu import camera_basis, sampling
from ray_tracer_tpu.camera import camera_rays

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
T0 = time.time()


def log(*a):
    msg = f"{time.time()-T0:7.1f} " + " ".join(map(str, a))
    print(msg, flush=True)
    with open("/tmp/ab_trace.log", "a") as f:
        f.write(msg + "\n")


def timeit(label, fn, *args):
    @jax.jit
    def looped(*a):
        def body(c, _):
            a2 = (a[0] + c * 1e-30,) + a[1:]
            out = fn(*a2)
            s = sum(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                      x.astype(jnp.float32), 0.0))
                    for x in jax.tree_util.tree_leaves(out))
            return c + s * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=REPS)
        return jnp.full((8, 128), acc)

    log("compiling:", label)
    t0 = time.time()
    np.asarray(looped(*args))
    log(f"  compile+first: {time.time()-t0:.1f} s")
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(looped(*args))
        dt = min(dt, (time.time() - t0) / REPS)
    log(f"RESULT {label}: {dt*1e3:8.1f} ms")
    return dt


def make_variant(scene, bounces, *, do_scatter=True, do_env=True,
                 do_radiance=True, do_intersect=True, carries=False,
                 via_intersect=False, share_tile=0, sum_t=False):
    """A stripped copy of renderer.trace's bounce loop (no nee/compaction).

    carries=True adds trace()'s extra machinery (slot + emission_ok scan
    carries, seg_index xs array) to isolate its cost; via_intersect=True
    swaps the direct fused_intersect call for the intersect() wrapper."""
    from ray_tracer_tpu.ops.intersect import intersect as intersect_wrap

    def fn(o, d, state):
        zero3 = o * 0.0
        R = o.shape[0]
        init = (o, d, zero3 + 1.0, zero3, zero3[:, 0] == 0.0, state)
        if carries:
            init = init + (zero3[:, 0] == 0.0,
                           state * 0 + jnp.arange(R, dtype=jnp.uint32))

        def bounce(carry, seg_index):
            if carries:
                o, d, thr, inc, alive, state, eok, slot = carry
            else:
                o, d, thr, inc, alive, state = carry
            if do_intersect:
                if via_intersect:
                    h = intersect_wrap(scene, o, d, t_min=1e-4,
                                       backend="pallas", alive=alive)
                else:
                    h = fused_intersect(scene, o, d, 1e-4, alive)
                active_hit = alive & h.hit
                point, normal, smooth = h.point, h.normal, h.smoothness
                albedo, emitted = h.albedo, h.emission * h.emission_strength[:, None]
            else:
                active_hit = alive & (o[:, 1] > -1e30)  # always true, cheap
                point, normal = o + d * 0.5, d * 0.3
                smooth = o[:, 0] * 0.0 + 0.3
                albedo, emitted = d * 0.2 + 0.5, zero3
            active_miss = alive & ~active_hit
            if do_scatter:
                state, new_dir, is_diel = materials.scatter(
                    state, d, normal, smooth, share_tile=share_tile)
                alb = jnp.where(is_diel[:, None], 1.0, albedo)
            else:
                new_dir, alb = -d, albedo
            if sum_t:
                # keep the intersection un-DCE'd without any shading math
                inc = inc + jnp.where(active_hit[:, None],
                                      point - o, 0.0)
            if do_radiance:
                inc = inc + jnp.where(active_hit[:, None], emitted * thr, 0.0)
                thr = jnp.where(active_hit[:, None], thr * alb, thr)
                if do_env:
                    inc = inc + jnp.where(active_miss[:, None],
                                          environment_light(d) * thr, 0.0)
            o = jnp.where(active_hit[:, None], point, o)
            d = jnp.where(active_hit[:, None], new_dir, d)
            if carries:
                return (o, d, thr, inc, active_hit, state, eok, slot), None
            return (o, d, thr, inc, active_hit, state), None

        if carries:
            out, _ = jax.lax.scan(
                bounce, init, jnp.arange(bounces + 1, dtype=jnp.int32))
        else:
            out, _ = jax.lax.scan(bounce, init, None, length=bounces + 1)
        return out[3]
    return fn


def main():
    open("/tmp/ab_trace.log", "w").close()
    specs = sys.argv[2:] or ["full", "nointersect", "noscatter", "noenv",
                             "intersectonly", "fullb1"]
    import os
    b = rt.SceneBuilder()
    load_model("/root/reference/assets/the_utah_teapot.glb", b,
               placement="origin", albedo=(0.7, 0.5, 0.3), smoothness=0.3,
               use_textures=os.environ.get("AB_TEX", "1") == "1")
    if os.environ.get("AB_LIGHT") == "1":
        # emissive sphere above the teapot so the NEE variants have a
        # light table to sample
        lo0, hi0 = b.bounds()
        c0, e0 = (lo0 + hi0) / 2, float(np.linalg.norm(hi0 - lo0))
        b.add_sphere(tuple(c0 + e0 * np.array([0.0, 0.9, 0.0])), e0 * 0.2,
                     albedo=(1, 1, 1), emission=(1, 1, 1),
                     emission_strength=5.0)
    lo, hi = b.bounds()
    scene = b.build()
    center, ext = (lo + hi) / 2, float(np.linalg.norm(hi - lo))

    W, H = 1920, 1080
    cam = rt.Camera(origin=tuple(center + ext * np.array([0.7, 0.4, 0.7])),
                    look_at=tuple(center), aspect=W / H, focus_dist=1.0)
    basis = camera_basis(cam)
    order, _ = _blocked_order(W, H)
    ids = jnp.asarray(order)
    st = sampling.seed_state(ids, 0)
    _, oc, dc = camera_rays(basis, ids % W, ids // W, (W, H), st)
    oc, dc, st = (jax.block_until_ready(x) for x in (oc, dc, st))
    log("rays ready")

    variants = {
        "full": make_variant(scene, 3),
        "fullcoh": make_variant(scene, 3, share_tile=128),
        "fullcoh512": make_variant(scene, 3, share_tile=512),
        "isumt": make_variant(scene, 3, do_scatter=False, do_env=False,
                              do_radiance=False, sum_t=True),
        "isumtcoh": make_variant(scene, 3, do_env=False, do_radiance=False,
                                 sum_t=True, share_tile=128),
        "fullcarry": make_variant(scene, 3, carries=True),
        "fullwrap": make_variant(scene, 3, via_intersect=True),
        "fullboth": make_variant(scene, 3, carries=True, via_intersect=True),
        "fullb1": make_variant(scene, 1),
        "nointersect": make_variant(scene, 3, do_intersect=False),
        "noscatter": make_variant(scene, 3, do_scatter=False),
        "noenv": make_variant(scene, 3, do_env=False),
        "intersectonly": make_variant(scene, 3, do_scatter=False,
                                      do_env=False, do_radiance=False),
        "realtrace": lambda o, d, s: trace(
            scene, o, d, s, rt.RenderParams(width=W, height=H, bounces=3,
                                            skybox=True,
                                            backend="pallas"))[1],
        # exact bench.py params (coherent_scatter on)
        "realcoh": lambda o, d, s: trace(
            scene, o, d, s, rt.RenderParams(width=W, height=H, bounces=3,
                                            skybox=True, backend="pallas",
                                            coherent_scatter=True))[1],
        # NEE on (needs AB_LIGHT=1 for a sampleable emitter)
        "realnee": lambda o, d, s: trace(
            scene, o, d, s, rt.RenderParams(width=W, height=H, bounces=3,
                                            skybox=True, backend="pallas",
                                            coherent_scatter=True,
                                            nee=True))[1],
        # the whole frame path (camera rays + trace + unblock), bench
        # params; frame index derived from the harness perturbation so
        # reps can't be hoisted
        "realframe": lambda o, d, s: __import__(
            "ray_tracer_tpu.renderer", fromlist=["render_frame"]
        ).render_frame(
            scene, basis, rt.RenderParams(width=W, height=H, bounces=3,
                                          skybox=True, backend="pallas",
                                          coherent_scatter=True),
            (o[0, 0] * 1e30).astype(jnp.int32)),
    }
    for spec in specs:
        timeit(spec, variants[spec], oc, dc, st)


if __name__ == "__main__":
    main()
