"""Kernel-level benchmark with staged logging (relay-hang diagnosable).

Usage: python tools/bench_kernel.py [reps]
Writes progress to /tmp/bench_kernel.log as it goes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import ray_tracer_tpu as rt
from ray_tracer_tpu.io import load_model
from ray_tracer_tpu.ops.pallas_intersect import nearest_hit_pallas
from ray_tracer_tpu.ops.intersect import nearest_hit_jnp
from ray_tracer_tpu.renderer import _blocked_order
from ray_tracer_tpu import camera_basis, sampling
from ray_tracer_tpu.camera import camera_rays

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
T0 = time.time()


def log(*a):
    msg = f"{time.time()-T0:7.1f} " + " ".join(map(str, a))
    print(msg, flush=True)
    with open("/tmp/bench_kernel.log", "a") as f:
        f.write(msg + "\n")


def timeit(label, fn, *args):
    @jax.jit
    def looped(*a):
        def body(c, _):
            # perturb the first float arg by the carry so XLA cannot hoist
            # the body out of the scan (identical-input iterations get CSE'd
            # and the timing under-reports by a factor of REPS)
            a2 = list(a)
            for i, x in enumerate(a2):
                if hasattr(x, "dtype") and x.dtype == jnp.float32:
                    a2[i] = x + c * 1e-30
                    break
            out = fn(*a2)
            s = sum(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                      x.astype(jnp.float32), 0.0))
                    for x in jax.tree_util.tree_leaves(out))
            return c + s * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=REPS)
        return jnp.full((256, 256), acc)

    log("compiling:", label)
    np.asarray(looped(*args))
    log("timing:", label)
    t0 = time.time()
    np.asarray(looped(*args))
    dt = (time.time() - t0) / REPS
    log(f"RESULT {label}: {dt*1e3:.1f} ms")


def main():
    open("/tmp/bench_kernel.log", "w").close()
    b = rt.SceneBuilder()
    load_model("/root/reference/assets/the_utah_teapot.glb", b,
               placement="origin")
    lo, hi = b.bounds()
    scene = b.build()
    center, ext = (lo + hi) / 2, float(np.linalg.norm(hi - lo))
    R = 2073600
    rng = np.random.default_rng(0)
    o = jnp.asarray(center + np.array([0, 0, 3 * ext])
                    + rng.normal(size=(R, 3)) * 0.01 * ext, jnp.float32)
    d_away = jnp.asarray(np.tile([[0., 0., 1.]], (R, 1)), jnp.float32)
    d_at = jnp.asarray(center - np.asarray(o)
                       + rng.normal(size=(R, 3)) * 0.02 * ext, jnp.float32)
    log("scene + rays built")

    o5, d5 = o[:512], d_at[:512]
    tp, _ = nearest_hit_pallas(scene, o5, d5)
    tj, _ = nearest_hit_jnp(scene, o5, d5, 1e-4)
    tp, tj = np.asarray(tp), np.asarray(tj)
    ok = ((np.isfinite(tp) == np.isfinite(tj)).all()
          and np.allclose(tp[np.isfinite(tp)], tj[np.isfinite(tj)], rtol=3e-4))
    log("correctness vs oracle:", ok)
    assert ok

    W, H = 1920, 1080
    cam = rt.Camera(origin=tuple(center + ext * np.array([0.7, 0.4, 0.7])),
                    look_at=tuple(center), aspect=W / H, focus_dist=1.0)
    basis = camera_basis(cam)
    order, _ = _blocked_order(W, H)
    ids = jnp.asarray(order)
    st = sampling.seed_state(ids, 0)
    _, oc, dc = camera_rays(basis, ids % W, ids // W, (W, H), st)
    log("camera rays built")

    timeit("miss-all", lambda o, d: nearest_hit_pallas(scene, o, d), o, d_away)
    timeit("aimed-cone", lambda o, d: nearest_hit_pallas(scene, o, d), o, d_at)
    timeit("real-primary-blocked", lambda o, d: nearest_hit_pallas(scene, o, d),
           oc, dc)


if __name__ == "__main__":
    main()
