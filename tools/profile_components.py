"""Component-level on-device profiler.

Each component is wrapped in a lax.scan of REPS iterations inside ONE jit
dispatch, with a tiny scalar pulled at the end — the only reliable timing
method through the tunneled TPU backend (block_until_ready is a no-op there
and per-dispatch latency is 100s of ms).

Usage: python tools/profile_components.py [reps]
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
from ray_tracer_tpu.ops.intersect import hit_attributes
from ray_tracer_tpu.renderer import (_blocked_order, _ray_sort_key,
                                     _scene_aabb, render_pixels, trace)
from ray_tracer_tpu import camera_basis, sampling
from ray_tracer_tpu.camera import camera_rays

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W, H = 1920, 1080
R = W * H


def timeit(label, fn, *args):
    """fn(*args) -> pytree; time REPS on-device iterations in one dispatch."""

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
            # fold outputs into a scalar so nothing is dead-code-eliminated;
            # c makes iterations sequential
            s = sum(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                      x.astype(jnp.float32), 0.0))
                    for x in jax.tree_util.tree_leaves(out))
            return c + s * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        # scalar d2h pulls hang through the relay; array pulls don't
        return jnp.full((256, 256), acc)

    v = np.asarray(looped(*args))  # compile + run + sync (array pull)
    t0 = time.time()
    v = np.asarray(looped(*args))
    dt = (time.time() - t0) / REPS
    print(f"{label:42s} {dt*1e3:9.1f} ms/iter", flush=True)
    return dt


def main():
    print(f"device={jax.devices()[0]} R={R} reps={REPS}", flush=True)
    b = rt.SceneBuilder()
    load_model("/root/reference/assets/the_utah_teapot.glb", b,
               placement="origin", albedo=(0.7, 0.5, 0.3), smoothness=0.3)
    lo, hi = b.bounds()
    scene = b.build()
    center, ext = (lo + hi) / 2, float(np.linalg.norm(hi - lo))
    cam = rt.Camera(origin=tuple(center + ext * np.array([0.7, 0.4, 0.7])),
                    look_at=tuple(center), aspect=W / H, focus_dist=1.0)
    basis = camera_basis(cam)
    params = rt.RenderParams(width=W, height=H, bounces=3, skybox=True,
                             backend="pallas", compaction=False)

    order, inverse = _blocked_order(W, H)
    ids = jnp.asarray(order)
    state0 = sampling.seed_state(ids, 0)
    _, o, d = camera_rays(basis, ids % W, ids // W, (W, H), state0)
    o, d = jax.block_until_ready((o, d))
    key = jnp.arange(R, dtype=jnp.uint32)[::-1]
    payload = [o, d, o + 1.0, o * 0.5, state0, ids, (ids % 2 == 0)]

    from ray_tracer_tpu import materials
    from ray_tracer_tpu.envlight import environment_light
    from ray_tracer_tpu.ops.intersect import fused_intersect

    timeit("camera_rays+seed", lambda ids: camera_rays(
        basis, ids % W, ids // W, (W, H), sampling.seed_state(ids, 0)), ids)
    timeit("nearest_hit_pallas (primary rays)", lambda o, d:
           nearest_hit_pallas(scene, o, d), o, d)
    timeit("fused_intersect (attrs, primary)", lambda o, d:
           fused_intersect(scene, o, d, 1e-4, None), o, d)
    timeit("hit_attributes", lambda o, d: hit_attributes(
        scene, o, d, jnp.minimum(state0.astype(jnp.int32) % 15832, 15831),
        state0 % 2 == 0, 1e-4), o, d)
    timeit("materials.scatter", lambda d, n: materials.scatter(
        state0, d, n, jnp.full((R,), 0.3)), d, o * 0.5)
    timeit("materials.scatter coherent", lambda d, n: materials.scatter(
        state0, d, n, jnp.full((R,), 0.3), share_tile=128), d, o * 0.5)
    timeit("environment_light", lambda d: environment_light(d), d)
    timeit("argsort(2M keys)", lambda k: jnp.argsort(k), key)
    timeit("sortkey+argsort+permute x7", lambda o, d: [
        x[jnp.argsort(_ray_sort_key(lo, hi, o, d, ids % 2 == 0))]
        for x in payload], o, d)
    timeit("scatter radiance back", lambda o: jnp.zeros_like(o).at[ids].set(o), o)
    for b in (0, 1, 3):
        pb = params.replace(bounces=b)
        timeit(f"full trace (bounces={b})", lambda o, d, st, pb=pb: trace(
            scene, o, d, st, pb)[1], o, d, state0)
    pc = params.replace(coherent_scatter=True)
    timeit("full trace (b=3 coherent)", lambda o, d, st: trace(
        scene, o, d, st, pc)[1], o, d, state0)
    p2 = params.replace(compaction=True)
    timeit("full trace (compaction=True)", lambda o, d, st: trace(
        scene, o, d, st, p2)[1], o, d, state0)


if __name__ == "__main__":
    main()
