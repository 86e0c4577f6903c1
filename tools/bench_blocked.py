"""Benchmark the streaming (tri-blocked) kernel on scenes past the VMEM cap.

The resident kernel tops out around ~24k padded triangles (12 MB of
lane-padded planes); this renders a teapot field + procedural heightfield
terrain well past that and measures trace throughput per tri_block size.

Usage: python tools/bench_blocked.py [reps] [n_teapots] [terrain_n]
Writes progress to /tmp/bench_blocked.log.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import ray_tracer_tpu as rt
from ray_tracer_tpu import camera_basis, sampling
from ray_tracer_tpu.camera import camera_rays
from ray_tracer_tpu.io import load_model
from ray_tracer_tpu.ops.pallas_intersect import KConfig, _use_blocked, env_config
from ray_tracer_tpu.renderer import _blocked_order, trace

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_TEAPOTS = int(sys.argv[2]) if len(sys.argv) > 2 else 9
TERRAIN_N = int(sys.argv[3]) if len(sys.argv) > 3 else 160
T0 = time.time()


def log(*a):
    msg = f"{time.time()-T0:7.1f} " + " ".join(map(str, a))
    print(msg, flush=True)
    with open("/tmp/bench_blocked.log", "a") as f:
        f.write(msg + "\n")


def heightfield(n, extent, y0, rng):
    """(n-1)^2 * 2 smooth terrain triangles over [-extent, extent]^2."""
    xs = np.linspace(-extent, extent, n)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    h = np.zeros_like(gx)
    for _ in range(6):  # a few random cosine waves
        kx, kz = rng.normal(size=2) * (2.5 / extent)
        h += rng.random() * np.cos(kx * gx + kz * gz + rng.random() * 6.28)
    h = y0 + h * (extent * 0.02)
    verts = np.stack([gx, h, gz], -1).reshape(-1, 3)
    # vertex normals via central differences
    dhdx = np.gradient(h, xs, axis=0)
    dhdz = np.gradient(h, xs, axis=1)
    nrm = np.stack([-dhdx, np.ones_like(h), -dhdz], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    normals = nrm.reshape(-1, 3)
    i = np.arange(n * n).reshape(n, n)
    a, b, c, d = (i[:-1, :-1].ravel(), i[1:, :-1].ravel(),
                  i[:-1, 1:].ravel(), i[1:, 1:].ravel())
    idx = np.concatenate([np.stack([a, b, c], -1),
                          np.stack([b, d, c], -1)]).reshape(-1)
    return verts, normals, idx


def build_scene():
    rng = np.random.default_rng(0)
    b = rt.SceneBuilder()
    # teapot instances on a grid (the loader bakes the placement in)
    side = int(np.ceil(np.sqrt(N_TEAPOTS)))
    for k in range(N_TEAPOTS):
        gx, gz = k % side, k // side
        before = len(b.tris)
        load_model("/root/reference/assets/the_utah_teapot.glb", b,
                   placement="origin", use_textures=False,
                   albedo=tuple(0.3 + 0.6 * rng.random(3)),
                   smoothness=float(rng.random() * 0.6))
        # offset the just-added instance by translating its vertices
        off = np.array([(gx - side / 2) * 3.2, 0.0, (gz - side / 2) * 3.2],
                       np.float32)
        for rec in b.tris[before:]:
            for key in ("v0", "v1", "v2"):
                rec[key] = rec[key] + off
    lo, hi = b.bounds()
    v, n, i = heightfield(TERRAIN_N, float(hi[0] - lo[0]) * 0.75,
                          float(lo[1]) - 0.1, rng)
    b.add_mesh(v, n, i, albedo=(0.35, 0.55, 0.3), smoothness=0.05)
    return b


def main():
    open("/tmp/bench_blocked.log", "w").close()
    b = build_scene()
    lo, hi = b.bounds()
    scene = b.build()
    assert _use_blocked(scene, env_config()), \
        f"scene too small to exercise the blocked path: {scene.padded_tris}"
    log(f"tris={scene.num_tris} padded={scene.padded_tris} "
        f"planes={scene.padded_tris * 512 / 1e6:.0f} MB lane-padded")

    W, H = 1920, 1080
    center = (lo + hi) / 2
    ext = float(np.linalg.norm(hi - lo))
    cam = rt.Camera(origin=tuple(center + ext * np.array([0.45, 0.35, 0.45])),
                    look_at=tuple(center), aspect=W / H, focus_dist=1.0)
    basis = camera_basis(cam)
    order, _ = _blocked_order(W, H)
    ids = jnp.asarray(order)
    st = sampling.seed_state(ids, 0)
    _, oc, dc = camera_rays(basis, ids % W, ids // W, (W, H), st)
    oc, dc, st = (jax.block_until_ready(x) for x in (oc, dc, st))
    log("rays ready")

    params = rt.RenderParams(width=W, height=H, bounces=3, skybox=True,
                             backend="pallas", coherent_scatter=True)
    segs = W * H * (params.bounces + 1)

    # argv[4]: comma-separated specs. Each spec is "+"-joined parts:
    # a bare int (tri_block), "nolists", or KEY=VAL (RTT_ env knob, e.g.
    # "16384+BLOCKED_STEP=16384+SUPERS=16+CLUSTER=64"). Legacy ":nolists"
    # suffix still accepted.
    import os
    knob_keys = ("RTT_TRI_BLOCK", "RTT_BLOCK_LISTS", "RTT_BLOCKED_STEP",
                 "RTT_SUPERS", "RTT_CLUSTER", "RTT_TRI_ROWS", "RTT_RT",
                 "RTT_BLOCK_ORDER", "RTT_MT", "RTT_EXTRACT",
                 "RTT_VMEM_LIMIT", "RTT_VMEM_BUDGET", "RTT_BLOCKED")
    saved_env = {k: os.environ.get(k) for k in knob_keys}
    for spec in (sys.argv[4].split(",") if len(sys.argv) > 4
                 else ("4096", "8192")):
        for k, old in saved_env.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
        legacy, _, flag = spec.partition(":")
        if flag == "nolists":
            os.environ["RTT_BLOCK_LISTS"] = "0"
        for part in legacy.split("+"):
            if not part:
                continue
            if part == "nolists":
                os.environ["RTT_BLOCK_LISTS"] = "0"
            elif "=" in part:
                k, _, v = part.partition("=")
                os.environ["RTT_" + k] = v
            else:
                os.environ["RTT_TRI_BLOCK"] = str(int(part))
        try:
            @jax.jit
            def looped(o, d, s):
                def body(c, _):
                    _, inc = trace(scene, o + c * 1e-30, d, s, params)
                    return c + jnp.sum(inc) * 1e-30, None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=REPS)
                return jnp.full((8, 128), acc)

            log(f"compiling {spec}")
            t0 = time.time()
            out = np.asarray(looped(oc, dc, st))
            assert np.isfinite(out).all()
            log(f"  compile+first {time.time()-t0:.1f} s")
            dt = float("inf")
            for _ in range(2):
                t0 = time.time()
                np.asarray(looped(oc, dc, st))
                dt = min(dt, (time.time() - t0) / REPS)
            log(f"RESULT {spec}: {dt*1e3:8.1f} ms/frame "
                f"{segs/dt/1e6:6.1f} M segs/s")
        finally:
            for k, old in saved_env.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old


if __name__ == "__main__":
    main()
