"""Scaling-efficiency harness: rays/s vs device count (BASELINE ≥90%).

Runs the sharded renderer over 1..N-device meshes and reports strong- and
weak-scaling tables. On this rig only ONE real TPU chip is reachable, so
the harness's own numbers come from the virtual 8-device CPU mesh
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count) — they validate
the HARNESS (sharding correctness + the efficiency math), not TPU silicon;
point it at a pod slice to produce the real table.

Usage:
    RTT_SCALING_CPU=1 python tools/scaling_bench.py [reps] [width height]
Prints one JSON line per row plus a final summary line.
"""

import json
import os
import sys
import time

if os.environ.get("RTT_SCALING_CPU", "1") == "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax

if os.environ.get("RTT_SCALING_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import ray_tracer_tpu as rt
from ray_tracer_tpu import camera_basis
from ray_tracer_tpu.parallel.mesh import make_mesh
from ray_tracer_tpu.parallel.shard import render_frame_distributed

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
H = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def time_mesh(scene, basis, params, n_dev, frames=REPS):
    mesh = make_mesh(n_dev)
    img = np.asarray(render_frame_distributed(scene, basis, params, 0, mesh))
    assert np.isfinite(img).all()
    t0 = time.time()
    for f in range(frames):
        img = np.asarray(
            render_frame_distributed(scene, basis, params, f, mesh))
    dt = (time.time() - t0) / frames
    segs = params.width * params.height * params.rays_per_pixel \
        * (params.bounces + 1)
    return segs / dt, img


def main():
    n_devices = len(jax.devices())
    scene, cam = rt.builtin_scene("room", aspect=W / H)

    rows = []
    base = None
    base_img = None
    for n in [n for n in (1, 2, 4, 8, n_devices) if n <= n_devices]:
        if any(r["devices"] == n for r in rows):
            continue
        # strong scaling: fixed total work
        params = rt.RenderParams(width=W, height=H, bounces=3, skybox=False,
                                 backend="jnp", chunk_pixels=0)
        strong, img = time_mesh(scene, camera_basis(
            cam.replace(aspect=params.aspect)), params, n)
        # weak scaling: fixed per-device work (height grows with n)
        wp = rt.RenderParams(width=W, height=H * n, bounces=3, skybox=False,
                             backend="jnp", chunk_pixels=0)
        weak, _ = time_mesh(scene, camera_basis(
            cam.replace(aspect=wp.aspect)), wp, n)
        if base is None:
            base, base_img = strong, img
        else:
            np.testing.assert_allclose(img, base_img, rtol=1e-5, atol=1e-6)
        row = {
            "devices": n,
            "strong_rays_per_s": round(strong, 1),
            "strong_efficiency": round(strong / (base * n), 3),
            "weak_rays_per_s": round(weak, 1),
            "weak_efficiency": round(weak / (base * n), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "scaling efficiency (virtual mesh)" if os.environ.get(
            "RTT_SCALING_CPU", "1") == "1" else "scaling efficiency",
        "platform": jax.devices()[0].platform,
        "resolution": f"{W}x{H}",
        "rows": rows,
        "note": ("CPU harness validation: per-device tiles verified "
                 "identical across mesh sizes; efficiency numbers are only "
                 "meaningful on a real pod slice"),
    }))


if __name__ == "__main__":
    main()
