"""In-process A/B sweep of Pallas intersect-kernel configs on the chip.

Times ONLY the intersect call (not shading/renderer) on the 1080p-teapot
primary-ray workload under the on-device scan harness (REPS iterations per
launch, one tiny pull as sync — see docs/PERF_NOTES.md on why single-launch
timings lie through the relay).

Usage: python tools/ab_kernel.py [reps] [config ...]
  config grammar: "st4" (step_tiles=4), "rt256", "cl64" (cluster),
  "tr32" (tri_rows), "span"/"centerout"/"nocull"/"prepassonly",
  "attrs" (want_attrs path), joined by "+" e.g. "st8+attrs".
  Default sweep: baseline, st4, st8, prepassonly, nocull, baseline+attrs.
Writes progress to /tmp/ab_kernel.log.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import ray_tracer_tpu as rt
from ray_tracer_tpu.io import load_model
from ray_tracer_tpu.ops.pallas_intersect import (
    KConfig, nearest_hit_pallas, nearest_hit_attrs_pallas)
from ray_tracer_tpu.renderer import _blocked_order
from ray_tracer_tpu import camera_basis, sampling
from ray_tracer_tpu.camera import camera_rays

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
T0 = time.time()


def log(*a):
    msg = f"{time.time()-T0:7.1f} " + " ".join(map(str, a))
    print(msg, flush=True)
    with open("/tmp/ab_kernel.log", "a") as f:
        f.write(msg + "\n")


def parse(spec: str):
    cfg = KConfig()
    attrs = False
    for part in spec.split("+"):
        if part in ("span", "centerout", "nocull", "prepassonly"):
            cfg = cfg._replace(traversal=part)
        elif part == "attrs":
            attrs = True
        elif part.startswith("st"):
            cfg = cfg._replace(step_tiles=int(part[2:]))
        elif part.startswith("rt"):
            cfg = cfg._replace(rt=int(part[2:]))
        elif part.startswith("cl"):
            cfg = cfg._replace(cluster=int(part[2:]))
        elif part.startswith("tr"):
            cfg = cfg._replace(tri_rows=int(part[2:]))
        elif part in ("mxu", "vpu"):
            cfg = cfg._replace(mt=part)
        elif part.startswith("sup"):
            cfg = cfg._replace(supers=int(part[3:]))
        elif part.startswith("ex"):
            cfg = cfg._replace(extract=part[2:])
        elif part not in ("", "base"):
            raise ValueError(f"bad config part {part!r}")
    # tri_rows must divide cluster
    cfg = cfg._replace(tri_rows=min(cfg.tri_rows, cfg.cluster))
    return cfg, attrs


def timeit(label, fn, o, d, n_segments):
    @jax.jit
    def looped(o, d):
        def body(c, _):
            # perturb so XLA can't CSE identical iterations
            out = fn(o + c * 1e-30, d)
            s = sum(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                      x.astype(jnp.float32), 0.0))
                    for x in jax.tree_util.tree_leaves(out))
            return c + s * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=REPS)
        return jnp.full((8, 128), acc)

    log("compiling:", label)
    t0 = time.time()
    np.asarray(looped(o, d))
    log(f"  compile+first: {time.time()-t0:.1f} s")
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(looped(o, d))
        dt = min(dt, (time.time() - t0) / REPS)
    log(f"RESULT {label}: {dt*1e3:8.1f} ms  "
        f"{n_segments/dt/1e6:7.1f} M segs/s")
    return dt


def main():
    open("/tmp/ab_kernel.log", "w").close()
    specs = sys.argv[2:] or ["base", "st4", "st8", "prepassonly", "nocull",
                             "base+attrs"]
    b = rt.SceneBuilder()
    load_model("/root/reference/assets/the_utah_teapot.glb", b,
               placement="origin")
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
    oc, dc = jax.block_until_ready(oc), jax.block_until_ready(dc)
    log("camera rays built; scene tris:", scene.num_tris,
        "padded:", scene.padded_tris)

    R = oc.shape[0]

    if "bounce1" in " ".join(specs):
        # realistic bounce-1 wavefront: primary hits scattered diffusely
        from ray_tracer_tpu import materials
        from ray_tracer_tpu.ops.intersect import intersect
        h = intersect(scene, oc, dc, backend="pallas")
        _, d2, _ = materials.scatter(st, dc, h.normal, h.smoothness)
        _, d2c, _ = materials.scatter(st, dc, h.normal, h.smoothness,
                                      share_tile=128)
        o2 = jax.block_until_ready(h.point)
        alive2 = jax.block_until_ready(h.hit)
        d2, d2c = jax.block_until_ready(d2), jax.block_until_ready(d2c)
        live = int(np.asarray(alive2).sum())
        tiles = np.asarray(alive2).reshape(-1, 128).any(1).sum()
        log(f"bounce-1 rays: {live} live ({100*live/R:.1f}%), "
            f"{tiles} live tiles ({100*tiles/(R//128):.1f}%)")

    failures = 0
    for spec in specs:
        base_spec, _, mode = spec.partition("@")
        cfg, attrs = parse(base_spec)
        f = nearest_hit_attrs_pallas if attrs else nearest_hit_pallas
        if mode == "bounce1":
            args = (lambda o, d, f=f, cfg=cfg: f(
                scene, o, d, alive=alive2, cfg=cfg), o2, d2)
        elif mode == "bounce1c":   # coherent scatter directions
            args = (lambda o, d, f=f, cfg=cfg: f(
                scene, o, d, alive=alive2, cfg=cfg), o2, d2c)
        elif mode == "dead":       # fully dead wavefront (skip-cost floor)
            args = (lambda o, d, f=f, cfg=cfg: f(
                scene, o, d, alive=jnp.zeros((R,), bool), cfg=cfg), oc, dc)
        elif mode == "alivetrue":  # primary rays but with an alive mask given
            args = (lambda o, d, f=f, cfg=cfg: f(
                scene, o, d, alive=jnp.ones((R,), bool), cfg=cfg), oc, dc)
        else:
            args = (lambda o, d, f=f, cfg=cfg: f(scene, o, d, cfg=cfg),
                    oc, dc)
        try:
            timeit(spec, *args, R)
        except Exception as e:  # noqa: BLE001 — one bad variant (e.g. a
            # Mosaic lowering rejection) must not void the rest of the
            # sweep; the chip session re-runs only what's missing
            failures += 1
            log(f"FAILED {spec}: {type(e).__name__}: {str(e)[:300]}")
    if failures:
        log(f"{failures}/{len(specs)} specs failed")
        sys.exit(1)


if __name__ == "__main__":
    main()
