"""Benchmark entry for the driver: prints ONE JSON line.

Headline metric (BASELINE.md): rays/s/chip, forward, 1080p, teapot scene
(15,704 triangles from the reference's assets), brute-force intersection.
"rays" counts traced ray segments: width*height*rpp*(bounces+1) per frame —
the bounce-synchronous wavefront computes every segment, so this is the
work actually done.

vs_baseline: the reference publishes no numbers (BASELINE.json.published is
{}), so vs_baseline is reported against OUR round-1 jnp-oracle baseline on
the same workload (first recorded value, see BASELINE_RAYS_PER_S below).

Resilience (round-2 postmortem: BENCH_r02.json was rc=1 on a relay outage
that voided every number of the round): the measurement body runs in a
WORKER SUBPROCESS with a hard timeout — the tunneled TPU backend can both
raise (UNAVAILABLE) and silently hang (jax.devices() >300 s), and only a
process boundary guards against the hang. The worker writes each completed
section (fwd / fwd_bwd / parity / textured) to a partial-results file as it
finishes; the parent waits for the backend, restarts the worker on crash or
timeout resuming from the partial file, and ALWAYS prints one JSON line
with whatever completed, exiting 0. A lost section shows up in
detail.errors instead of killing the artifact.
"""

import json
import os
import subprocess
import sys
import time

# NOTE: do NOT enable JAX_COMPILATION_CACHE_DIR here. On the tunneled TPU
# backend the persistent cache's executable serialization stalls for ~2
# minutes per program and then writes nothing (measured: a trivial jit
# goes 2 s -> 128 s with the cache enabled).

# First PROPERLY-SYNCED number on this workload (round 1, pre-culling
# brute-force kernel, TPU v5e: 1.50 s/frame = 5.53M segments/s; an earlier
# 13.5M figure was measured with block_until_ready, which does not actually
# block through the tunneled backend). Later rounds divide by this.
BASELINE_RAYS_PER_S = 5_529_000.0


# ---------------------------------------------------------------------------
# Workloads
# ---------------------------------------------------------------------------

SMOKE = os.environ.get("BENCH_SMOKE") == "1"  # tiny CPU-runnable workload
# (run as BENCH_SMOKE=1 RTT_PLATFORM=cpu python bench.py — drives the real
# sections end-to-end without the chip; numbers are meaningless)


def build_workload(use_textures=False):
    import numpy as np
    import ray_tracer_tpu as rt
    from ray_tracer_tpu.io import load_model

    width, height = (256, 144) if SMOKE else (1920, 1080)
    params = rt.RenderParams(
        width=width, height=height, bounces=3, rays_per_pixel=1,
        skybox=True, backend="auto",
        chunk_pixels=0,
        # coherent path tracing: unbiased, same per-pixel variance (see
        # materials.scatter); keeps secondary-bounce kernel tiles
        # direction-coherent so cluster culling engages on all bounces.
        # coherent_tile=0: share per full cull tile (fastest; the
        # convergence tradeoff documented in RenderParams doesn't bind a
        # throughput benchmark)
        coherent_scatter=True, coherent_tile=0)

    teapot = "/root/reference/assets/the_utah_teapot.glb"
    b = rt.SceneBuilder()
    if os.path.exists(teapot):
        # use_textures=False is the reference-parity workload: the
        # reference's shader has no texture sampler (textures are dead
        # code, /root/reference/src/core/scene.rs:466) and the headline
        # measures intersection throughput. use_textures=True is the
        # BASELINE extension workload (fused in-kernel UV extraction +
        # quad-gather sampling), reported as its own section.
        load_model(teapot, b, placement="origin", albedo=(0.7, 0.5, 0.3),
                   smoothness=0.3, use_textures=use_textures)
        lo, hi = b.bounds()  # host-side: avoids a device→host pull
        scene = b.build()
        center = (lo + hi) / 2
        extent = float(np.linalg.norm(hi - lo))
        cam = rt.Camera(
            origin=tuple(center + extent * np.array([0.7, 0.4, 0.7])),
            look_at=tuple(center), aspect=params.aspect, focus_dist=1.0)
    else:  # fallback: room scene
        scene, cam = rt.builtin_scene("room", aspect=params.aspect)
    return scene, cam, params


def _fwd_throughput(scene, basis, params, frames):
    """Timed progressive forward render; returns (rays_per_s, dt, compile_s).

    One compiled program reused for warmup + timing; full image pull as
    the sync (block_until_ready is unreliable through tunneled TPU
    backends); min over trials rejects transient relay stalls. 32 frames
    per pull amortizes the constant ~0.7 s relay image transfer.
    """
    import numpy as np
    from ray_tracer_tpu.renderer import render_progressive

    t0 = time.time()
    img = np.asarray(render_progressive(scene, basis, params, frames))
    compile_s = time.time() - t0
    assert np.isfinite(img).all()
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    runs = []
    for _ in range(trials):
        t0 = time.time()
        np.asarray(render_progressive(scene, basis, params, frames))
        runs.append(time.time() - t0)
    dt = min(runs)
    segs = (params.width * params.height * params.rays_per_pixel
            * (params.bounces + 1) * frames)
    return segs / dt, dt, compile_s, runs


# ---------------------------------------------------------------------------
# Sections (worker side). Each takes/updates a shared ctx dict and returns
# a JSON-serializable result dict.
# ---------------------------------------------------------------------------

def _ctx_workload(ctx):
    if "workload" not in ctx:
        from ray_tracer_tpu.renderer import camera_basis
        scene, cam, params = build_workload()
        basis = camera_basis(cam.replace(aspect=params.aspect))
        ctx["workload"] = (scene, basis, params)
    return ctx["workload"]


def section_fwd(ctx):
    import jax
    scene, basis, params = _ctx_workload(ctx)
    frames = int(os.environ.get("BENCH_FRAMES", "2" if SMOKE else "32"))
    rays_per_s, dt, compile_s, runs = _fwd_throughput(scene, basis, params,
                                                      frames)
    spread = (max(runs) - min(runs)) / min(runs) if runs else 0.0
    print(f"# fwd {dt:.3f}s/{frames}f = {rays_per_s/1e6:.1f} M segs/s "
          f"(compile {compile_s:.1f}s, spread {spread*100:.1f}% over "
          f"{len(runs)} runs)", file=sys.stderr)
    return {
        "rays_per_s": round(rays_per_s, 1),
        "runs_s": [round(r, 3) for r in runs],
        "spread": round(spread, 4),
        "seconds": round(dt, 3), "frames": frames,
        "fps": round(frames / dt, 3), "compile_s": round(compile_s, 1),
        "resolution": f"{params.width}x{params.height}",
        "tris": scene.num_tris, "spheres": scene.num_spheres,
        "bounces": params.bounces, "rpp": params.rays_per_pixel,
        "backend": params.backend, "device": str(jax.devices()[0]),
    }


def section_fwd_bwd(ctx):
    """Forward+backward rays/s (BASELINE.md:36): time one fused-path
    gradient step — d/d(scene) of the image MSE against a fixed target —
    on the same 1080p teapot workload. Differentiates w.r.t. EVERY float
    scene leaf (vertices, normals, materials, textures) through the
    custom_vjp winner-recompute, i.e. a full inverse-rendering step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import jax.tree_util as jtu
    from ray_tracer_tpu.renderer import render_frame, render_pixels
    from ray_tracer_tpu.grad.inverse import chunked_mse_value_and_grad

    scene, basis, params = _ctx_workload(ctx)
    target = jax.lax.stop_gradient(
        render_frame(scene, basis, params, jnp.int32(1)))

    # differentiate w.r.t. the float leaves only (texture ids and the like
    # are int32 — jax.grad rejects integer inputs)
    leaves, treedef = jtu.tree_flatten(scene)
    is_f = [hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            for l in leaves]
    float_leaves = [l for l, m in zip(leaves, is_f) if m]

    # Whole-frame is the default since r4: the component-wise winner
    # recompute + SoA scatter VJP removed the lane-padded (R,·)/(R,26)
    # residual materializations that used to demand ~32 GB — the 1080p
    # whole-frame backward now runs in ~254 ms on v5e (vs 1.61 s/step for
    # the r3 8-chunk workaround). Chunking (BENCH_GRAD_CHUNKS>1) remains
    # for bigger frames/scenes.
    chunks = int(os.environ.get("BENCH_GRAD_CHUNKS", "1"))

    def merge(fl):
        it = iter(fl)
        return jtu.tree_unflatten(
            treedef, [next(it) if m else l for l, m in zip(leaves, is_f)])

    @jax.jit
    def grad_step(fl, frame):
        if chunks > 1:
            def rp(fl, ids):
                return render_pixels(merge(fl), basis, params, frame, ids)
            _, g = chunked_mse_value_and_grad(fl, rp, params, target, chunks)
            return g

        def loss_fn(fl):
            img = render_frame(merge(fl), basis, params, frame)
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss_fn)(fl)

    t0 = time.time()
    g = grad_step(float_leaves, jnp.int32(0))
    # pull one small leaf as the sync (full pytree pull is relay-slow)
    np.asarray(g[0])
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        g = grad_step(float_leaves, jnp.int32(0))
        np.asarray(g[0])
        dt = min(dt, time.time() - t0)
    segs = (params.width * params.height * params.rays_per_pixel
            * (params.bounces + 1))
    print(f"# fwd+bwd {dt:.3f}s/step (compile {compile_s:.1f}s) = "
          f"{segs/dt/1e6:.1f} M segs/s", file=sys.stderr)
    return {"rays_per_s": round(segs / dt, 1), "s_per_step": round(dt, 3),
            "compile_s": round(compile_s, 1)}


def section_parity(ctx):
    """On-device correctness evidence (VERDICT r1 #3): compiled Pallas vs
    jnp oracle, on the chip this benchmark runs on — a room frame (spheres
    + tris + dielectric + emissive) and a textured teapot slice (fused
    24-row extraction + quad-gather sampling). Reports the fraction of
    pixels beyond tolerance; the assert makes a silent Mosaic/interpret
    divergence fail the section. A >0 but tiny fraction is expected: an
    ulp-level fma difference at a silhouette pixel flips a winner tie or
    a scatter direction and the bounce chain diverges chaotically
    (measured: 1 pixel in 9216, with 0 primary-ray id mismatches and
    attrs equal to 3e-6 — see docs/PERF_NOTES.md)."""
    import numpy as np
    import jax.numpy as jnp
    import ray_tracer_tpu as rt
    from ray_tracer_tpu.io import load_model
    from ray_tracer_tpu.renderer import camera_basis, render_frame

    out = {}
    scene, cam = rt.builtin_scene("room", aspect=1.0)
    basis = camera_basis(cam)

    def frac_off(a, b, tol=2e-2):
        return float((np.abs(a - b).max(-1) > tol).mean())

    p = rt.RenderParams(width=128, height=128, bounces=3, skybox=True)
    a = np.asarray(render_frame(scene, basis, p.replace(backend="jnp"),
                                jnp.int32(0)))
    b = np.asarray(render_frame(scene, basis, p.replace(backend="pallas"),
                                jnp.int32(0)))
    out["room_128_frac_off"] = frac_off(a, b)

    teapot = "/root/reference/assets/the_utah_teapot.glb"
    if os.path.exists(teapot):
        bld = rt.SceneBuilder()
        load_model(teapot, bld, placement="origin", smoothness=0.3)
        lo, hi = bld.bounds()
        s2 = bld.build()
        center = (lo + hi) / 2
        ext = float(np.linalg.norm(hi - lo))
        cam2 = rt.Camera(origin=tuple(center + ext * np.array([0.7, 0.4, 0.7])),
                         look_at=tuple(center), aspect=1.0, focus_dist=1.0)
        b2 = camera_basis(cam2)
        p2 = rt.RenderParams(width=96, height=96, bounces=1, skybox=True)
        a = np.asarray(render_frame(s2, b2, p2.replace(backend="jnp"),
                                    jnp.int32(0)))
        bb = np.asarray(render_frame(s2, b2, p2.replace(backend="pallas"),
                                     jnp.int32(0)))
        out["teapot_tex_96_frac_off"] = frac_off(a, bb)

        # deterministic primary-ray check (no chaotic bounce chain):
        # compiled winner ids + fused attrs vs the jnp oracle
        from ray_tracer_tpu.renderer import _blocked_order
        from ray_tracer_tpu import sampling
        from ray_tracer_tpu.camera import camera_rays
        from ray_tracer_tpu.ops.intersect import (fused_intersect,
                                                  nearest_hit_jnp,
                                                  hit_attributes)
        order, _ = _blocked_order(96, 96)
        pids = jnp.asarray(order)
        st = sampling.seed_state(pids, 0)
        _, o, d = camera_rays(b2, pids % 96, pids // 96, (96, 96), st)
        t_ref, id_ref = nearest_hit_jnp(s2, o, d, 1e-4)
        fused = fused_intersect(s2, o, d, 1e-4, None)
        ref = hit_attributes(s2, o, d, id_ref, jnp.isinf(t_ref), 1e-4)
        mism = int(((np.asarray(fused.prim_id) != np.asarray(id_ref))
                    & np.asarray(fused.hit)).sum())
        out["teapot_primary_id_mismatches"] = mism
        same = np.asarray(fused.hit) & (np.asarray(fused.prim_id)
                                        == np.asarray(id_ref))
        out["teapot_primary_attr_max_abs_diff"] = float(max(
            np.abs(np.asarray(fused.albedo)
                   - np.asarray(ref.albedo))[same].max(),
            np.abs(np.asarray(fused.normal)
                   - np.asarray(ref.normal))[same].max()))

    for k, v in out.items():
        if k.endswith("frac_off"):
            assert v < 2e-3, f"pallas/jnp divergence on device: {k}={v}"
    assert out.get("teapot_primary_id_mismatches", 0) <= 2
    assert out.get("teapot_primary_attr_max_abs_diff", 0.0) < 1e-3
    print(f"# parity {out}", file=sys.stderr)
    return out


def section_textured(ctx):
    """Textured-path throughput (VERDICT r2 #7): same 1080p teapot frame
    with UV/texture sampling live (fused in-kernel UV extraction +
    quad-gather fetch) — the BASELINE extension workload the untextured
    headline hides."""
    from ray_tracer_tpu.renderer import camera_basis
    scene, cam, params = build_workload(use_textures=True)
    basis = camera_basis(cam.replace(aspect=params.aspect))
    frames = int(os.environ.get("BENCH_FRAMES_TEX", "2" if SMOKE else "16"))
    rays_per_s, dt, compile_s, _ = _fwd_throughput(scene, basis, params,
                                                   frames)
    print(f"# textured fwd {dt:.3f}s/{frames}f = {rays_per_s/1e6:.1f} "
          f"M segs/s (compile {compile_s:.1f}s)", file=sys.stderr)
    return {"rays_per_s": round(rays_per_s, 1), "seconds": round(dt, 3),
            "frames": frames, "compile_s": round(compile_s, 1)}


SECTIONS = [
    ("fwd", section_fwd),
    ("fwd_bwd", section_fwd_bwd),
    ("parity", section_parity),
    ("textured", section_textured),
]


# ---------------------------------------------------------------------------
# Worker: run sections with in-process retry, persist after each.
# ---------------------------------------------------------------------------

def _load_partial(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_partial(path, results):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f)
    os.replace(tmp, path)


def worker_main(path):
    from ray_tracer_tpu.utils.retry import retry_transient, is_transient
    results = _load_partial(path)
    ctx = {}
    for name, fn in SECTIONS:
        if name in results:
            continue
        try:
            results[name] = retry_transient(
                lambda fn=fn: fn(ctx), retries=3, base_delay=10.0,
                max_delay=120.0)
            results.setdefault("errors", {}).pop(name, None)
        except BaseException as exc:  # noqa: BLE001 — recorded, not hidden
            results.setdefault("errors", {})[name] = (
                type(exc).__name__ + ": "
                + (str(exc).splitlines() or ["?"])[0][:280])
            _save_partial(path, results)
            if is_transient(exc):
                # give the parent a fresh process (fresh backend init)
                sys.exit(3)
            continue  # real bug in one section shouldn't kill the rest
        _save_partial(path, results)
    sys.exit(0)


# ---------------------------------------------------------------------------
# Parent: wait for backend, run worker under a hard timeout, compose.
# ---------------------------------------------------------------------------

# honors RTT_PLATFORM the same way the package __init__ does, so a smoke/
# CPU run probes the backend it will actually use
_PROBE_SRC = ("import os, jax; p = os.environ.get('RTT_PLATFORM'); "
              "p and jax.config.update('jax_platforms', p); "
              "jax.devices(); import jax.numpy as jnp; "
              "import numpy as np; "
              "assert np.asarray(jnp.ones((8,)) + 1)[0] == 2.0")


def _backend_up(timeout=150):
    try:
        return subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], timeout=timeout,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_backend(deadline):
    """Probe (in a subprocess — the relay can HANG, not just raise) until
    the backend answers or the deadline passes."""
    first = True
    while time.time() < deadline:
        budget = min(150, max(10, deadline - time.time()))
        if _backend_up(timeout=budget):
            return True
        if first:
            print("# backend down; waiting for relay...", file=sys.stderr)
            first = False
        time.sleep(min(30, max(1, deadline - time.time())))
    return False


def _run_worker(path, timeout):
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", path],
        stdout=sys.stderr, stderr=sys.stderr,
        start_new_session=True)  # own pgid: kill the whole tree on timeout
    try:
        return proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"# worker hung past {timeout:.0f}s; killing", file=sys.stderr)
        try:
            import signal
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            proc.kill()
        proc.wait()
        return -9


def compose(results):
    fwd = results.get("fwd", {})
    fb = results.get("fwd_bwd", {})
    tex = results.get("textured", {})
    rays_per_s = fwd.get("rays_per_s", 0.0)
    detail = dict(fwd)
    detail.pop("rays_per_s", None)
    if fb:
        detail["fwd_bwd_rays_per_s"] = fb["rays_per_s"]
        detail["fwd_bwd_s_per_step"] = fb["s_per_step"]
        detail["fwd_bwd_compile_s"] = fb["compile_s"]
    if "parity" in results:
        detail["on_device_parity_max_abs_diff"] = results["parity"]
    if tex:
        detail["textured_rays_per_s"] = tex["rays_per_s"]
        detail["textured_frames"] = tex["frames"]
        detail["textured_compile_s"] = tex["compile_s"]
    if results.get("errors"):
        detail["errors"] = results["errors"]
    # the parity section is the headline's correctness gate: if it FAILED
    # (an assertion — the compiled kernel diverged from the oracle on this
    # chip), the fwd number measures a broken kernel and must not be
    # published as the headline. A parity section lost to a relay outage
    # (transient error) degrades the evidence but doesn't invalidate it.
    parity_err = results.get("errors", {}).get("parity", "")
    if parity_err.startswith("AssertionError"):
        detail["parity_gate"] = ("FAILED — headline withheld; fwd numbers "
                                 "kept in detail for diagnosis")
        detail["fwd_rays_per_s_unverified"] = rays_per_s
        rays_per_s = 0.0
    return {
        "metric": "rays/s/chip fwd 1080p teapot (brute force)",
        "value": rays_per_s,
        "unit": "ray segments/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
        "detail": detail,
    }


def main():
    # stop any dev-time availability prober: two programs sharing the chip
    # corrupt each other's timings (measured 939 vs 345 ms in round 2)
    try:
        with open("/tmp/stop_probe", "w"):
            pass
    except OSError:
        pass

    deadline = time.time() + float(
        os.environ.get("BENCH_TOTAL_DEADLINE_S", "3600"))
    path = f"/tmp/rtt_bench_partial_{os.getpid()}.json"

    # If the CALLER's timeout fires while we are still waiting for the
    # relay or mid-measurement, emit the artifact from whatever completed
    # instead of dying silently — the one JSON line must always land.
    import signal

    def _emit_and_exit(signum, frame):
        results = _load_partial(path)
        results.setdefault("errors", {})["signal"] = (
            f"killed by signal {signum} before completion")
        print(json.dumps(compose(results)), flush=True)
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, _emit_and_exit)
        except (OSError, ValueError):
            pass
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "2100"))
    max_attempts = int(os.environ.get("BENCH_ATTEMPTS", "4"))

    if not _wait_backend(deadline):
        results = {"errors": {"backend": "axon backend unreachable for the "
                              "whole BENCH_TOTAL_DEADLINE_S window"}}
        print(json.dumps(compose(results)))
        return

    for attempt in range(max_attempts):
        results = _load_partial(path)
        if all(name in results for name, _ in SECTIONS):
            break
        budget = deadline - time.time()
        if budget < 60:
            break
        rc = _run_worker(path, min(attempt_timeout, budget))
        if rc == 0:
            break
        print(f"# worker attempt {attempt + 1} rc={rc}; "
              "waiting for backend before resume", file=sys.stderr)
        if not _wait_backend(deadline):
            break

    print(json.dumps(compose(_load_partial(path))))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker_main(sys.argv[2])
    else:
        main()
