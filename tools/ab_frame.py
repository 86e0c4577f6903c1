"""Whole-frame A/B of KConfig env knobs: times render_progressive (the
bench fwd harness) under each RTT_* environment given on argv.

Usage: python tools/ab_frame.py [frames] "EXTRACT=sum" "EXTRACT=mxu" ...
Each spec is a comma-separated list of KConfig env suffixes (RTT_ prefix
added), e.g. "EXTRACT=mxu,SUPERS=16,CLUSTER=32". Empty spec = defaults.
The kernel config is read per-call (env_config), so specs apply without
re-importing; jit caches key on the KConfig, so each spec compiles its
own executable.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SPECS = sys.argv[2:] or ["EXTRACT=sum", "EXTRACT=mxu"]
T0 = time.time()


def log(*a):
    msg = f"{time.time()-T0:7.1f} " + " ".join(map(str, a))
    print(msg, flush=True)
    with open("/tmp/ab_frame.log", "a") as f:
        f.write(msg + "\n")


def main():
    open("/tmp/ab_frame.log", "w").close()
    from bench import build_workload
    from ray_tracer_tpu.renderer import camera_basis, render_progressive

    scene, cam, params = build_workload()
    basis = camera_basis(cam.replace(aspect=params.aspect))
    segs = (params.width * params.height * params.rays_per_pixel
            * (params.bounces + 1) * FRAMES)
    log(f"workload {params.width}x{params.height} frames={FRAMES}")

    # UNTIMED warm-up (r4): the first spec of a sweep used to measure
    # 15-40% slow (first-contact transfers / autotune / clock ramp) —
    # three r4 sweeps put the same defaults at 117.2, 176.5 and 140.3
    # ms/f when first, 99-103 when bracketed. Never compare spec #1 of a
    # cold sweep without this.
    try:
        np.asarray(render_progressive(scene, basis, params, FRAMES))
        np.asarray(render_progressive(scene, basis, params, FRAMES))
    except Exception as e:  # noqa: BLE001
        log(f"warm-up failed: {type(e).__name__}: {str(e)[:120]}")
    import jax as _jax
    _jax.clear_caches()
    log("warm-up done")

    for spec in SPECS:
        # Save prior values so finally can RESTORE them (a repeated knob
        # in one spec, or a pre-existing RTT_* var, must not corrupt the
        # env for later specs — ADVICE r3).
        saved = {}
        for part in spec.split(","):
            if not part:
                continue
            k, _, v = part.partition("=")
            k = "RTT_" + k
            if k not in saved:
                saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            t0 = time.time()
            img = np.asarray(render_progressive(scene, basis, params,
                                                FRAMES))
            assert np.isfinite(img).all()
            log(f"  {spec or 'defaults'}: compile+first {time.time()-t0:.1f} s")
            dt = float("inf")
            for _ in range(2):
                t0 = time.time()
                np.asarray(render_progressive(scene, basis, params, FRAMES))
                dt = min(dt, time.time() - t0)
            log(f"RESULT {spec or 'defaults'}: {dt/FRAMES*1e3:8.1f} ms/f  "
                f"{segs/dt/1e6:7.1f} M segs/s")
        except Exception as e:  # noqa: BLE001
            log(f"FAILED {spec}: {type(e).__name__}: {str(e)[:200]}")
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
            # env_config() is read at TRACE time: an unchanged jit cache
            # would silently reuse the previous spec's executable
            import jax
            jax.clear_caches()


if __name__ == "__main__":
    main()
