"""Backward-pass cost breakdown on the bench workload (solo ablations).

Each timing is a separate jitted program run sequentially (never
concurrently — relay timing rule), synced by pulling ONE small output
leaf. Run pieces selectively via PROF_ONLY=name1,name2.

Pieces:
  fwd          plain forward frame (reference point)
  grad_full    the bench grad step (d/d all float scene leaves)
  grad_noscene backward with scene cotangents severed (rays-only chain
               through the bounce scan) — isolates the hit_attributes
               scene-grad (gather-replay + scatter-add) cost
  scatter_t    isolated XLA scatter-add of (R,26) rows into (T,26) x4 bounces
  scatter_mxu  same workload through the MXU one-hot scatter kernel
  gather_t     isolated gather of (T,26) rows at winner ids x4 bounces
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, sync, trials=3):
    t0 = time.time()
    sync(fn())
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(trials):
        t0 = time.time()
        sync(fn())
        dt = min(dt, time.time() - t0)
    print(f"{name:14s} {dt*1e3:8.1f} ms  (compile+first {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from bench import build_workload
    from ray_tracer_tpu.renderer import camera_basis, render_frame

    only = os.environ.get("PROF_ONLY", "").split(",") if \
        os.environ.get("PROF_ONLY") else None

    scene, cam, params = build_workload()
    basis = camera_basis(cam.replace(aspect=params.aspect))
    R = params.width * params.height
    T = scene.padded_tris
    S = scene.padded_spheres
    print(f"R={R} T={T} S={S} bounces={params.bounces}", flush=True)

    leaves, treedef = jtu.tree_flatten(scene)
    is_f = [hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            for l in leaves]
    float_leaves = [l for l, m in zip(leaves, is_f) if m]

    def run(name, fn, sync):
        if only is None or name in only:
            try:
                return timed(name, fn, sync)
            except Exception as e:  # noqa: BLE001 — e.g. grad_full OOMs
                # on real HBM (32 GB demand, measured r3); the remaining
                # pieces are exactly what diagnoses it
                print(f"{name:14s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    # --- forward reference point ------------------------------------------
    fwd = jax.jit(lambda: render_frame(scene, basis, params, jnp.int32(0)))
    run("fwd", fwd, lambda im: np.asarray(im[0, 0]))

    # --- full grad (the bench's step) --------------------------------------
    target = jax.block_until_ready(
        jax.jit(lambda: render_frame(scene, basis, params, jnp.int32(1)))())

    @jax.jit
    def grad_full():
        def loss_fn(fl):
            it = iter(fl)
            merged = [next(it) if m else l for l, m in zip(leaves, is_f)]
            img = render_frame(jtu.tree_unflatten(treedef, merged), basis,
                               params, jnp.int32(0))
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss_fn)(float_leaves)

    run("grad_full", grad_full, lambda g: np.asarray(g[0].ravel()[0]))

    # --- pixel-chunked grad (the production config: whole-frame 1080p
    # backward OOMs at ~32 GB from lane-padded (R,·) residuals; 8 chunks
    # bound it to ~4 GB — see grad.inverse.chunked_mse_value_and_grad)
    from ray_tracer_tpu.grad.inverse import chunked_mse_value_and_grad
    from ray_tracer_tpu.renderer import render_pixels

    for ch in (4, 8, 16):
        @jax.jit
        def grad_chunked(ch=ch):
            def rp(fl, ids):
                it = iter(fl)
                merged = [next(it) if m else l for l, m in zip(leaves, is_f)]
                return render_pixels(jtu.tree_unflatten(treedef, merged),
                                     basis, params, jnp.int32(0), ids)
            _, g = chunked_mse_value_and_grad(float_leaves, rp, params,
                                              target, ch)
            return g

        run(f"grad_chunked{ch}", grad_chunked,
            lambda g: np.asarray(g[0].ravel()[0]))

    # --- single-chunk ablations: where does the backward's time go? ------
    # One 259200-ray chunk (1/8 of the frame) is small enough to compile
    # in every severed configuration; scale by 8 for the frame cost.
    from ray_tracer_tpu.renderer import _blocked_order

    order_np, _ = _blocked_order(params.width, params.height)
    Rc = R // 8
    ids_c = jnp.asarray(order_np[:Rc].astype(np.int32))
    tgt_c = target.reshape(R, 3)[jnp.asarray(order_np.astype(np.int32))][:Rc]

    def chunk_loss_params(p):
        def loss_fn(fl):
            it = iter(fl)
            merged = [next(it) if m else l for l, m in zip(leaves, is_f)]
            rad = render_pixels(jtu.tree_unflatten(treedef, merged),
                                basis, p, jnp.int32(0), ids_c)
            return jnp.sum((rad - tgt_c) ** 2) / jnp.float32(R * 3)
        return loss_fn

    run("chunk_fwd",
        jax.jit(lambda: render_pixels(scene, basis, params, jnp.int32(0),
                                      ids_c)),
        lambda r: np.asarray(r[0, 0]))
    run("chunk_grad",
        jax.jit(lambda: jax.grad(chunk_loss_params(params))(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))
    run("chunk_grad_remat",
        jax.jit(lambda: jax.grad(chunk_loss_params(
            params.replace(remat=True)))(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))
    run("chunk_grad_nocoh",
        jax.jit(lambda: jax.grad(chunk_loss_params(
            params.replace(coherent_scatter=False)))(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))

    # bounce sweep: is the backward's cost per-bounce machinery?
    for nb in (0, 1, 2):
        run(f"chunk_grad_b{nb}",
            jax.jit(lambda nb=nb: jax.grad(chunk_loss_params(
                params.replace(bounces=nb)))(float_leaves)),
            lambda g: np.asarray(g[0].ravel()[0]))

    # albedo-only: severs the geometry cotangents through the
    # hit-attribute barycentric recompute (rows 0:9) and the ray chain
    def loss_alb(alb):
        import dataclasses as _dc
        s2 = _dc.replace(scene, tri_albedo=alb)
        rad = render_pixels(s2, basis, params, jnp.int32(0), ids_c)
        return jnp.sum((rad - tgt_c) ** 2) / jnp.float32(R * 3)

    run("chunk_grad_albonly",
        jax.jit(lambda: jax.grad(loss_alb)(scene.tri_albedo)),
        lambda g: np.asarray(g.ravel()[0]))

    # op-level isolation at chunk size: which op owns the ~50 ms/bounce?
    from ray_tracer_tpu.ops.intersect import fused_intersect
    from ray_tracer_tpu import materials as _mat
    from ray_tracer_tpu import sampling as _samp

    st_c = _samp.seed_state(ids_c.astype(jnp.uint32), jnp.int32(0))
    from ray_tracer_tpu.camera import camera_rays as _crays
    _, o_c, d_c = _crays(basis, ids_c % params.width, ids_c // params.width,
                         (params.width, params.height), st_c)
    o_c = jax.block_until_ready(o_c)

    def fi_loss(fl):
        it = iter(fl)
        merged = [next(it) if m else l for l, m in zip(leaves, is_f)]
        s2 = jtu.tree_unflatten(treedef, merged)
        h = fused_intersect(s2, o_c, d_c, 1e-3,
                            jnp.ones(o_c.shape[:1], bool))
        return (jnp.sum(h.albedo) + jnp.sum(h.normal) + jnp.sum(h.point)
                + jnp.sum(h.emission))

    run("chunk_vjp_intersect",
        jax.jit(lambda: jax.grad(fi_loss)(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))

    def fi4_loss(fl):
        it = iter(fl)
        merged = [next(it) if m else l for l, m in zip(leaves, is_f)]
        s2 = jtu.tree_unflatten(treedef, merged)

        def body(c, _):
            o, acc = c
            h = fused_intersect(s2, o, d_c, 1e-3,
                                jnp.ones(o.shape[:1], bool))
            return (h.point, acc + jnp.sum(h.albedo) + jnp.sum(h.normal)), None
        (_, acc), _ = jax.lax.scan(body, (o_c, jnp.float32(0.0)), None,
                                   length=params.bounces + 1)
        return acc

    run("chunk_vjp_intersect4",
        jax.jit(lambda: jax.grad(fi4_loss)(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))

    # --- r4: decompose the single-intersect backward (57.9 ms measured,
    # vs a ~4-8 ms forward kernel at chunk size) into its parts ----------
    from ray_tracer_tpu.ops import intersect as _itD
    from ray_tracer_tpu.ops.pallas_intersect import scatter_rows_pallas \
        as _scat

    alive_c = jnp.ones(o_c.shape[:1], bool)
    rows_c, pid_c, miss_c = jax.block_until_ready(jax.jit(
        lambda: _itD._winner_rows_impl(scene, o_c, d_c, 1e-3, alive_c))())
    key2 = jax.random.PRNGKey(7)
    g_rows_c = jax.random.normal(key2, (Rc, rows_c.shape[0]), jnp.float32)
    ids_sc = jnp.where(miss_c, T + S, pid_c).astype(jnp.int32)

    # (a) the MXU scatter at CHUNK size, 4-bounce scan
    @jax.jit
    def scatter_mxu_c():
        def body(acc, _):
            return acc + _scat(ids_sc, g_rows_c, T + S), None
        acc, _ = jax.lax.scan(body, jnp.zeros((T + S, rows_c.shape[0]),
                                              jnp.float32), None,
                              length=params.bounces + 1)
        return acc
    run("scatter_mxu_c", scatter_mxu_c, lambda a: np.asarray(a.ravel()[0]))

    # (b) the (26, R) -> (R, 26) cotangent transpose materialization
    run("transpose_c",
        jax.jit(lambda: (rows_c.T * 1.0000001).sum(axis=1)),
        lambda a: np.asarray(a.ravel()[0]))

    # (c) rows-only: grad through _winner_rows' custom VJP alone (kernel
    # fwd + where/transpose + scatter + pack transpose; NO recompute)
    wconst = jax.random.normal(key2, rows_c.shape, jnp.float32)

    def rows_loss(fl):
        it3 = iter(fl)
        merged = [next(it3) if m else l for l, m in zip(leaves, is_f)]
        s2 = jtu.tree_unflatten(treedef, merged)
        rows, pid, miss = _itD._winner_rows(s2, o_c, d_c, 1e-3, alive_c)
        return jnp.sum(rows * wconst)

    run("chunk_rows_grad",
        jax.jit(lambda: jax.grad(rows_loss)(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))

    # (d) recompute-only: hit_attributes_from_rows on CONSTANT rows
    # (isolates the differentiable recompute's fwd+bwd)
    def rec_loss(fl):
        it3 = iter(fl)
        merged = [next(it3) if m else l for l, m in zip(leaves, is_f)]
        s2 = jtu.tree_unflatten(treedef, merged)
        h = _itD.hit_attributes_from_rows(s2, rows_c, o_c, d_c, pid_c,
                                          miss_c, 1e-3)
        return (jnp.sum(h.albedo) + jnp.sum(h.normal) + jnp.sum(h.point)
                + jnp.sum(h.emission))

    run("chunk_recompute_grad",
        jax.jit(lambda: jax.grad(rec_loss)(float_leaves)),
        lambda g: np.asarray(g[0].ravel()[0]))

    # --- r4: ON-DEVICE rep-scanned pieces ("r_" prefix). The single-launch
    # timings above carry a ~33 ms relay-sync floor (measured: a trivial
    # 33 MB transpose "costs" 34.5 ms, same as the whole scatter scan) —
    # every small piece above is floor-dominated. These run NREP dependent
    # reps inside ONE jitted lax.scan (each rep depends on the loop index
    # so XLA cannot hoist it) and report per-rep cost; the floor shrinks
    # to ~33/NREP ms.
    NREP = int(os.environ.get("PROF_REPS", "8"))

    def rep_run(name, body_i):
        """body_i: i (int32) -> f32 scalar; timed as NREP dependent reps
        inside one program, reported per rep."""
        if only is not None and name not in only:
            return

        @jax.jit
        def prog():
            out, _ = jax.lax.scan(lambda c, i: (c + body_i(i), None),
                                  jnp.float32(0.0),
                                  jnp.arange(NREP, dtype=jnp.int32))
            return out

        try:
            t0 = time.time()
            np.asarray(prog())
            compile_s = time.time() - t0
            dt = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(prog())
                dt = min(dt, time.time() - t0)
            print(f"{name:22s} {dt/NREP*1e3:8.1f} ms/rep  (x{NREP}, "
                  f"compile+first {compile_s:.1f}s)", flush=True)
            return dt / NREP
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    def _merged(fl):
        it3 = iter(fl)
        return jtu.tree_unflatten(
            treedef, [next(it3) if m else l for l, m in zip(leaves, is_f)])

    def _gsum(g):
        return sum(jnp.sum(l) for l in g)

    rep_run("r_fwd", lambda i: jnp.sum(
        render_pixels(scene, basis, params, i, ids_c)) * 1e-6)

    def _grad_body(p):
        def body(i):
            def loss_fn(fl):
                rad = render_pixels(_merged(fl), basis, p, i, ids_c)
                return jnp.sum((rad - tgt_c) ** 2) / jnp.float32(R * 3)
            return _gsum(jax.grad(loss_fn)(float_leaves))
        return body

    rep_run("r_grad", _grad_body(params))
    rep_run("r_grad_remat", _grad_body(params.replace(remat=True)))
    for nb in (0, 1, 2):
        rep_run(f"r_grad_b{nb}", _grad_body(params.replace(bounces=nb)))

    # --- r5: FULL-FRAME rep-scanned grads (the r4 gap: grad_full 253.6 ms
    # vs 8 x r_grad = 170 ms — which piece owns the ~84 ms?) -------------
    ids_full = jnp.asarray(order_np.astype(np.int32))
    tgt_full_px = target.reshape(R, 3)[ids_full]

    def _grad_full_body(i):
        """bench's loss verbatim: render_frame (incl. unblock + mean)."""
        def loss_fn(fl):
            img = render_frame(_merged(fl), basis, params, i)
            return jnp.mean((img - target) ** 2)
        return _gsum(jax.grad(loss_fn)(float_leaves))

    def _grad_fullpix_body(i):
        """full 2.07M-ray grad WITHOUT the frame assembly (no unblock)."""
        def loss_fn(fl):
            rad = render_pixels(_merged(fl), basis, params, i, ids_full)
            return jnp.sum((rad - tgt_full_px) ** 2) / jnp.float32(R * 3)
        return _gsum(jax.grad(loss_fn)(float_leaves))

    def _grad_scan8_body(i):
        """8 sequential chunk grads inside one rep (the production
        chunked shape, without chunked_mse_value_and_grad's machinery)."""
        ids8 = ids_full.reshape(8, Rc)
        tgt8 = tgt_full_px.reshape(8, Rc, 3)

        def one(acc, args):
            ids_i, tgt_i = args

            def loss_fn(fl):
                rad = render_pixels(_merged(fl), basis, params, i, ids_i)
                return jnp.sum((rad - tgt_i) ** 2) / jnp.float32(R * 3)
            return acc + _gsum(jax.grad(loss_fn)(float_leaves)), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0), (ids8, tgt8))
        return acc

    rep_run("r_grad_full", _grad_full_body)
    rep_run("r_grad_fullpix", _grad_fullpix_body)
    rep_run("r_grad_scan8", _grad_scan8_body)
    rep_run("r_fwd_full", lambda i: jnp.sum(
        render_pixels(scene, basis, params, i, ids_full)) * 1e-6)

    # full-frame bounce sweep + severed scene chain: the backward's
    # marginal cost per (mostly-dead) bounce, and how much of it is the
    # scatter+pack VJP vs the elementwise cotangent chain
    def _grad_fullpix_p(p):
        def body(i):
            def loss_fn(fl):
                rad = render_pixels(_merged(fl), basis, p, i, ids_full)
                return jnp.sum((rad - tgt_full_px) ** 2) / jnp.float32(R * 3)
            return _gsum(jax.grad(loss_fn)(float_leaves))
        return body

    for nb in (0, 1, 2):
        rep_run(f"r_gfull_b{nb}", _grad_fullpix_p(params.replace(bounces=nb)))

    def _with_severed_scene(body):
        def wrapped(i):
            import functools as _f

            def _bwd0(t_min, res, g):
                sc, o2, d2 = res
                table, vjp_pack = jax.vjp(_itD._pack_attrs, sc)
                (zs,) = vjp_pack(jnp.zeros_like(table))
                return zs, jnp.zeros_like(o2), jnp.zeros_like(d2), None

            @_f.partial(jax.custom_vjp, nondiff_argnums=(3,))
            def rows0(sc, o2, d2, t_min, alive2):
                return _itD._winner_rows_impl(sc, o2, d2, t_min, alive2)

            rows0.defvjp(lambda sc, o2, d2, t_min, alive2:
                         (_itD._winner_rows_impl(sc, o2, d2, t_min, alive2),
                          (sc, o2, d2)), _bwd0)
            orig = _itD._winner_rows
            _itD._winner_rows = rows0
            try:
                return body(i)
            finally:
                _itD._winner_rows = orig
        return wrapped

    rep_run("r_gfull_noscene", _with_severed_scene(_grad_fullpix_body))

    def _vjp1_body(i):
        o_i = o_c + i.astype(jnp.float32) * 1e-12

        def loss_fn(fl):
            h = _itD.fused_intersect(_merged(fl), o_i, d_c, 1e-3, alive_c)
            return (jnp.sum(h.albedo) + jnp.sum(h.normal)
                    + jnp.sum(h.point) + jnp.sum(h.emission))
        return _gsum(jax.grad(loss_fn)(float_leaves))

    rep_run("r_vjp_intersect", _vjp1_body)

    def _fwd1_body(i):
        o_i = o_c + i.astype(jnp.float32) * 1e-12
        h = _itD.fused_intersect(scene, o_i, d_c, 1e-3, alive_c)
        return (jnp.sum(h.albedo) + jnp.sum(h.normal) + jnp.sum(h.point)
                + jnp.sum(h.emission))

    rep_run("r_fwd_intersect", _fwd1_body)

    def _rows_body(i):
        def loss_fn(fl):
            rows, pid, miss = _itD._winner_rows(_merged(fl), o_c, d_c,
                                                1e-3, alive_c)
            return jnp.sum(rows * (wconst + i.astype(jnp.float32) * 1e-12))
        return _gsum(jax.grad(loss_fn)(float_leaves))

    rep_run("r_rows_grad", _rows_body)

    def _rec_body(i):
        rows_i = rows_c * (1.0 + i.astype(jnp.float32) * 1e-12)

        def loss_fn(fl):
            h = _itD.hit_attributes_from_rows(_merged(fl), rows_i, o_c,
                                              d_c, pid_c, miss_c, 1e-3)
            return (jnp.sum(h.albedo) + jnp.sum(h.normal)
                    + jnp.sum(h.point) + jnp.sum(h.emission))
        return _gsum(jax.grad(loss_fn)(float_leaves))

    rep_run("r_recompute_grad", _rec_body)

    rep_run("r_scatter_mxu", lambda i: jnp.sum(
        _scat(ids_sc, g_rows_c * (1.0 + i.astype(jnp.float32) * 1e-12),
              T + S)) * 1e-6)

    # the SoA scatter (the one the production VJP actually calls) at FULL
    # frame R — the whole-frame backward runs 4 of these per step
    from ray_tracer_tpu.ops.pallas_intersect import scatter_rows_soa_pallas \
        as _scat_soa

    rows_f, pid_f, miss_f = jax.block_until_ready(jax.jit(
        lambda: _itD._winner_rows_impl(
            scene,
            jnp.tile(o_c, (8, 1))[:R], jnp.tile(d_c, (8, 1))[:R], 1e-3,
            jnp.ones((R,), bool)))())
    g_soa_f = jax.random.normal(key2, (rows_f.shape[0], R), jnp.float32)
    ids_f = jnp.where(miss_f, T + S, pid_f).astype(jnp.int32)
    rep_run("r_scatter_soa_fullR", lambda i: jnp.sum(
        _scat_soa(ids_f, g_soa_f * (1.0 + i.astype(jnp.float32) * 1e-12),
                  T + S)) * 1e-6)

    # severed scene-cotangent chain at chunk size (memory-feasible here)
    from ray_tracer_tpu.ops import intersect as _it0

    def _bwd_ns(t_min, res, g):
        scene_r, o, d = res
        table, vjp_pack = jax.vjp(_it0._pack_attrs, scene_r)
        (zs,) = vjp_pack(jnp.zeros_like(table))
        return zs, jnp.zeros_like(o), jnp.zeros_like(d), None

    import functools as _ft0

    @_ft0.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def rows_ns0(scene_a, o, d, t_min, alive):
        return _it0._winner_rows_impl(scene_a, o, d, t_min, alive)

    def _fwd_ns0(scene_a, o, d, t_min, alive):
        return (_it0._winner_rows_impl(scene_a, o, d, t_min, alive),
                (scene_a, o, d))

    rows_ns0.defvjp(_fwd_ns0, _bwd_ns)
    _orig0 = _it0._winner_rows
    _it0._winner_rows = rows_ns0
    try:
        run("chunk_grad_noscene",
            jax.jit(lambda: jax.grad(chunk_loss_params(params))(
                float_leaves)),
            lambda g: np.asarray(g[0].ravel()[0]))
    finally:
        # always restore — a KeyboardInterrupt/SystemExit mid-run must not
        # leave later sections running with the severed-VJP stub
        _it0._winner_rows = _orig0

    # XLA's own accounting of the chunk grad: flops + HBM bytes tell
    # whether the backward is compute- or (padded-)bandwidth-bound
    try:
        ca = jax.jit(lambda: jax.grad(chunk_loss_params(params))(
            float_leaves)).lower().compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(f"chunk_grad cost_analysis: flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0):.3e}", flush=True)
    except Exception as e:  # noqa: BLE001 — diagnostics only
        print(f"cost_analysis unavailable: {e}", flush=True)

    # --- full grad with bounce-scan rematerialization (params.remat A/B:
    # saves only per-bounce carries, recomputes the forward bounce in the
    # backward sweep — wins iff residual HBM traffic beats a 2nd pass)
    params_r = params.replace(remat=True)

    @jax.jit
    def grad_remat():
        def loss_fn(fl):
            it = iter(fl)
            merged = [next(it) if m else l for l, m in zip(leaves, is_f)]
            img = render_frame(jtu.tree_unflatten(treedef, merged), basis,
                               params_r, jnp.int32(0))
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss_fn)(float_leaves)

    run("grad_remat", grad_remat, lambda g: np.asarray(g[0].ravel()[0]))

    # --- backward with the scene-grad chain severed -------------------------
    # monkeypatch the winner-rows bwd to return zero scene grads (skips the
    # scatter-add + pack transpose; the ray-chain cotangents through
    # hit_attributes_from_rows' plain autodiff still back-propagate)
    from ray_tracer_tpu.ops import intersect as _it

    def _bwd_noscene(t_min, res, g):
        scene_r, o, d = res
        # constant-zero cotangent through pack's vjp: XLA folds the whole
        # thing away, leaving only correctly-typed zero scene cotangents
        table, vjp_pack = jax.vjp(_it._pack_attrs, scene_r)
        (zs,) = vjp_pack(jnp.zeros_like(table))
        return zs, jnp.zeros_like(o), jnp.zeros_like(d), None

    import functools as _ft

    @_ft.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def rows_ns(scene, o, d, t_min, alive):
        return _it._winner_rows_impl(scene, o, d, t_min, alive)

    def _fwd_ns(scene, o, d, t_min, alive):
        return (_it._winner_rows_impl(scene, o, d, t_min, alive),
                (scene, o, d))

    rows_ns.defvjp(_fwd_ns, _bwd_noscene)
    orig = _it._winner_rows
    # fused_intersect resolves `_winner_rows` through the module globals at
    # call time — rebinding the module attr is enough
    _it._winner_rows = rows_ns

    @jax.jit
    def grad_noscene():
        def loss_fn(fl):
            it2 = iter(fl)
            merged = [next(it2) if m else l for l, m in zip(leaves, is_f)]
            img = render_frame(jtu.tree_unflatten(treedef, merged), basis,
                               params, jnp.int32(0))
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss_fn)(float_leaves)

    run("grad_noscene", grad_noscene, lambda g: np.asarray(g[0].ravel()[0]))
    _it._winner_rows = orig

    # --- isolated scatter-add (the gather transpose) ------------------------
    key = jax.random.PRNGKey(0)
    # realistic winner distribution: blocked-coherent ids (sorted-ish)
    ids = jnp.sort(jax.random.randint(key, (R,), 0, T)).astype(jnp.int32)
    rows = jax.random.normal(key, (R, 26), jnp.float32)

    @jax.jit
    def scatter_t():
        def body(acc, _):
            return acc.at[ids].add(rows), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((T, 26), jnp.float32), None,
            length=params.bounces + 1)
        return acc

    run("scatter_t", scatter_t, lambda a: np.asarray(a.ravel()[0]))

    # the MXU one-hot scatter kernel on the same workload
    from ray_tracer_tpu.ops.pallas_intersect import scatter_rows_pallas

    @jax.jit
    def scatter_mxu():
        def body(acc, _):
            return acc + scatter_rows_pallas(ids, rows, T), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((T, 26), jnp.float32), None,
            length=params.bounces + 1)
        return acc

    run("scatter_mxu", scatter_mxu, lambda a: np.asarray(a.ravel()[0]))

    packed = jax.random.normal(key, (T, 26), jnp.float32)

    @jax.jit
    def gather_t():
        def body(acc, _):
            return acc + packed[ids].sum(0), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((26,), jnp.float32), None,
            length=params.bounces + 1)
        return acc

    run("gather_t", gather_t, lambda a: np.asarray(a.ravel()[0]))


if __name__ == "__main__":
    main()
