"""Edge-sampled visibility gradient tests.

The hardest math in the build (SURVEY §7.3): validated against finite
differences of expectation-smoothed losses, plus an end-to-end recovery that
interior gradients provably cannot do (emissive silhouette translation).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import ray_tracer_tpu as rt
from ray_tracer_tpu.grad import merge_scene
from ray_tracer_tpu.grad.edges import boundary_gradients, project_to_image
from ray_tracer_tpu.renderer import render_frame

W = H = 48
LE = 2.0


def _sphere_scene(cx=0.0, cy=0.0, r=1.0):
    return (rt.SceneBuilder()
            .add_sphere((cx, cy, -5.0), r, (0, 0, 0), emission=(1, 1, 1),
                        emission_strength=LE)
            .build(pad=8))


def _cam():
    return rt.Camera(origin=(0, 0, 0), look_at=(0, 0, -1), fov=45.0,
                     aspect=1.0, focus_dist=1.0)


PARAMS = rt.RenderParams(width=W, height=H, bounces=0, skybox=False,
                         backend="jnp")


def _ramp_cot():
    """Weight map: x-ramp so translation has a nonzero boundary gradient."""
    wx = (np.arange(W) + 0.5) / W
    cot = np.broadcast_to(wx[None, :, None], (H, W, 3)).astype(np.float32)
    return jnp.asarray(cot / (3 * W * H))


def _ramp_loss(scene, basis, frames=64):
    """E[Σ cot·img] over AA jitter, estimated with many frames — smooth in
    scene parameters (the expectation integrates the jitter)."""
    cot = _ramp_cot()
    tot = 0.0
    for i in range(frames):
        img = render_frame(scene, basis, PARAMS, jnp.int32(i))
        tot = tot + jnp.sum(cot * img)
    return float(tot) / frames


def test_project_inverts_ray_generation():
    basis = rt.camera_basis(_cam())
    # a ray through pixel-space point (10.3, 20.7):
    px, py = 10.3 / W, 20.7 / H
    d = (basis.lower_left + px * basis.horizontal + py * basis.vertical
         - basis.origin)
    x = basis.origin + 3.7 * d   # any point along the ray
    pix = np.asarray(project_to_image(basis, x, W, H))
    np.testing.assert_allclose(pix, [10.3, 20.7], atol=1e-3)


def test_interior_gradient_is_zero_for_emissive_silhouette():
    """Autodiff alone cannot see silhouette translation — that's the point."""
    scene = _sphere_scene()
    basis = rt.camera_basis(_cam())
    cot = _ramp_cot()

    def loss(center):
        s = merge_scene(scene, {"sphere_center": center})
        img = render_frame(s, basis, PARAMS, jnp.int32(0))
        return jnp.sum(cot * img)

    g = np.asarray(jax.grad(loss)(scene.sphere_center))
    np.testing.assert_allclose(g, 0.0, atol=1e-8)


def test_sphere_boundary_gradient_matches_finite_difference():
    basis = rt.camera_basis(_cam())
    cot = _ramp_cot()
    scene = _sphere_scene()
    bg = boundary_gradients(scene, basis, PARAMS, cot,
                            jax.random.PRNGKey(0), n_tri_samples=0,
                            n_sph_samples=20000)
    g_cx = float(bg["sphere_center"][0, 0])
    g_r = float(bg["sphere_radius"][0])

    h = 0.04
    fd_cx = (_ramp_loss(_sphere_scene(cx=+h), basis)
             - _ramp_loss(_sphere_scene(cx=-h), basis)) / (2 * h)
    fd_r = (_ramp_loss(_sphere_scene(r=1.0 + h), basis)
            - _ramp_loss(_sphere_scene(r=1.0 - h), basis)) / (2 * h)

    assert np.sign(g_cx) == np.sign(fd_cx) and abs(fd_cx) > 1e-5
    assert abs(g_cx - fd_cx) < 0.35 * abs(fd_cx), (g_cx, fd_cx)
    assert np.sign(g_r) == np.sign(fd_r) and abs(fd_r) > 1e-5
    assert abs(g_r - fd_r) < 0.35 * abs(fd_r), (g_r, fd_r)


def test_triangle_boundary_gradient_matches_finite_difference():
    basis = rt.camera_basis(_cam())
    cot = _ramp_cot()

    def tri_scene(dx=0.0):
        verts = [(-1.0 + dx, -1.0, -5.0), (1.0 + dx, -1.0, -5.0),
                 (0.0 + dx, 1.2, -5.0)]
        return (rt.SceneBuilder()
                .add_mesh(verts, np.tile([[0, 0, 1.0]], (3, 1)), [0, 1, 2],
                          albedo=(0, 0, 0), emission=(1, 1, 1),
                          emission_strength=LE)
                .build(pad=8))

    scene = tri_scene()
    bg = boundary_gradients(scene, basis, PARAMS, cot,
                            jax.random.PRNGKey(1), n_tri_samples=20000,
                            n_sph_samples=0)
    # translating the whole triangle in x = sum of x-grads of all vertices
    g_dx = float(bg["tri_v0"][:, 0].sum() + bg["tri_v1"][:, 0].sum()
                 + bg["tri_v2"][:, 0].sum())

    h = 0.04
    fd_dx = (_ramp_loss(tri_scene(+h), basis)
             - _ramp_loss(tri_scene(-h), basis)) / (2 * h)
    assert np.sign(g_dx) == np.sign(fd_dx) and abs(fd_dx) > 1e-5
    assert abs(g_dx - fd_dx) < 0.35 * abs(fd_dx), (g_dx, fd_dx)


def test_occluded_edges_contribute_nothing():
    """A sphere fully hidden behind a bigger one: its boundary grads ≈ 0."""
    b = rt.SceneBuilder()
    b.add_sphere((0, 0, -3.0), 1.5, (0.5, 0.5, 0.5))           # occluder
    b.add_sphere((0, 0, -8.0), 0.5, (0, 0, 0), emission=(1, 1, 1),
                 emission_strength=LE)                          # hidden
    scene = b.build(pad=8)
    basis = rt.camera_basis(_cam())
    bg = boundary_gradients(scene, basis, PARAMS, _ramp_cot(),
                            jax.random.PRNGKey(2), n_tri_samples=0,
                            n_sph_samples=8000)
    hidden = np.asarray(bg["sphere_center"][1])
    visible = np.asarray(bg["sphere_center"][0])
    assert np.abs(hidden).max() < 0.05 * max(np.abs(visible).max(), 1e-6) \
        or np.abs(hidden).max() < 1e-5


def test_end_to_end_silhouette_recovery():
    """Recover a translated emissive sphere from its silhouette — requires
    boundary gradients (interior grads are exactly zero here)."""
    true_scene = _sphere_scene(cx=0.0, cy=0.0)
    basis = rt.camera_basis(_cam())
    target = render_frame(true_scene, basis, PARAMS, jnp.int32(0))

    start = _sphere_scene(cx=0.8, cy=-0.5)
    init_fn, step_fn = make_step = None, None
    from ray_tracer_tpu.grad import make_train_step
    init_fn, step_fn = make_train_step(PARAMS, optax.adam(5e-2),
                                       edge_samples=3000)
    trainable, opt_state = init_fn(start, fields=("sphere_center",))
    for i in range(50):
        trainable, opt_state, loss = step_fn(
            trainable, opt_state, start, basis, target, jnp.int32(i))
    rec = np.asarray(trainable["sphere_center"][0])
    err = np.linalg.norm(rec - np.array([0.0, 0.0, -5.0]))
    assert err < 0.25, (rec, err)


def test_sphere_boundary_gradient_thin_lens_matches_fd():
    """Aperture > 0 (VERDICT r2 weak-7: the estimator was pinhole-only):
    per-sample lens points make the boundary term the exact E_lens of the
    per-lens contour integral; validated against finite differences of the
    DOF-rendered expectation loss."""
    cam = rt.Camera(origin=(0, 0, 0), look_at=(0, 0, -1), fov=45.0,
                    aspect=1.0, focus_dist=1.0, aperture=0.25)
    basis = rt.camera_basis(cam)
    cot = _ramp_cot()
    scene = _sphere_scene()
    bg = boundary_gradients(scene, basis, PARAMS, cot,
                            jax.random.PRNGKey(3), n_tri_samples=0,
                            n_sph_samples=40000)
    g_cx = float(bg["sphere_center"][0, 0])

    h = 0.05
    fd_cx = (_ramp_loss(_sphere_scene(cx=+h), basis, frames=192)
             - _ramp_loss(_sphere_scene(cx=-h), basis, frames=192)) / (2 * h)
    assert np.sign(g_cx) == np.sign(fd_cx) and abs(fd_cx) > 1e-5
    assert abs(g_cx - fd_cx) < 0.4 * abs(fd_cx), (g_cx, fd_cx)
