"""Next-event estimation tests: light table, estimator consistency,
variance reduction."""

import numpy as np
import jax
import jax.numpy as jnp

import ray_tracer_tpu as rt
from ray_tracer_tpu.lights import build_light_table, sample_lights
from ray_tracer_tpu.renderer import render_frame


def test_light_table_room():
    scene, _ = rt.builtin_scene("room")
    lt = build_light_table(scene)
    assert bool(lt.has_lights)
    # the two ceiling-quad triangles are the only emitters
    # packed cols: [p_light | area | emission(3) | prim_id | is_tri | ...]
    packed = np.asarray(lt.packed)
    cdf = np.asarray(lt.cdf)
    n_real = int((np.diff(np.concatenate([[0.0], cdf])) > 0).sum())
    assert n_real == 2
    assert (packed[:2, 6] == 1.0).all()  # triangles
    np.testing.assert_allclose(packed[0, 2:5], [10.5] * 3, atol=1e-5)


def test_light_table_empty_scene():
    scene, _ = rt.builtin_scene("metal")  # no emitters
    lt = build_light_table(scene)
    assert not bool(lt.has_lights)


def test_sample_lights_points_on_light():
    scene, _ = rt.builtin_scene("room")
    lt = build_light_table(scene)
    p = jnp.zeros((256, 3))
    state = jnp.arange(256, dtype=jnp.uint32)
    _, ls = sample_lights(lt, scene, state, p)
    pts = np.asarray(p + ls["wi"])
    ok = np.asarray(ls["ok"])
    # light quad: x in [2,4] (pos 3 ± 1), y = 2.9, z in [-1,1]
    assert ok.any()
    np.testing.assert_allclose(pts[ok][:, 1], 2.9, atol=1e-4)
    assert pts[ok][:, 0].min() >= 2.0 - 1e-4 and pts[ok][:, 0].max() <= 4.0 + 1e-4


def _mean_image(scene, cam, params, frames):
    basis = rt.camera_basis(cam)
    imgs = [np.asarray(render_frame(scene, basis, params, jnp.int32(i)))
            for i in range(frames)]
    return np.mean(imgs, 0), np.var(imgs, 0)


def test_nee_matches_bsdf_sampling_converged():
    """NEE must not change the converged image (same transport integral).

    Single diffuse floor + one emissive sphere, enough frames for the means
    to agree within sampling error."""
    b = rt.SceneBuilder()
    b.add_sphere((0, -100.0, 0), 99.0, (0.8, 0.8, 0.8), smoothness=0.0)
    b.add_sphere((0, 4.0, 0), 2.0, (0, 0, 0), emission=(1, 1, 1),
                 emission_strength=5.0)
    scene = b.build(pad=8)
    cam = rt.Camera(origin=(0, 2.2, 8.0), look_at=(0, 0.5, 0), fov=35.0,
                    aspect=1.0)
    base = rt.RenderParams(width=24, height=24, bounces=2, skybox=False,
                           backend="jnp")
    m_off, v_off = _mean_image(scene, cam, base, 120)
    m_on, v_on = _mean_image(scene, cam, base.replace(nee=True), 120)
    # means agree to within a few std errors, image-average level
    assert abs(m_on.mean() - m_off.mean()) < 0.015, (m_on.mean(), m_off.mean())

    # variance reduction on lit diffuse pixels (the whole point of NEE)
    lit = m_off.mean(-1) > 0.01
    assert v_on[lit].mean() < v_off[lit].mean() * 0.7


def test_nee_primary_emission_still_counted():
    """Looking straight at the light: NEE must not lose direct emission."""
    b = rt.SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, (0, 0, 0), emission=(1.0, 0.5, 0.25),
                 emission_strength=2.0)
    scene = b.build(pad=8)
    cam = rt.Camera(origin=(0, 0, 0), look_at=(0, 0, -1), fov=10.0, aspect=1.0)
    p = rt.RenderParams(width=8, height=8, bounces=2, backend="jnp", nee=True)
    img = np.asarray(rt.render(scene, cam, p))
    np.testing.assert_allclose(
        img, np.broadcast_to([2.0, 1.0, 0.5], img.shape), rtol=1e-4)


def test_nee_off_is_bitwise_reference():
    """nee=False must not perturb the original path (same RNG stream)."""
    scene, cam = rt.builtin_scene("room", aspect=1.0)
    p0 = rt.RenderParams(width=12, height=12, bounces=2, backend="jnp")
    basis = rt.camera_basis(cam)
    a = np.asarray(render_frame(scene, basis, p0, jnp.int32(0)))
    b = np.asarray(render_frame(scene, basis, p0.replace(nee=False),
                                jnp.int32(0)))
    np.testing.assert_array_equal(a, b)


def test_cosine_sampling_renders_finite():
    scene, cam = rt.builtin_scene("room", aspect=1.0)
    p = rt.RenderParams(width=12, height=12, bounces=2, backend="jnp",
                        cosine_sampling=True, nee=True)
    img = np.asarray(rt.render(scene, cam, p, frames=3))
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_light_table_entry_valid():
    scene, _ = rt.builtin_scene("room")
    lt = build_light_table(scene)
    ev = np.asarray(lt.entry_valid)
    assert ev[:2].all() and not ev[2:].any()  # 2 real emitters (ceiling quad)


def test_overflow_emitters_still_counted(monkeypatch):
    """Emitters beyond MAX_LIGHTS are never NEE-sampled; their emission must
    still arrive via BSDF sampling (ADVICE r1: blanket suppression darkened
    scenes with more emitters than table slots). MAX_LIGHTS is shrunk to 1
    so the out-of-table light carries a large, testable share."""
    import ray_tracer_tpu.lights as lights_mod
    monkeypatch.setattr(lights_mod, "MAX_LIGHTS", 1)

    def make_scene():
        b = rt.SceneBuilder()
        # diffuse floor
        b.add_mesh(np.array([[-20, 0, -20], [20, 0, -20], [20, 0, 20],
                             [-20, 0, 20]], np.float32),
                   np.tile([[0, 1, 0]], (4, 1)).astype(np.float32),
                   np.array([0, 2, 1, 0, 3, 2], np.uint32),  # up-facing winding
                   albedo=(0.8, 0.8, 0.8), smoothness=0.0)
        # two emitters; the table (size 1) holds only the stronger one
        b.add_sphere((-3, 5, 0), 2.0, (0, 0, 0), emission=(1, 1, 1),
                     emission_strength=10.0)
        b.add_sphere((3, 5, 0), 2.0, (0, 0, 0), emission=(1, 1, 1),
                     emission_strength=8.0)
        return b.build()

    scene = make_scene()
    lt = build_light_table(scene)
    assert np.asarray(lt.entry_valid).sum() == 1

    cam = rt.Camera(origin=(0, 8, 12), look_at=(0, 0, 0), aspect=1.0)
    from ray_tracer_tpu.renderer import render_progressive, camera_basis
    basis = camera_basis(cam)
    means = {}
    for nee in (False, True):
        params = rt.RenderParams(width=16, height=16, bounces=2, skybox=False,
                                 backend="jnp", nee=nee)
        img = np.asarray(render_progressive(scene, basis, params, 192))
        means[nee] = float(img.mean())
    # NEE must not change the converged image; with the r1 bug the
    # out-of-table emitter was suppressed (measured ratio 0.915 under the
    # old blanket suppression vs 1.002 fixed — 0.04 separates them)
    assert abs(means[True] / means[False] - 1.0) < 0.04, means
