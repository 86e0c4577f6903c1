"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ray_tracer_tpu as rt
from ray_tracer_tpu.parallel import make_mesh, render_frame_distributed
from ray_tracer_tpu.renderer import render_frame


@pytest.fixture(scope="module")
def setup():
    scene, cam = rt.builtin_scene("metal", aspect=1.0, pad=8)
    params = rt.RenderParams(width=24, height=16, bounces=2, skybox=True,
                             backend="jnp")
    basis = rt.camera_basis(cam.replace(aspect=params.aspect))
    return scene, basis, params


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(setup):
    scene, basis, params = setup
    mesh = make_mesh(8)
    a = np.asarray(render_frame(scene, basis, params, jnp.int32(0)))
    b = np.asarray(render_frame_distributed(scene, basis, params, 0, mesh))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_render_subset_mesh(setup):
    scene, basis, params = setup
    a = np.asarray(render_frame_distributed(scene, basis, params, 0, make_mesh(2)))
    b = np.asarray(render_frame_distributed(scene, basis, params, 0, make_mesh(8)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_nondivisible_pixel_count(setup):
    scene, basis, _ = setup
    # 13*7 = 91 pixels, not divisible by 8 → padding path
    params = rt.RenderParams(width=13, height=7, bounces=1, skybox=True,
                             backend="jnp")
    a = np.asarray(render_frame(scene, basis, params, jnp.int32(0)))
    b = np.asarray(render_frame_distributed(scene, basis, params, 0, make_mesh(8)))
    assert b.shape == (7, 13, 3)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3)
    assert bool(jnp.isfinite(out).all())


def test_sharded_pallas_matches_single_device():
    """PRODUCTION configuration parity (VERDICT r2 #4b): the Pallas kernels
    (interpret mode off-TPU — same code path that compiles on silicon)
    under shard_map over 8 devices must match the single-device pallas
    render bit-for-bit: same blocked 16x8 pixel order, same per-pixel RNG
    streams, fused in-kernel winner extraction on both sides."""
    scene, cam = rt.builtin_scene("room", aspect=2.0)
    params = rt.RenderParams(width=64, height=32, bounces=2, skybox=True,
                             backend="pallas")
    basis = rt.camera_basis(cam.replace(aspect=params.aspect))
    a = np.asarray(render_frame(scene, basis, params, jnp.int32(0)))
    b = np.asarray(render_frame_distributed(scene, basis, params, 0,
                                            make_mesh(8)))
    np.testing.assert_array_equal(a, b)


def test_sharded_pallas_nee_grad_matches_single_device():
    """Inverse-rendering step on the production path: pallas backend + NEE
    (any-hit occlusion kernel) under shard_map; scene gradients (through
    the custom_vjp scatter-add) must match the single-device gradients."""
    import jax.tree_util as jtu
    from ray_tracer_tpu.grad.inverse import image_mse, split_scene

    scene, cam = rt.builtin_scene("room", aspect=1.0)
    params = rt.RenderParams(width=16, height=16, bounces=1, skybox=True,
                             nee=True, backend="pallas")
    basis = rt.camera_basis(cam)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    trainable, _ = split_scene(scene)

    g1 = jax.grad(image_mse)(trainable, scene, basis, params,
                             jnp.int32(0), target, mesh=None)
    g8 = jax.grad(image_mse)(trainable, scene, basis, params,
                             jnp.int32(0), target, mesh=make_mesh(8))
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g8[k]),
                                   atol=1e-6, err_msg=k)
