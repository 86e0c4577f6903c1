"""Transient-failure retry: classification, backoff hooks, and the
resilient render_progressive path."""

import numpy as np
import jax.numpy as jnp
import pytest

import ray_tracer_tpu as rt
from ray_tracer_tpu import renderer as renderer_mod
from ray_tracer_tpu.renderer import camera_basis, render_progressive
from ray_tracer_tpu.utils.retry import is_transient, retry_transient


def test_is_transient_classification():
    assert is_transient(RuntimeError("UNAVAILABLE: Socket closed"))
    assert is_transient(RuntimeError("DEADLINE_EXCEEDED while awaiting"))
    assert not is_transient(RuntimeError("RESOURCE_EXHAUSTED: OOM"))
    assert not is_transient(ValueError("UNAVAILABLE"))  # wrong type
    assert not is_transient(RuntimeError("shape mismatch"))


def test_retry_transient_retries_then_succeeds():
    calls = {"n": 0}
    hooks = []

    def fn():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: relay blip")
        return "ok"

    out = retry_transient(fn, retries=2, base_delay=0.0,
                          on_retry=lambda a, e: hooks.append(a))
    assert out == "ok" and calls["n"] == 3 and hooks == [1, 2]


def test_retry_transient_propagates_real_errors():
    with pytest.raises(ValueError):
        retry_transient(lambda: (_ for _ in ()).throw(ValueError("bug")),
                        retries=5, base_delay=0.0)

    def fn():
        raise RuntimeError("UNAVAILABLE forever")

    with pytest.raises(RuntimeError):
        retry_transient(fn, retries=1, base_delay=0.0)


def test_render_progressive_resilient_recovers(monkeypatch):
    """A chunk launch that dies once on a transient error is retried from
    the host-side safe point and produces the same image."""
    scene, cam = rt.builtin_scene("metal", pad=128)
    params = rt.RenderParams(width=32, height=32, bounces=1, skybox=True)
    basis = camera_basis(cam.replace(aspect=1.0))

    want = np.asarray(render_progressive(scene, basis, params, 4, chunk=2))

    real = renderer_mod._render_progressive_chunk
    state = {"failed": False}

    def flaky(*a, **kw):
        if not state["failed"]:
            state["failed"] = True
            raise RuntimeError("UNAVAILABLE: Socket closed (simulated)")
        return real(*a, **kw)

    monkeypatch.setattr(renderer_mod, "_render_progressive_chunk", flaky)
    monkeypatch.setattr("ray_tracer_tpu.utils.retry.time",
                        __import__("types").SimpleNamespace(sleep=lambda s: None))
    got = np.asarray(render_progressive(scene, basis, params, 4, chunk=2,
                                        resilient=True))
    assert state["failed"]
    np.testing.assert_allclose(got, want, atol=1e-6)
