"""bench.py resilience harness: partial-results persistence, section
retry/resume, and final JSON composition — the machinery that keeps one
relay outage from voiding the round's artifact (round-2 postmortem).

Tested with stub sections on CPU; the real sections are exercised on
hardware by the driver."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_partial_roundtrip(tmp_path):
    p = str(tmp_path / "partial.json")
    assert bench._load_partial(p) == {}
    bench._save_partial(p, {"fwd": {"rays_per_s": 1.0}})
    assert bench._load_partial(p) == {"fwd": {"rays_per_s": 1.0}}
    # corrupt file → treated as empty, not a crash
    with open(p, "w") as f:
        f.write("{not json")
    assert bench._load_partial(p) == {}


def test_compose_full():
    out = bench.compose({
        "fwd": {"rays_per_s": 1e8, "seconds": 1.0, "frames": 32,
                "compile_s": 20.0},
        "fwd_bwd": {"rays_per_s": 5e7, "s_per_step": 0.2, "compile_s": 60.0},
        "parity": {"room_128_frac_off": 0.0},
        "textured": {"rays_per_s": 4e7, "seconds": 2.0, "frames": 16,
                     "compile_s": 30.0},
    })
    assert out["value"] == 1e8
    assert out["vs_baseline"] == round(1e8 / bench.BASELINE_RAYS_PER_S, 3)
    assert out["detail"]["fwd_bwd_rays_per_s"] == 5e7
    assert out["detail"]["textured_rays_per_s"] == 4e7
    assert out["detail"]["on_device_parity_max_abs_diff"] == {
        "room_128_frac_off": 0.0}
    assert "errors" not in out["detail"]
    json.dumps(out)  # must be JSON-serializable


def test_compose_partial_failure():
    """A lost section degrades the artifact, never voids it."""
    out = bench.compose({
        "fwd": {"rays_per_s": 1e8},
        "errors": {"fwd_bwd": "UNAVAILABLE: relay gone"},
    })
    assert out["value"] == 1e8
    assert out["detail"]["errors"]["fwd_bwd"].startswith("UNAVAILABLE")
    json.dumps(out)


def test_compose_total_outage():
    out = bench.compose({"errors": {"backend": "unreachable"}})
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    json.dumps(out)


def test_worker_resume_skips_done_and_persists(tmp_path, monkeypatch):
    """Worker resumes from the partial file, runs only missing sections,
    persists each as it completes, and exits 3 on a transient failure so
    the parent restarts it with a fresh backend."""
    p = str(tmp_path / "partial.json")
    calls = []

    def ok_a(ctx):
        calls.append("a")
        return {"rays_per_s": 1.0}

    def transient_b(ctx):
        calls.append("b")
        raise RuntimeError("UNAVAILABLE: relay blip")

    monkeypatch.setattr(bench, "SECTIONS", [("a", ok_a), ("b", transient_b)])
    # make the in-worker retry fast
    import ray_tracer_tpu.utils.retry as retry_mod
    real = retry_mod.retry_transient
    monkeypatch.setattr(
        retry_mod, "retry_transient",
        lambda fn, **kw: real(fn, retries=1, base_delay=0.0, max_delay=0.0))

    with pytest.raises(SystemExit) as e:
        bench.worker_main(p)
    assert e.value.code == 3
    saved = bench._load_partial(p)
    assert saved["a"] == {"rays_per_s": 1.0}
    assert "UNAVAILABLE" in saved["errors"]["b"]

    # second attempt: a now succeeds without rerunning, b recovers
    calls.clear()

    def ok_b(ctx):
        calls.append("b2")
        return {"fixed": True}

    monkeypatch.setattr(bench, "SECTIONS", [("a", ok_a), ("b", ok_b)])
    with pytest.raises(SystemExit) as e:
        bench.worker_main(p)
    assert e.value.code == 0
    assert calls == ["b2"]  # "a" was resumed from the partial file
    saved = bench._load_partial(p)
    assert saved["b"] == {"fixed": True}
    assert saved["errors"] == {}  # cleared on recovery


def test_worker_nontransient_continues(tmp_path, monkeypatch):
    """A real bug in one section is recorded and the remaining sections
    still run (rc=0: restarting won't help a non-transient failure)."""
    p = str(tmp_path / "partial.json")

    def bad(ctx):
        raise AssertionError("parity diverged")

    def good(ctx):
        return {"v": 2}

    monkeypatch.setattr(bench, "SECTIONS", [("bad", bad), ("good", good)])
    with pytest.raises(SystemExit) as e:
        bench.worker_main(p)
    assert e.value.code == 0
    saved = bench._load_partial(p)
    assert "parity diverged" in saved["errors"]["bad"]
    assert saved["good"] == {"v": 2}


def test_compose_parity_assertion_withholds_headline():
    """A parity ASSERTION failure (kernel diverged on this chip) zeroes
    the headline; a parity section lost to a relay outage does not."""
    out = bench.compose({
        "fwd": {"rays_per_s": 1e8},
        "errors": {"parity": "AssertionError: pallas/jnp divergence"},
    })
    assert out["value"] == 0.0
    assert out["detail"]["fwd_rays_per_s_unverified"] == 1e8
    assert "parity_gate" in out["detail"]

    out = bench.compose({
        "fwd": {"rays_per_s": 1e8},
        "errors": {"parity": "RuntimeError: UNAVAILABLE: relay gone"},
    })
    assert out["value"] == 1e8
    assert "parity_gate" not in out["detail"]
