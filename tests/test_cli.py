"""CLI tests: argument validation + render smoke (Agg/headless)."""

import numpy as np
import pytest

from ray_tracer_tpu import cli


def test_frames_zero_rejected(capsys):
    with pytest.raises(SystemExit):
        cli.main(["render", "--frames", "0", "--width", "8", "--height", "8"])


def test_render_one_frame(tmp_path):
    out = tmp_path / "m.png"
    cli.main(["render", "--scene", "metal", "--width", "16", "--height", "16",
              "--frames", "1", "--backend", "jnp", "--skybox",
              "-o", str(out)])
    assert out.exists()
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (16, 16, 3) and img.max() > 0


def test_render_npy_roundtrip(tmp_path):
    out = tmp_path / "m.npy"
    cli.main(["render", "--scene", "metal", "--width", "8", "--height", "8",
              "--frames", "2", "--backend", "jnp", "-o", str(out)])
    img = np.load(out)
    assert img.shape == (8, 8, 3) and np.isfinite(img).all()


def test_info_runs(capsys):
    cli.main(["info"])
    assert "devices" in capsys.readouterr().out
