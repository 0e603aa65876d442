"""CLI tests: the app shell must actually wire its flags into the renderer
(the reference wires its worker pool into the app, renderer.rs:34-69 via
main.rs:87 -- our --dp flag is the analogue and regressed silently in round
2 because nothing drove the CLI).
"""

import os

import numpy as np
import pytest

from paths_tpu import cli as CLI
from paths_tpu import render as R


@pytest.fixture()
def capture_render(monkeypatch):
    """Wrap render_image, recording the kwargs the CLI passes it."""
    seen = {}
    real = R.render_image

    def wrapper(*args, **kwargs):
        seen.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(R, "render_image", wrapper)
    return seen


def test_cli_dp_passes_mesh(tmp_path, capture_render):
    out = tmp_path / "out.png"
    CLI.main([
        "--cpu", "--dp", "2", "--stress", "8", "--spp", "1",
        "--size", "32x8", "-o", str(out),
    ])
    mesh = capture_render.get("mesh")
    assert mesh is not None, "--dp must hand render_image the device mesh"
    assert mesh.devices.size == 2
    assert os.path.exists(out)


def test_cli_default_is_single_device(tmp_path, capture_render):
    out = tmp_path / "out.png"
    CLI.main([
        "--cpu", "--stress", "8", "--spp", "1",
        "--size", "32x8", "-o", str(out),
    ])
    assert capture_render.get("mesh") is None


def test_cli_dp_matches_single_device(tmp_path, capture_render):
    """A --dp render must produce the same image as the default path (RNG is
    a pure function of (pixel, sample); sharding cannot change results)."""
    from PIL import Image

    out1 = tmp_path / "a.png"
    out2 = tmp_path / "b.png"
    common = ["--cpu", "--stress", "8", "--spp", "2", "--size", "32x8"]
    CLI.main(common + ["-o", str(out1)])
    CLI.main(common + ["--dp", "2", "-o", str(out2)])
    np.testing.assert_array_equal(
        np.asarray(Image.open(out1)), np.asarray(Image.open(out2))
    )


def test_cli_native_cpu_backend(tmp_path):
    """--native-cpu renders through the C++ tracer end-to-end."""
    from paths_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    out = tmp_path / "native.png"
    CLI.main([
        "--cpu", "--native-cpu", "--stress", "8", "--spp", "2",
        "--size", "32x8", "-o", str(out),
    ])
    assert os.path.exists(out)
