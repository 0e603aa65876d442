"""Golden-image regression gate (VERDICT r1 item 6).

Each committed golden (tests/goldens/*.npz, produced by tests/make_goldens.py
on the CPU backend) is re-rendered with identical settings and compared by
MSE.  The renderer's RNG is a pure counter-based function of
(pixel, sample, bounce, dim), so a same-backend re-render is deterministic:
any MSE beyond float reassociation noise means the forward path changed
images.  This is the automated stand-in for the reference's visual
Mitsuba-parity validation (README.md:39)."""

import os

import numpy as np
import pytest

from tests.make_goldens import GOLDENS, render_golden

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_image(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.fail(f"missing golden {path}; run python tests/make_goldens.py")
    want = np.load(path)["img"]
    got = render_golden(name)
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    mse = float(np.mean((got - want) ** 2))
    # Same backend + same RNG -> should be ~bit-identical; the tolerance
    # absorbs compiler reassociation across jax/XLA versions, nothing more.
    scale = float(np.mean(want**2)) + 1e-12
    assert mse / scale < 1e-6, f"{name}: relative MSE {mse/scale:.3e}"
