"""The render_samples wave-state sort must not change images.

render_samples (Pallas scenes, waves >= _SORT_MIN_N) permutes the whole
per-lane wave state once per bounce and runs the traversal kernels with
their internal lane sort disabled.  Per-lane results are lane-position
independent and the RNG is keyed on the carried pixel_id, so the result
must be BIT-IDENTICAL to the unsorted schedule (PATHS_TPU_WAVE_SORT=0) --
any difference means lane state leaked across the permutation.
"""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("PATHS_TPU_FORCE_PALLAS", "1")


def _render(scene_sd, wave_sort: bool, n_lanes: int, monkeypatch):
    import jax.numpy as jnp

    from paths_tpu.render import render_samples, tiled_pixel_order
    from paths_tpu.scene.build import build_scene

    monkeypatch.setenv("PATHS_TPU_WAVE_SORT", "1" if wave_sort else "0")
    import dataclasses

    static, scene, cam = build_scene(scene_sd)
    static = dataclasses.replace(static, max_bounces=3)
    W = H = 96  # 9216 lanes >= _SORT_MIN_N (8192)
    from paths_tpu import camera as C

    cam = C.resize(cam, W, H)
    pix = tiled_pixel_order(W, H)[:n_lanes]
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)
    out = render_samples(static, scene, cam, px, py, pid, jnp.uint32(0), 2, 7)
    return np.asarray(out)


def test_wave_sort_bit_identical(force_pallas, monkeypatch):
    from paths_tpu.ops.pallas_traverse import _SORT_MIN_N
    from paths_tpu.scene.stress import generate_mixed_scene

    sd = generate_mixed_scene(
        os.path.join(os.path.dirname(__file__), "goldens", "assets"),
        n_spheres=12,
    )
    n = 96 * 96
    assert n >= _SORT_MIN_N
    a = _render(sd, True, n, monkeypatch)
    b = _render(sd, False, n, monkeypatch)
    assert np.isfinite(a).all()
    assert a.shape == b.shape
    # Per-lane results are lane-position independent, so the two schedules
    # agree bit-for-bit on almost every lane.  NOT on all: XLA compiles the
    # two while-loop bodies differently (the sorted one contains the
    # permutation), and fusion/FMA reassociation shifts some f32 results by
    # ulps, which RR / lobe-choice comparisons amplify into different --
    # equally valid -- paths on a fraction of lanes (verified by replaying
    # the exact body eagerly: zero differing lanes).  A real permutation
    # bug (state misaligned across the sort) corrupts lanes wholesale, so
    # gate on: >= 99% lanes bit-equal AND the mean image unchanged.
    diff = (a != b).any(axis=-1)
    frac = diff.mean()
    assert frac < 0.01, f"wave sort changed {diff.sum()} lanes ({frac:.2%})"
    assert np.allclose(a.mean(axis=0), b.mean(axis=0), rtol=0.02, atol=0.02)
