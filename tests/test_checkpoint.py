"""Checkpoint/resume tests: an interrupted render resumed from a checkpoint
must be bit-identical to an uninterrupted one (possible because all
randomness is counter-based, sampling/hashing.py)."""

import numpy as np
import pytest

from paths_tpu.checkpoint import save_checkpoint, load_checkpoint
from paths_tpu.render import Estimator, render_image
from paths_tpu.scene.build import build_scene
from paths_tpu.scene.stress import generate_stress_scene


@pytest.fixture(scope="module")
def small_scene():
    import dataclasses

    sd = generate_stress_scene(8, seed=1)
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(static, max_bounces=3)
    from paths_tpu import camera as C

    return static, scene, C.resize(cam, 24, 16)


def test_checkpoint_round_trip(tmp_path):
    est = Estimator(7, 5)
    rng = np.random.default_rng(0)
    est.sum[:] = rng.uniform(size=(5, 7, 3))
    est.count[:] = rng.integers(0, 100, (5, 7))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, est, next_sample=12, seed=42)
    est2, next_sample, seed = load_checkpoint(p)
    assert (next_sample, seed) == (12, 42)
    np.testing.assert_array_equal(est2.sum, est.sum)
    np.testing.assert_array_equal(est2.count, est.count)


def test_checkpoint_rejects_foreign_file(tmp_path):
    p = str(tmp_path / "bogus.npz")
    np.savez(p, a=np.zeros(3))
    with pytest.raises(ValueError):
        load_checkpoint(p)


def test_resumed_render_bit_identical(tmp_path, small_scene):
    static, scene, cam = small_scene
    W, H = 24, 16

    # Uninterrupted: 8 samples.
    img_full = render_image(static, scene, cam, W, H, spp=8, seed=3,
                            sample_batch=4)

    # Interrupted after 4 samples, checkpointed, resumed in a fresh
    # estimator state.
    p = str(tmp_path / "ck.npz")
    est = Estimator(W, H)
    render_image(static, scene, cam, W, H, spp=4, seed=3, est=est,
                 sample_batch=4)
    save_checkpoint(p, est, next_sample=4, seed=3)

    est2, start, seed = load_checkpoint(p)
    img_resumed = render_image(static, scene, cam, W, H, spp=8, seed=seed,
                               est=est2, start_sample=start, sample_batch=4)

    np.testing.assert_array_equal(img_resumed, img_full)
