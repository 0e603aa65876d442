"""Production forward == differentiable forward (VERDICT r1 item 7).

render_samples (the regenerating wavefront, paths_tpu/render.py:77) promises
in its docstring to equal the sum of the individual render_wave calls (the
fixed-schedule differentiable path): same RNG identity
(pixel, sample, bounce, dim), same physics, same decisions -- only the
execution schedule differs.  These are two independent implementations of
the bounce loop sharing path_step; this test pins them together so a
regression in the regeneration bookkeeping (slot/bounce/done masking) cannot
bias production renders while the gradient tests stay green.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from paths_tpu import camera as C
from paths_tpu.render import render_samples, render_wave
from paths_tpu.scene.build import build_scene
from paths_tpu.scene.stress import generate_stress_scene, generate_mixed_scene


def _lanes(W, H):
    pix = np.arange(W * H, dtype=np.uint32)
    return (
        jnp.asarray((pix % W).astype(np.int32)),
        jnp.asarray((pix // W).astype(np.int32)),
        jnp.asarray(pix),
    )


def _check_equiv(static, scene, cam, n_samples=3, seed=5, start=1):
    W, H = 24, 16
    cam = C.resize(cam, W, H)
    px, py, pid = _lanes(W, H)

    total = render_samples(
        static, scene, cam, px, py, pid, jnp.uint32(start), n_samples, seed
    )
    waves = sum(
        render_wave(
            static, scene, cam, px, py, pid,
            jnp.full(px.shape, start + s, jnp.uint32), seed,
        )
        for s in range(n_samples)
    )
    # Identical paths and decisions; differences are float addition order
    # (the regenerating schedule banks each sample the iteration it
    # finishes, the wave sum adds them sample-major).
    np.testing.assert_allclose(
        np.asarray(total), np.asarray(waves), rtol=1e-4, atol=1e-6
    )


def test_render_samples_equals_sum_of_waves_stress():
    sd = generate_stress_scene(16, seed=0)
    static, scene, cam = build_scene(sd)
    # Full bounce depth: the regeneration bookkeeping's hard cases are the
    # bounce cap and RR kills, both of which need depth > RR_START.
    static = dataclasses.replace(static, max_bounces=4)
    _check_equiv(static, scene, cam)


def test_render_samples_equals_sum_of_waves_mixed(tmp_path):
    """Mesh + spheres + area light: covers the triangle path and NEE."""
    sd = generate_mixed_scene(str(tmp_path))
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(static, max_bounces=3)
    _check_equiv(static, scene, cam, n_samples=2)
