"""Cross-implementation golden gate (VERDICT r2 item 4).

The JAX renderer and the native C++ CPU tracer (paths_tpu/native/
cpu_tracer.cc) are two independent implementations of the reference's
algorithm -- different language, different acceleration structure, different
RNG, different integrator formulation (wavefront SPMD vs scalar recursion).
Agreement of their converged means is therefore evidence of correctness
that same-renderer goldens (test_golden.py) structurally cannot provide: a
systematic error shared by nothing but the physics would have to be
implemented twice, independently, identically.  This is the mechanical form
of the reference's "matches Mitsuba" standard
(/root/reference/README.md:39).

Tolerances: global channel means are MC estimates with ~1/sqrt(n_pixels *
spp) relative error; 8x4-tile means (region check) carry more variance.
Bounds are ~4 sigma calibrated from independent-seed runs.
"""

import dataclasses

import numpy as np
import pytest

from paths_tpu import camera as C
from paths_tpu import native
from paths_tpu.render import render_image
from paths_tpu.scene.build import build_scene
from paths_tpu.scene.yaml_loader import load_scene_description

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

SCENES = {
    # name: (path, spp, max_bounces, mean_rtol, tile_rtol)
    "spheres_on_plane": (
        "/root/reference/scenes/spheres_on_plane.yml", 48, 5, 0.02, 0.06),
    "teapot": ("/root/reference/scenes/teapot.yml", 48, 4, 0.02, 0.12),
}
W, H = 48, 32


@pytest.mark.parametrize("name", sorted(SCENES))
def test_converged_means_match_oracle(name):
    path, spp, mb, mean_rtol, tile_rtol = SCENES[name]
    sd = load_scene_description(path)
    static, arrays, cam = build_scene(sd)
    static = dataclasses.replace(static, max_bounces=mb)
    cam = C.resize(cam, W, H)

    oracle = native.cpu_render(static, arrays, cam, W, H, 4 * spp, seed=11,
                               n_threads=4, max_bounces=mb)
    assert oracle is not None
    img = np.asarray(render_image(static, arrays, cam, W, H, spp=spp, seed=0))

    # Global channel means.
    m_o = oracle.mean(axis=(0, 1))
    m_j = img.mean(axis=(0, 1))
    np.testing.assert_allclose(m_j, m_o, rtol=mean_rtol)

    # Region check: 8x4 tile means -- catches spatially-local systematic
    # errors (e.g. a wrong material on one object) that global means hide.
    def tiles(a):
        return a.reshape(4, H // 4, 8, W // 8, 3).mean(axis=(1, 3))

    t_o = tiles(oracle)
    t_j = tiles(img)
    # Relative to the image mean so near-black tiles don't explode the
    # ratio; MC tile error is absolute-scale anyway.
    scale = float(m_o.mean())
    err = np.abs(t_j - t_o) / scale
    assert err.max() < tile_rtol, f"max tile error {err.max():.4f}"
