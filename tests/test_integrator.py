"""Integrator semantics tests: analytic cases derived from trace.rs.

These avoid Monte-Carlo noise where possible by constructing scenes whose
radiance is exact (convex Lambertian sphere under a flat sky: one bounce,
radiance = albedo * sky)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from paths_tpu import integrator as I
from paths_tpu.scene import desc as D
from paths_tpu.scene.build import build_scene


def _simple_scene(albedo=(0.5, 0.5, 0.5), sky=(1.0, 1.0, 1.0), material="lambertian",
                  lights=()):
    sd = D.SceneDescription()
    sd.skybox = D.SkyboxD(kind="flat", colour=D.ColourD(*sky))
    mat = D.MaterialD(kind=material)
    mat.albedo = D.MaterialColourD(colour=D.ColourD(*albedo))
    sd.objects = [
        D.ObjectD(shape_kind="sphere", sphere=D.SphereD(D.Vec3D(0, 0, 0), 1.0), material=mat)
    ]
    sd.lights = list(lights)
    return build_scene(sd)


def _trace(static, scene, o, d, n=None, seed=0):
    N = o.shape[0]
    pid = jnp.arange(N, dtype=jnp.uint32)
    sid = jnp.zeros(N, jnp.uint32)
    f = jax.jit(partial(I.trace_rays, static))
    return np.asarray(f(scene, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), pid, sid, seed))


def test_miss_returns_sky():
    static, scene, cam = _simple_scene(sky=(0.25, 0.5, 0.75))
    o = np.tile([0.0, 0.0, -5.0], (8, 1))
    d = np.tile([0.0, 1.0, 0.0], (8, 1))  # up: misses the unit sphere
    col = _trace(static, scene, o, d)
    np.testing.assert_allclose(col, np.tile([0.25, 0.5, 0.75], (8, 1)), atol=1e-6)


def test_lambertian_sphere_flat_sky_exact():
    """Convex Lambertian sphere under flat white sky: every path bounces
    exactly once (the sampled hemisphere direction always escapes), so
    radiance == albedo exactly (attenuation brdf/pdf == albedo)."""
    albedo = (0.25, 0.5, 0.75)
    static, scene, cam = _simple_scene(albedo=albedo)
    rng = np.random.default_rng(0)
    N = 256
    o = np.tile([0.0, 0.0, -5.0], (N, 1))
    # Aim at the sphere with small jitter.
    tgt = rng.uniform(-0.4, 0.4, (N, 3)) * [1, 1, 0]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    col = _trace(static, scene, o, d)
    np.testing.assert_allclose(col, np.tile(albedo, (N, 1)), atol=1e-5)


def test_mirror_sphere_reflects_sky():
    """Mirror under flat sky: radiance == sky exactly (brdf/pdf == 1)."""
    static, scene, cam = _simple_scene(material="mirror", sky=(0.3, 0.6, 0.9))
    o = np.array([[0.0, 0.0, -5.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    col = _trace(static, scene, o, d)
    np.testing.assert_allclose(col, [[0.3, 0.6, 0.9]], atol=1e-6)


def test_facing_check_kills_grazing():
    # cos_in <= 0 -> path terminates with BLACK (trace.rs:25-28).
    # A ray exactly tangent can't be constructed robustly; instead verify a
    # normal path does NOT return black (sanity inverse).
    static, scene, cam = _simple_scene(albedo=(1, 0, 0))
    o = np.array([[0.0, 0.0, -5.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    col = _trace(static, scene, o, d)
    assert col[0, 0] > 0.9


def test_point_light_direct_illumination():
    """Lambertian sphere + point light, single NEE contribution check.

    Surface point (0,0,-1) (front of unit sphere), normal (0,0,-1); light at
    (0,0,-3): direct = I * albedo * cos/pi with cos = 1."""
    light = D.LightD(kind="point", position=D.Vec3D(0, 0, -3),
                     colour=D.ColourD(1, 1, 1), intensity=2.0)
    static, scene, cam = _simple_scene(albedo=(0.5, 0.5, 0.5), sky=(0, 0, 0),
                                       lights=[light])
    o = np.array([[0.0, 0.0, -5.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    col = _trace(static, scene, o, d)
    expected = 2.0 * 0.5 / np.pi  # I * albedo * cos(0) / pi
    np.testing.assert_allclose(col[0], [expected] * 3, atol=1e-5)


def test_sphere_light_direct_hit_specular():
    """A mirror path hitting a sphere light directly accumulates
    colour*intensity (trace.rs:30-41)."""
    light = D.LightD(kind="sphere", position=D.Vec3D(0, 0, 5), radius=1.0,
                     colour=D.ColourD(1.0, 0.5, 0.25), intensity=3.0)
    sd = D.SceneDescription()
    sd.skybox = D.SkyboxD(kind="flat", colour=D.ColourD(0, 0, 0))
    sd.lights = [light]
    sd.objects = [D.ObjectD(shape_kind="sphere",
                            sphere=D.SphereD(D.Vec3D(100, 0, 0), 1.0),
                            material=D.MaterialD(kind="lambertian"))]
    static, scene, cam = build_scene(sd)
    o = np.array([[0.0, 0.0, -5.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    col = _trace(static, scene, o, d)
    np.testing.assert_allclose(col[0], np.array([1.0, 0.5, 0.25]) * 3.0, atol=1e-5)


def test_deterministic():
    static, scene, cam = _simple_scene()
    o = np.tile([0.0, 0.0, -5.0], (32, 1))
    d = np.tile([0.0, 0.0, 1.0], (32, 1))
    c1 = _trace(static, scene, o, d, seed=7)
    c2 = _trace(static, scene, o, d, seed=7)
    np.testing.assert_array_equal(c1, c2)


def test_no_nans_gloss():
    static, scene, cam = _simple_scene(material="gloss")
    rng = np.random.default_rng(3)
    N = 128
    o = np.tile([0.0, 0.0, -5.0], (N, 1))
    tgt = rng.uniform(-0.9, 0.9, (N, 3)) * [1, 1, 0]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    col = _trace(static, scene, o, d)
    assert np.isfinite(col).all()
