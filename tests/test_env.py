"""Environment-map tests: RGBE round-trip, importance-sampling tables,
sampling/lookup consistency, and NEE unbiasedness.

Reference: skybox HDRI lookup scene.rs:95-111; the importance sampling
itself is a capability extension (SURVEY.md section 7 stage 5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from paths_tpu import sky as SK
from paths_tpu.scene.hdr_loader import load_hdr, write_hdr

_PI = np.pi


def _sun_sky(h=16, w=32, sun=(4, 7), sun_rad=100.0, base=0.1):
    img = np.full((h, w, 3), base, np.float32)
    img[sun[0], sun[1]] = sun_rad
    return img


def test_hdr_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0.01, 50.0, (8, 12, 3))).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    back = load_hdr(p)
    # RGBE shares one exponent across the three channels, so the error bound
    # is one mantissa step *of the pixel's max channel*.
    step = img.max(axis=-1, keepdims=True) / 255.0
    assert (np.abs(back - img) <= step + 1e-6).all()


def test_env_tables_pdf_identity():
    """p_texel * inv_pdf == omega_texel wherever p > 0, and the CDF is a
    proper distribution."""
    img = _sun_sky()
    sky_type, sky = SK.hdri(img)
    assert sky_type == SK.HDRI
    h, w = img.shape[:2]
    cdf = np.asarray(sky.env_cdf)
    assert cdf.shape == (h * w,)
    assert abs(cdf[-1] - 1.0) < 1e-6
    assert (np.diff(cdf) >= -1e-7).all()

    p = np.diff(np.concatenate([[0.0], cdf]))
    inv_pdf = np.asarray(sky.env_inv_pdf).reshape(-1)
    lat = _PI * (1.0 - (np.arange(h) + 0.5) / h)
    omega = ((_PI / h) * (2 * _PI / w) * np.maximum(np.sin(lat), 0.0))
    omega = np.repeat(omega, w)
    mask = p > 1e-9
    np.testing.assert_allclose((p * inv_pdf)[mask], omega[mask], rtol=1e-3)


def test_env_sample_hits_sun():
    """The bright texel must dominate the sample distribution and every
    sampled radiance must equal the map lookup at the sampled direction."""
    img = _sun_sky(sun_rad=1000.0)
    _, sky = SK.hdri(img)
    n = 4096
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    u3 = jax.random.uniform(k3, (n,))
    in_dir, inv_pdf, rad = SK.sample_env(sky, u1, u2, u3)
    in_dir, inv_pdf, rad = map(np.asarray, (in_dir, inv_pdf, rad))

    # Directions are unit.
    np.testing.assert_allclose(np.linalg.norm(in_dir, axis=-1), 1.0, atol=1e-5)

    # The sun texel carries ~1000/(1000 + 0.1*(H*W-1)*avg_sin)... just check
    # the majority of samples land on the sun radiance.
    frac_sun = (rad[:, 0] > 500).mean()
    assert frac_sun > 0.5

    # Lookup consistency: ambient_light at the sampled direction returns the
    # sampled radiance (same texel).
    look = np.asarray(SK.ambient_light(SK.HDRI, sky, jnp.asarray(in_dir)))
    np.testing.assert_allclose(look, rad, rtol=1e-5)


def test_env_mc_integral_unbiased():
    """MC estimate of the irradiance integral over the upper hemisphere with
    env importance sampling matches the analytic value for a constant map:
    E[L * max(0, n.(-dir)) * inv_pdf] over samples = pi * L."""
    img = np.full((16, 32, 3), 2.0, np.float32)
    _, sky = SK.hdri(img)
    n = 200_000
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    in_dir, inv_pdf, rad = SK.sample_env(
        sky,
        jax.random.uniform(k1, (n,)),
        jax.random.uniform(k2, (n,)),
        jax.random.uniform(k3, (n,)),
    )
    normal = jnp.asarray([0.0, 1.0, 0.0])
    cos = jnp.maximum(0.0, -in_dir[:, 1])  # shadow dir = -in_dir
    est = jnp.mean(rad[:, 0] * cos * inv_pdf)
    np.testing.assert_allclose(float(est), np.pi * 2.0, rtol=2e-2)


def _hdri_sphere_scene(img, env_nee):
    import dataclasses
    from paths_tpu.scene import desc as D
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.hdr_loader import write_hdr
    import tempfile, os

    tmp = tempfile.mkdtemp()
    hdr_path = os.path.join(tmp, "env.hdr")
    write_hdr(hdr_path, img)

    sd = D.SceneDescription()
    sd.skybox = D.SkyboxD(kind="hdri", filename=hdr_path)
    mat = D.MaterialD(kind="lambertian")
    mat.albedo = D.MaterialColourD(colour=D.ColourD(0.5, 0.5, 0.5))
    sd.objects = [D.ObjectD(shape_kind="sphere",
                            sphere=D.SphereD(D.Vec3D(0, 0, 0), 1.0),
                            material=mat)]
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(static, env_nee=env_nee, max_bounces=4)
    return static, scene


def test_env_nee_matches_plain_path_tracing():
    """A Lambertian sphere under a *constant* HDRI: env-NEE and plain
    skybox-on-miss must agree (both ~= albedo * sky for direct view)."""
    from paths_tpu import integrator as I

    img = np.full((8, 16, 3), 1.0, np.float32)
    n = 2048
    o = np.tile([0.0, 0.0, -5.0], (n, 1)).astype(np.float32)
    d = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    sid = jnp.zeros(n, jnp.uint32)

    results = {}
    for nee in (False, True):
        static, scene = _hdri_sphere_scene(img, nee)
        f = jax.jit(partial(I.trace_rays, static))
        col = np.asarray(f(scene, jnp.asarray(o), jnp.asarray(d), pid, sid, 0))
        assert np.isfinite(col).all()
        results[nee] = col.mean(axis=0)

    # Expected head-on radiance for a convex 0.5-albedo Lambertian sphere
    # under a uniform unit sky: the NEE estimator converges to
    # albedo/(pi)*integral(cos) = albedo = 0.5 (plus interreflection ~0).
    np.testing.assert_allclose(results[True], results[False], rtol=0.1)
    np.testing.assert_allclose(results[True], 0.5, rtol=0.1)
