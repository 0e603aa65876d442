"""Material dispatch tests (reference: src/material.rs).

Fresnel tests check the FresnelCombination blend (material.rs:421-427)
against hand-computed values and against the Gloss equivalence that holds
for the Lambertian+Mirror pair.
"""

import numpy as np
import jax
import jax.numpy as jnp

from paths_tpu import materials as M
from paths_tpu.math import vec


def _rec(mtype, albedo=(1.0, 1.0, 1.0), r0=0.0, metalness=0.0, roughness=0.0, n=4):
    return dict(
        mtype=jnp.full(n, mtype, jnp.int32),
        albedo=jnp.tile(jnp.asarray(albedo, jnp.float32), (n, 1)),
        emit=jnp.zeros((n, 3), jnp.float32),
        r0=jnp.full(n, r0, jnp.float32),
        metalness=jnp.full(n, metalness, jnp.float32),
        roughness=jnp.full(n, roughness, jnp.float32),
    )


def _add_fresnel(rec, fd_mtype, fs_mtype, fs_albedo=(1.0, 1.0, 1.0),
                 fs_r0=0.0, fs_metalness=0.0, fs_roughness=0.0,
                 refractive_index=1.5):
    n = rec["mtype"].shape[0]
    fr0 = ((1.0 - refractive_index) / (1.0 + refractive_index)) ** 2
    rec.update(
        fd_mtype=jnp.full(n, fd_mtype, jnp.int32),
        fs_mtype=jnp.full(n, fs_mtype, jnp.int32),
        fs_albedo=jnp.tile(jnp.asarray(fs_albedo, jnp.float32), (n, 1)),
        fs_r0=jnp.full(n, fs_r0, jnp.float32),
        fs_metalness=jnp.full(n, fs_metalness, jnp.float32),
        fs_roughness=jnp.full(n, fs_roughness, jnp.float32),
        fresnel_r0=jnp.full(n, fr0, jnp.float32),
    )
    return rec


def _dirs(n=4):
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    vec_out = vec.normalize(jnp.tile(jnp.asarray([0.3, 1.0, 0.1]), (n, 1)))
    vec_in = vec.normalize(jnp.tile(jnp.asarray([0.2, -1.0, -0.4]), (n, 1)))
    return normal, vec_out, vec_in


def test_fresnel_brdf_blend_hand_computed():
    """material.rs:421-427: brdf = diffuse*(1-r) + specular*r."""
    normal, vec_out, vec_in = _dirs()
    albedo = (0.8, 0.4, 0.2)
    rec = _rec(M.FRESNEL, albedo=albedo)
    rec = _add_fresnel(rec, fd_mtype=M.LAMBERTIAN, fs_mtype=M.MIRROR,
                       refractive_index=1.5)

    out = np.asarray(M.eval_brdf(rec, vec_out, vec_in, normal))

    r0 = ((1.0 - 1.5) / (1.0 + 1.5)) ** 2
    cos = float(np.asarray(vec.dot(vec_out, normal))[0])
    r = r0 + (1.0 - r0) * (1.0 - cos) ** 5
    lam = np.asarray(M.eval_lambertian_brdf(jnp.asarray(albedo), vec_in, normal))
    # Mirror brdf is BLACK (material.rs:268-271), so blend = lam * (1-r).
    np.testing.assert_allclose(out, lam * (1.0 - r), rtol=1e-5)


def test_fresnel_matches_gloss_for_lambertian_mirror_pair():
    """For diffuse=Lambertian, specular=Mirror, metalness=0:
    Fresnel brdf == Gloss brdf with r0 = fresnel_r0."""
    normal, vec_out, vec_in = _dirs()
    albedo = (0.6, 0.5, 0.4)
    fr0 = ((1.0 - 1.5) / (1.0 + 1.5)) ** 2

    fres = _rec(M.FRESNEL, albedo=albedo)
    fres = _add_fresnel(fres, M.LAMBERTIAN, M.MIRROR, refractive_index=1.5)
    gloss = _rec(M.GLOSS, albedo=albedo, r0=fr0, metalness=0.0)

    np.testing.assert_allclose(
        np.asarray(M.eval_brdf(fres, vec_out, vec_in, normal)),
        np.asarray(M.eval_brdf(gloss, vec_out, vec_in, normal)),
        rtol=1e-5,
    )


def test_fresnel_cook_torrance_specular_brdf():
    """Fresnel with a CookTorrance specular lobe blends the microfacet brdf
    (extension the reference parses, serde.rs:329-333, but would panic on in
    its sample path)."""
    normal, vec_out, vec_in = _dirs()
    rec = _rec(M.FRESNEL, albedo=(0.5, 0.5, 0.5))
    rec = _add_fresnel(rec, M.LAMBERTIAN, M.COOK_TORRANCE,
                       fs_albedo=(1.0, 0.9, 0.8), fs_roughness=0.3,
                       refractive_index=2.0)
    out = np.asarray(M.eval_brdf(rec, vec_out, vec_in, normal))

    r0 = ((1.0 - 2.0) / (1.0 + 2.0)) ** 2
    cos = float(np.asarray(vec.dot(vec_out, normal))[0])
    r = r0 + (1.0 - r0) * (1.0 - cos) ** 5
    lam = np.asarray(M.eval_lambertian_brdf(jnp.asarray([0.5, 0.5, 0.5]), vec_in, normal))
    ct = np.asarray(M.eval_cook_torrance_brdf(
        jnp.asarray([1.0, 0.9, 0.8]), jnp.asarray(0.3), vec_out, vec_in, normal
    ))
    np.testing.assert_allclose(out, lam * (1.0 - r) + ct * r, rtol=1e-4)


def test_fresnel_sample_unbiased_attenuation():
    """Mixture sampling: E[brdf/pdf * f(dir)] must match the blend.  With a
    Mirror specular lobe, the specular branch's attenuation is exactly 1
    (brdf = r, pdf = r), mirroring the Gloss accounting
    (material.rs:302-325)."""
    n = 4096
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    vec_out = vec.normalize(jnp.tile(jnp.asarray([0.0, 1.0, 0.5]), (n, 1)))
    rec = _rec(M.FRESNEL, albedo=(1.0, 1.0, 1.0), n=n)
    rec = _add_fresnel(rec, M.LAMBERTIAN, M.MIRROR, refractive_index=1.5)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    u_lobe = jax.random.uniform(k1, (n,))
    u1 = jax.random.uniform(k2, (n,))
    u2 = jax.random.uniform(k3, (n,))

    direction, pdf, brdf, is_spec = M.sample(rec, vec_out, normal, u_lobe, u1, u2)
    att = np.asarray(brdf / pdf[..., None])
    assert np.isfinite(att).all()
    # Hemispherical-reflectance estimate: E[att] == 1 for a white Fresnel
    # Lambertian+Mirror combination (energy conserving).
    np.testing.assert_allclose(att.mean(axis=0), 1.0, atol=0.05)
    # Specular picks reflect exactly.
    refl = np.asarray(vec.reflect(vec_out, normal))
    spec = np.asarray(is_spec)
    np.testing.assert_allclose(np.asarray(direction)[spec], refl[spec], atol=1e-6)


def test_fresnel_scene_builds_and_traces():
    """End-to-end: a YAML-style Fresnel material renders without NaN and
    brighter than pure Lambertian at grazing view (specular sky bounce)."""
    from functools import partial
    from paths_tpu.scene import desc as D
    from paths_tpu.scene.build import build_scene
    from paths_tpu import integrator as I

    def scene_with(mat):
        sd = D.SceneDescription()
        sd.skybox = D.SkyboxD(kind="flat", colour=D.ColourD(1.0, 1.0, 1.0))
        sd.objects = [D.ObjectD(shape_kind="sphere",
                                sphere=D.SphereD(D.Vec3D(0, 0, 0), 1.0),
                                material=mat)]
        return build_scene(sd)

    fres = D.MaterialD(kind="fresnel", refractive_index=1.5)
    fres.diffuse = D.MaterialD(kind="lambertian")
    fres.diffuse.albedo = D.MaterialColourD(colour=D.ColourD(0.5, 0.5, 0.5))
    fres.specular = D.MaterialD(kind="mirror")
    static, scene, _ = scene_with(fres)
    assert static.has_fresnel

    n = 256
    o = np.tile([0.0, 0.0, -5.0], (n, 1)).astype(np.float32)
    d = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    sid = jnp.zeros(n, jnp.uint32)
    f = jax.jit(partial(I.trace_rays, static))
    col = np.asarray(f(scene, jnp.asarray(o), jnp.asarray(d), pid, sid, 0))
    assert np.isfinite(col).all()
    assert (col >= 0.0).all()
    # A white sky and a 0.5-albedo diffuse+mirror combination must return
    # strictly more than the pure 0.5 Lambertian (mirror branch returns sky).
    lam = D.MaterialD(kind="lambertian")
    lam.albedo = D.MaterialColourD(colour=D.ColourD(0.5, 0.5, 0.5))
    static2, scene2, _ = scene_with(lam)
    f2 = jax.jit(partial(I.trace_rays, static2))
    col2 = np.asarray(f2(scene2, jnp.asarray(o), jnp.asarray(d), pid, sid, 0))
    assert col.mean() > col2.mean()
