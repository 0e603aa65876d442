"""Differentiability gates (BASELINE.json north star): autodiff pixel
gradients must match central finite differences computed with common random
numbers -- same seed means FD and autodiff follow identical paths, so the
comparison is tight, not statistical."""

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paths_tpu import camera as C
from paths_tpu import grad as G
from paths_tpu.scene import desc as D
from paths_tpu.scene.build import build_scene
from paths_tpu.scene.stress import generate_stress_scene


def _wave_args(cam, n=256, W=16):
    H = max(1, n // W)
    cam = C.resize(cam, W, H)
    pix = np.arange(n, dtype=np.uint32)
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W % H).astype(np.int32))
    pid = jnp.asarray(pix)
    sid = jnp.zeros(n, jnp.uint32)
    return cam, px, py, pid, sid


def _mean_lum(static, scene, params, cam, px, py, pid, sid):
    col = G.render_with_params(static, scene, params, cam, px, py, pid, sid, 0)
    return jnp.mean(col)


def _fd_check(static, scene, cam, field, index, rel_tol, eps=2e-3, sky=False):
    cam, px, py, pid, sid = _wave_args(cam)
    params = G.get_params(scene)
    f = jax.jit(partial(_mean_lum, static, scene))

    grad_fn = jax.jit(jax.grad(partial(_mean_lum, static, scene)))
    g = grad_fn(params, cam, px, py, pid, sid)
    g_val = float((g["sky"][field] if sky else g[field])[index])

    def with_delta(d):
        p = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in params.items()}
        if sky:
            p["sky"] = dict(p["sky"])
            p["sky"][field] = p["sky"][field].at[index].add(d)
        else:
            p[field] = p[field].at[index].add(d)
        return float(f(p, cam, px, py, pid, sid))

    fd = (with_delta(eps) - with_delta(-eps)) / (2 * eps)
    assert np.isfinite(g_val)
    np.testing.assert_allclose(g_val, fd, rtol=rel_tol, atol=1e-5)
    return g_val


@pytest.fixture(scope="module")
def stress8():
    sd = generate_stress_scene(8, seed=2)
    static, scene, cam = build_scene(sd)
    return dataclasses.replace(static, max_bounces=3), scene, cam


@pytest.fixture(scope="module")
def lit_sphere():
    sd = D.SceneDescription()
    sd.skybox = D.SkyboxD(kind="gradient",
                          overhead_colour=D.ColourD(0.2, 0.3, 0.5),
                          horizon_colour=D.ColourD(0.8, 0.7, 0.6))
    mat = D.MaterialD(kind="lambertian")
    mat.albedo = D.MaterialColourD(colour=D.ColourD(0.5, 0.4, 0.3))
    sd.objects = [D.ObjectD(shape_kind="sphere",
                            sphere=D.SphereD(D.Vec3D(0, 0, 3), 1.0),
                            material=mat)]
    sd.lights = [D.LightD(kind="sphere", position=D.Vec3D(3, 3, 0), radius=0.5,
                          colour=D.ColourD(1.0, 0.9, 0.8), intensity=2.0)]
    static, scene, cam = build_scene(sd)
    return dataclasses.replace(static, max_bounces=3), scene, cam


def test_fd_albedo(lit_sphere):
    static, scene, cam = lit_sphere
    g = _fd_check(static, scene, cam, "mat_albedo", (0, 0), rel_tol=5e-3)
    assert g > 0  # brighter albedo -> brighter pixel


def test_fd_light_intensity(lit_sphere):
    static, scene, cam = lit_sphere
    g = _fd_check(static, scene, cam, "light_intensity", (0,), rel_tol=5e-3)
    assert g > 0


def test_fd_light_colour(lit_sphere):
    static, scene, cam = lit_sphere
    _fd_check(static, scene, cam, "light_colour", (0, 1), rel_tol=5e-3)


def test_fd_sky_colour(lit_sphere):
    static, scene, cam = lit_sphere
    g = _fd_check(static, scene, cam, "colour_a", (2,), rel_tol=5e-3, sky=True)
    assert g > 0


def test_fd_stress_scene_albedo(stress8):
    """Gradients through the multi-material stress scene (gloss + mirror +
    lambertian mix, RR active)."""
    static, scene, cam = stress8
    for e in range(3):
        _fd_check(static, scene, cam, "mat_albedo", (e, 0), rel_tol=2e-2)


def test_inverse_rendering_recovers_albedo(lit_sphere):
    """End-to-end gate: gradient descent on the l2 loss recovers a perturbed
    albedo (the inverse-rendering loop the sharded train step runs)."""
    static, scene, cam = lit_sphere
    cam, px, py, pid, sid = _wave_args(cam, n=512)

    target_params = G.get_params(scene)
    render = jax.jit(partial(G.render_with_params, static, scene))
    target = render(target_params, cam, px, py, pid, sid, 0)

    params = jax.tree.map(lambda x: x, target_params)
    params["mat_albedo"] = params["mat_albedo"].at[0].set(
        jnp.asarray([0.9, 0.1, 0.9]))

    loss_fn = jax.jit(
        lambda p: jnp.mean((render(p, cam, px, py, pid, sid, 0) - target) ** 2))
    grad_fn = jax.jit(jax.grad(
        lambda p: jnp.mean((render(p, cam, px, py, pid, sid, 0) - target) ** 2)))

    losses = [float(loss_fn(params))]
    for _ in range(40):
        g = grad_fn(params)
        params["mat_albedo"] = params["mat_albedo"] - 2.0 * g["mat_albedo"]
        losses.append(float(loss_fn(params)))

    assert losses[-1] < losses[0] * 1e-2
    np.testing.assert_allclose(
        np.asarray(params["mat_albedo"][0]),
        np.asarray(target_params["mat_albedo"][0]),
        atol=0.05,
    )


def test_forced_pallas_grads_match_xla(tmp_path):
    """Backend gradient parity (VERDICT r4 item 4): loss_and_grad through
    the forced-Pallas integrator (interpret mode, mixed sphere+mesh scene)
    must match the XLA-fallback grads for EVERY supported PARAM_FIELD.

    The Pallas launchers stop_gradient traversal inputs, but PARAM_FIELDS
    enter only through shading, which both backends recompute from
    SceneArrays at the returned hit -- so parameter grads must agree up to
    f32 order-of-ops at grazing hits (see grad.py's backend-cut note;
    geometry derivatives are the XLA-only exception, by design)."""
    import os

    from paths_tpu.scene.stress import generate_mixed_scene

    sd = generate_mixed_scene(str(tmp_path))
    builds = {}
    for force in (True, False):
        os.environ["PATHS_TPU_FORCE_PALLAS"] = "1" if force else "0"
        try:
            st, sc, cm = build_scene(sd)
            builds[force] = (dataclasses.replace(st, max_bounces=3), sc, cm)
        finally:
            os.environ.pop("PATHS_TPU_FORCE_PALLAS", None)
    static_p, scene_p, cam = builds[True]
    static_f, scene_f, _ = builds[False]
    assert static_p.pallas_tri_chunks > 0 and static_p.pallas_interpret
    assert static_f.pallas_tri_chunks == 0

    cam, px, py, pid, sid = _wave_args(cam)
    target = jnp.zeros((px.shape[0], 3))
    loss_p, g_p = G.loss_and_grad(
        static_p, scene_p, cam, px, py, pid, sid, 0, target
    )
    loss_f, g_f = G.loss_and_grad(
        static_f, scene_f, cam, px, py, pid, sid, 0, target
    )
    np.testing.assert_allclose(float(loss_p), float(loss_f), rtol=1e-4)

    # NB the Pallas build morton-sorts kernel spheres / BVH-orders
    # triangles, so per-PRIMITIVE arrays are permuted between builds; all
    # PARAM_FIELDS are per-ENTITY or per-light except tri_vc*, whose order
    # follows the triangle permutation.  Compare entity/light fields
    # directly and tri_vc* as permutation-invariant sums.
    flat_p = g_p
    flat_f = g_f
    for field in G.PARAM_FIELDS:
        a, b = np.asarray(flat_p[field]), np.asarray(flat_f[field])
        if field.startswith("tri_vc"):
            a, b = a.sum(axis=0), b.sum(axis=0)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=1e-5,
            err_msg=f"grad mismatch for {field}",
        )
    for field in G.SKY_PARAM_FIELDS:
        np.testing.assert_allclose(
            np.asarray(flat_p["sky"][field]), np.asarray(flat_f["sky"][field]),
            rtol=2e-3, atol=1e-5, err_msg=f"sky grad mismatch for {field}",
        )
