"""End-to-end parity of the production Pallas path vs the XLA fallback.

PATHS_TPU_FORCE_PALLAS=1 makes build_scene pack the Pallas tables and run
the kernels in interpret mode on CPU -- the exact integrator branches that
execute on TPU (sorted triangle traversal, chunked sphere kernels, one-hot
table selection, Pallas occlusion queries).  A full render over a mixed
sphere+mesh scene with a sphere light must match the fallback integrator.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from paths_tpu.scene import desc as D


def _mixed_scene(tmp_path):
    """Spheres + a ~128-tri mesh + sphere light, small but material-diverse."""
    # Bumpy grid mesh as OBJ (>64 tris so the Pallas path engages).
    n = 9
    xs = np.linspace(-2, 2, n)
    zs = np.linspace(-2, 2, n)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = 0.3 * np.sin(2 * X) * np.cos(2 * Z)
    lines = []
    for i in range(n):
        for j in range(n):
            lines.append(f"v {X[i,j]} {Y[i,j]} {Z[i,j]}")
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j + 1
            b = (i + 1) * n + j + 1
            c = i * n + j + 2
            d = (i + 1) * n + j + 2
            lines.append(f"f {a} {b} {c}")
            lines.append(f"f {c} {b} {d}")
    obj_path = tmp_path / "grid.obj"
    obj_path.write_text("\n".join(lines) + "\n")

    sd = D.SceneDescription()
    sd.camera = D.CameraD(
        image_width=16, image_height=16,
        location=D.Vec3D(0.0, 2.0, -6.0),
        orientation=D.RotationD(pitch=0.3, yaw=0.0, roll=0.0),
        sensor_width=0.036, sensor_height=0.024,
        focal_length=0.05, focus_distance=6.0, aperture=8.0,
    )
    sd.skybox = D.SkyboxD(
        kind="gradient",
        overhead_colour=D.ColourD(0.2, 0.3, 0.7),
        horizon_colour=D.ColourD(0.7, 0.7, 0.8),
    )
    sd.models = {"grid": str(obj_path)}
    sd.objects = [
        D.ObjectD(
            shape_kind="mesh",
            mesh=D.MeshD(model="grid", smooth_normals=True, scale=1.0),
            material=D.MaterialD(
                kind="gloss",
                albedo=D.MaterialColourD(colour=D.ColourD(0.7, 0.4, 0.3)),
                reflectance=0.1, metalness=0.0,
            ),
        ),
        D.ObjectD(
            shape_kind="sphere",
            sphere=D.SphereD(center=D.Vec3D(1.0, 1.0, 0.0), radius=0.7),
            material=D.MaterialD(kind="mirror"),
        ),
        D.ObjectD(
            shape_kind="sphere",
            sphere=D.SphereD(center=D.Vec3D(-1.2, 0.8, 0.5), radius=0.5),
            material=D.MaterialD(
                kind="lambertian",
                albedo=D.MaterialColourD(colour=D.ColourD(0.3, 0.6, 0.3)),
            ),
        ),
    ]
    sd.lights = [
        D.LightD(kind="sphere", position=D.Vec3D(0.0, 6.0, -1.0),
                 radius=0.8, colour=D.ColourD(1, 1, 1), intensity=40.0),
    ]
    sd.base_dir = str(tmp_path)
    return sd


def _render(sd, force: bool):
    import importlib
    from paths_tpu.scene import build as B

    old = os.environ.get("PATHS_TPU_FORCE_PALLAS")
    os.environ["PATHS_TPU_FORCE_PALLAS"] = "1" if force else "0"
    try:
        static, scene, cam = B.build_scene(sd)
        import dataclasses

        static = dataclasses.replace(static, max_bounces=3)
        if force:
            assert static.pallas_tri_chunks > 0, "mesh must take the Pallas path"
            assert static.pallas_interpret
        else:
            assert static.pallas_tri_chunks == 0
        from paths_tpu.render import render_wave

        W, H = 16, 16
        pix = np.arange(W * H, dtype=np.uint32)
        px = jnp.asarray((pix % W).astype(np.int32))
        py = jnp.asarray((pix // W).astype(np.int32))
        pid = jnp.asarray(pix)
        sid = jnp.zeros(W * H, jnp.uint32)
        out = []
        for s in range(2):
            out.append(np.asarray(render_wave(
                static, scene, cam, px, py, pid,
                sid + np.uint32(s), 7,
            )))
        return np.stack(out)
    finally:
        if old is None:
            os.environ.pop("PATHS_TPU_FORCE_PALLAS", None)
        else:
            os.environ["PATHS_TPU_FORCE_PALLAS"] = old


def test_forced_pallas_matches_fallback(tmp_path):
    sd = _mixed_scene(tmp_path)
    ref = _render(sd, force=False)
    pal = _render(sd, force=True)
    assert np.isfinite(pal).all()
    # Same RNG decisions, same physics; differences are f32 order-of-ops
    # (double-single sphere path vs plain-f32 kernel on grazing rays).
    close = np.isclose(pal, ref, rtol=1e-3, atol=1e-3)
    frac = close.mean()
    assert frac > 0.995, f"only {frac:.4f} of samples match"
