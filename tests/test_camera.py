"""Thin-lens camera tests: f64 numpy replication of the reference's numeric
contract (camera.rs:47-94, SURVEY.md 3.4) vs the vectorised f32 kernel."""

import numpy as np
import jax.numpy as jnp

from paths_tpu.camera import make_camera, get_rays
from paths_tpu.math import matrix as mat


def _reference_ray(camD, x, y, sq, dk):
    """Direct f64 port of Camera::get_ray_for_pixel (camera.rs:47-94)."""
    width, height = camD["width"], camD["height"]
    x = width - x - 1
    y = height - y - 1
    f = camD["focal_length"]
    v = camD["distance_from_lens"]
    p = (f * v) / (v - f)
    x_offset, y_offset = sq
    x_scale = camD["sensor_width"] / width
    y_scale = camD["sensor_height"] / height
    image_x = x - width / 2.0 + x_offset
    image_y = height / 2.0 - y - y_offset
    k = np.array([image_x * x_scale, image_y * y_scale, -v])
    aperture_radius = f / camD["aperture"]
    l = np.array([dk[0] * aperture_radius, dk[1] * aperture_radius, 0.0])
    d = -(k * (p / v) + l)
    norm_dir = d / np.linalg.norm(d)
    R = camD["rot"]
    origin = R @ l + camD["location"]
    direction = R @ norm_dir
    return origin, direction, norm_dir[2]


def _make(camD):
    return make_camera(
        width=camD["width"],
        height=camD["height"],
        location=camD["location"],
        orientation=camD["orientation"],
        sensor_width=camD["sensor_width"],
        sensor_height=camD["sensor_height"],
        focal_length=camD["focal_length"],
        focus_distance=camD["focus_distance"],
        aperture=camD["aperture"],
    )


def test_rays_match_reference_formula():
    camD = dict(
        width=720, height=480,
        location=np.array([3.0, 8.0, -15.0]),
        orientation=(0.4, -0.2, 0.0),  # pitch, yaw, roll
        sensor_width=0.036, sensor_height=0.024,
        focal_length=0.05, focus_distance=15.0, aperture=8.0,
    )
    camD["distance_from_lens"] = (
        camD["focal_length"] * camD["focus_distance"]
        / (camD["focus_distance"] - camD["focal_length"])
    )
    pitch, yaw, roll = camD["orientation"]
    camD["rot"] = mat.camera_rotation(yaw, pitch, roll)

    cam = _make(camD)

    cases = [
        (0, 0, (0.0, 0.0), (0.0, 0.0)),
        (360, 240, (0.5, 0.5), (0.0, 0.0)),
        (719, 479, (0.9, 0.1), (0.3, -0.4)),
        (100, 400, (0.25, 0.75), (-0.5, 0.5)),
    ]
    px = jnp.array([c[0] for c in cases], jnp.int32)
    py = jnp.array([c[1] for c in cases], jnp.int32)
    sq = (jnp.array([c[2][0] for c in cases]), jnp.array([c[2][1] for c in cases]))
    dk = (jnp.array([c[3][0] for c in cases]), jnp.array([c[3][1] for c in cases]))
    o, d, w = get_rays(cam, px, py, sq, dk)

    for i, (x, y, s, k) in enumerate(cases):
        eo, ed, ew = _reference_ray(camD, x, y, s, k)
        np.testing.assert_allclose(np.asarray(o)[i], eo, atol=1e-4)
        np.testing.assert_allclose(np.asarray(d)[i], ed, atol=1e-5)
        np.testing.assert_allclose(float(w[i]), ew, atol=1e-5)


def test_sensor_weight_is_cosine():
    cam = _make(
        dict(width=64, height=64, location=np.zeros(3), orientation=(0, 0, 0),
             sensor_width=0.036, sensor_height=0.036, focal_length=0.05,
             focus_distance=10.0, aperture=8.0)
    )
    px = jnp.array([32], jnp.int32)
    py = jnp.array([32], jnp.int32)
    z = jnp.array([0.5])
    o, d, w = get_rays(cam, px, py, (z, z), (jnp.zeros(1), jnp.zeros(1)))
    # Center pixel, no lens offset: weight ~ 1.
    assert float(w[0]) > 0.999
