"""Skybox / environment lighting.

Reference: src/scene.rs:68-113.  Three sky models: Flat, Gradient, Hdri
(equirectangular).  NB the integrator evaluates the sky at the *negated*
ray direction (trace.rs:21: ``ambient_light(ray.direction * -1)``) -- the
gradient therefore reads upside-down relative to intuition; we reproduce
that at the call site in the integrator, not here.

Sky type is static per scene (compile-time); colours / the HDRI image are
dynamic arrays and fully differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from paths_tpu.math import vec

FLAT = 0
GRADIENT = 1
HDRI = 2

_PI = 3.141592653589793


class Sky(NamedTuple):
    # colour_a: flat colour / overhead colour; colour_b: horizon colour.
    colour_a: jnp.ndarray  # (3,)
    colour_b: jnp.ndarray  # (3,)
    image: jnp.ndarray  # (H, W, 3) HDRI data (1x1 zeros when unused)


def flat(colour) -> tuple[int, Sky]:
    z = jnp.zeros((3,), jnp.float32)
    return FLAT, Sky(jnp.asarray(colour, jnp.float32), z, jnp.zeros((1, 1, 3), jnp.float32))


def gradient(overhead, horizon) -> tuple[int, Sky]:
    return GRADIENT, Sky(
        jnp.asarray(overhead, jnp.float32),
        jnp.asarray(horizon, jnp.float32),
        jnp.zeros((1, 1, 3), jnp.float32),
    )


def hdri(image) -> tuple[int, Sky]:
    z = jnp.zeros((3,), jnp.float32)
    return HDRI, Sky(z, z, jnp.asarray(image, jnp.float32))


def ambient_light(sky_type: int, sky: Sky, direction: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sky radiance for (..., 3) directions (scene.rs:88-113).
    ``sky_type`` is a static python int."""
    if sky_type == FLAT:
        return jnp.broadcast_to(sky.colour_a, direction.shape)
    if sky_type == GRADIENT:
        cos_theta = direction[..., 1:2]
        return sky.colour_a * cos_theta + sky.colour_b * (1.0 - cos_theta)
    # HDRI equirectangular lookup (scene.rs:95-111).
    h, w = sky.image.shape[0], sky.image.shape[1]
    y_clamped = jnp.clip(direction[..., 1], -1.0, 1.0)
    lat = jnp.arccos(y_clamped)  # [0, pi]
    long = jnp.arctan2(direction[..., 2], direction[..., 0])  # (-pi, pi]
    x = (w / 2.0) * (long / _PI) + w / 2.0
    y = h * (1.0 - lat / _PI)
    # Rust `as u32` truncates toward zero; inputs are >= 0 here.
    x_pix = jnp.minimum(w - 1, jnp.floor(x)).astype(jnp.int32)
    y_pix = jnp.minimum(h - 1, jnp.floor(y)).astype(jnp.int32)
    return sky.image[y_pix, x_pix]
