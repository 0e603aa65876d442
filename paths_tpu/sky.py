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
    # Environment importance sampling tables (capability upgrade over the
    # reference, which only evaluates the skybox on miss; SURVEY.md section 7
    # stage 5).  env_cdf: flat (H*W,) inclusive CDF over luminance x
    # sin(latitude); env_inv_pdf: (H, W) reciprocal solid-angle pdf per
    # texel (0 where the texel has no energy).
    env_cdf: jnp.ndarray  # (H*W,) f32
    env_inv_pdf: jnp.ndarray  # (H, W) f32


def _no_env():
    # Built lazily, not at module import: import-time device constants bind
    # to whatever platform is active at import and are re-fetched at every
    # jit lowering (see integrator.py BIG).
    return (jnp.ones((1,), jnp.float32), jnp.zeros((1, 1), jnp.float32))


def flat(colour) -> tuple[int, Sky]:
    z = jnp.zeros((3,), jnp.float32)
    return FLAT, Sky(jnp.asarray(colour, jnp.float32), z,
                     jnp.zeros((1, 1, 3), jnp.float32), *_no_env())


def gradient(overhead, horizon) -> tuple[int, Sky]:
    return GRADIENT, Sky(
        jnp.asarray(overhead, jnp.float32),
        jnp.asarray(horizon, jnp.float32),
        jnp.zeros((1, 1, 3), jnp.float32),
        *_no_env(),
    )


def hdri(image) -> tuple[int, Sky]:
    """Build the HDRI sky plus its importance-sampling tables.

    The per-texel weight is luminance x sin(latitude) (the texel's
    solid-angle share of the equirectangular map); the flat CDF over all
    texels makes sampling a single searchsorted, and env_inv_pdf converts
    the discrete texel probability to a reciprocal solid-angle density:
      inv_pdf = omega_texel / p_texel,  omega_texel = (pi/H)(2pi/W) sin(lat).
    """
    import numpy as np

    img = np.asarray(image, np.float32)
    h, w = img.shape[0], img.shape[1]
    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    # Row y maps to latitude via the lookup in ambient_light:
    # y = h*(1 - lat/pi)  =>  lat = pi*(1 - (y+0.5)/h).
    lat = _PI * (1.0 - (np.arange(h, dtype=np.float64) + 0.5) / h)
    sin_lat = np.maximum(np.sin(lat), 0.0)
    weight = lum.astype(np.float64) * sin_lat[:, None]
    total = weight.sum()
    if total <= 0.0:
        weight = np.ones_like(weight) * sin_lat[:, None]
        total = weight.sum()
    p = weight / total
    omega = (_PI / h) * (2.0 * _PI / w) * sin_lat[:, None]
    inv_pdf = np.where(p > 0.0, omega / np.maximum(p, 1e-30), 0.0)
    cdf = np.cumsum(p.reshape(-1))
    cdf[-1] = 1.0

    z = jnp.zeros((3,), jnp.float32)
    return HDRI, Sky(
        z, z, jnp.asarray(img, jnp.float32),
        jnp.asarray(cdf, jnp.float32),
        jnp.asarray(inv_pdf, jnp.float32),
    )


def sample_env(sky: Sky, u_cdf, u_jx, u_jy):
    """Importance-sample the environment map.

    Returns (in_dir, inv_pdf, radiance):
      in_dir: unit vector in the map's convention -- pointing from the sky
        TOWARD the surface (matching how the integrator evaluates
        ambient_light at -ray_direction, trace.rs:21); shadow rays travel
        along -in_dir;
      inv_pdf: reciprocal solid-angle pdf of the chosen texel;
      radiance: the texel's RGB (exactly what ambient_light would return for
        a ray escaping along -in_dir).
    """
    h, w = sky.image.shape[0], sky.image.shape[1]
    idx = jnp.clip(
        jnp.searchsorted(sky.env_cdf, u_cdf, side="right"), 0, h * w - 1
    ).astype(jnp.int32)
    y = idx // w
    x = idx % w
    radiance = sky.image[y, x]
    inv_pdf = sky.env_inv_pdf[y, x]

    # Texel -> direction: invert the equirectangular lookup
    # (x = (w/2)(long/pi) + w/2, y = h(1 - lat/pi)), jittered within the
    # texel (radiance and pdf are constant across it, so this is unbiased
    # for the piecewise-constant environment the lookup defines).
    xf = x.astype(jnp.float32) + u_jx
    yf = y.astype(jnp.float32) + u_jy
    long = _PI * (2.0 * xf / w - 1.0)
    lat = _PI * (1.0 - yf / h)
    sin_lat = jnp.sin(lat)
    in_dir = jnp.stack(
        [sin_lat * jnp.cos(long), jnp.cos(lat), sin_lat * jnp.sin(long)],
        axis=-1,
    )
    return in_dir, inv_pdf, radiance


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
