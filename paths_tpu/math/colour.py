"""Colour transfer functions.

Reference: src/colour.rs.  Colours here are just (..., 3) arrays of linear
RGB; this module holds the display transfer used when writing images.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

GAMMA = 0.45  # colour.rs:64


def to_bytes(rgb: jnp.ndarray) -> jnp.ndarray:
    """Gamma-encode linear RGB to u8, matching colour.rs:62-74 exactly:
    x**0.45, then >=1 -> 255, <=0 -> 0, else floor(x*256)."""
    x = jnp.power(jnp.maximum(rgb, 0.0), GAMMA)
    b = jnp.clip(jnp.floor(x * 256.0), 0, 255)
    b = jnp.where(x >= 1.0, 255.0, b)
    return b.astype(jnp.uint8)


def to_bytes_np(rgb: np.ndarray) -> np.ndarray:
    x = np.power(np.maximum(np.asarray(rgb, np.float64), 0.0), GAMMA)
    b = np.clip(np.floor(x * 256.0), 0, 255)
    b = np.where(x >= 1.0, 255.0, b)
    return b.astype(np.uint8)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
