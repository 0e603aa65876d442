"""Light sampling for next-event estimation.

Reference: src/scene.rs:41-66 (Light::sample) and src/geom.rs:146-173
(sphere-area-light sampling).

Light types:
  0 Point  -- NB the reference's point-light sample returns the light's
     *position* as if it were a direction (scene.rs:54-56) and casts the
     shadow ray along its negation, which is geometrically meaningless; no
     bundled scene uses Point lights.  We implement the evidently intended
     semantics: direction from light to surface, inv_pdf = 1, occluded iff
     any hit lies closer than the light.
  1 Sphere -- uniform point on the full sphere, inv_pdf =
     max(0, area * (n . out_dir) / dist^2)  (geom.rs:160-169; note dist^2 is
     the reference's ``magnitude()`` which is the squared norm).

A "light record" is a dict of per-lane arrays:
  ltype (i32), position (.,3), radius, colour (.,3), intensity, ent_id (i32)
"""

from __future__ import annotations

import jax.numpy as jnp

from paths_tpu.math import vec

POINT = 0
SPHERE = 1

_PI = 3.141592653589793


def sample(light, from_point, u1, u2):
    """Sample an incoming-light direction from `from_point`.

    Returns (in_dir, inv_pdf, max_dist):
      in_dir: unit vector from the light sample point TOWARD the surface
        (the reference's convention; shadow rays travel along -in_dir),
      inv_pdf: reciprocal pdf weight,
      max_dist: distance to the light sample (BIG for sphere lights, where
        occlusion is resolved by entity identity instead).
    """
    # --- Sphere area light (geom.rs:146-169) ---
    theta = 2.0 * _PI * u1
    phi_cos = 2.0 * u2 - 1.0
    phi_sin = jnp.sqrt(jnp.maximum(1.0 - phi_cos * phi_cos, 0.0))
    n = jnp.stack(
        [phi_sin * jnp.cos(theta), phi_sin * jnp.sin(theta), phi_cos], axis=-1
    )
    point = light["position"] + n * light["radius"][..., None]
    out_vec = from_point - point
    dist_sq = jnp.maximum(vec.norm_sq(out_vec), 1e-20)
    out_dir = out_vec / jnp.sqrt(dist_sq)[..., None]
    area = 4.0 * _PI * light["radius"] * light["radius"]
    sph_inv_pdf = jnp.maximum(0.0, area * vec.dot(n, out_dir) / dist_sq)

    # --- Point light (intended semantics; see module docstring) ---
    pt_vec = from_point - light["position"]
    pt_dist = jnp.sqrt(jnp.maximum(vec.norm_sq(pt_vec), 1e-20))
    pt_dir = pt_vec / pt_dist[..., None]

    is_point = light["ltype"] == POINT
    in_dir = jnp.where(is_point[..., None], pt_dir, out_dir)
    inv_pdf = jnp.where(is_point, 1.0, sph_inv_pdf)
    max_dist = jnp.where(is_point, pt_dist, jnp.float32(3.4e38))
    return in_dir, inv_pdf, max_dist
