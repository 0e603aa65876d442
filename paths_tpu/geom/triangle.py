"""Ray/triangle intersection, vectorised.

Reference: src/geom.rs:264-303 -- plane hit + signed-area barycentrics (not
Moller-Trumbore), backface normal flip, NaN-guarded.  We reproduce the same
math so barycentric weights (bx: vertex a, by: vertex b, bz: vertex c) match
the reference's smooth-normal/vertex-colour interpolation (model.rs:142-172).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from paths_tpu.math import vec

BIG = np.float32(3.4e38)  # numpy, not jnp: see integrator.py BIG comment


def intersect(o, d, v0, v1, v2, n):
    """Batched ray/triangle test.  All args (..., 3), broadcastable.

    Returns (t, hit, bx, by, bz, cos_theta):
      t = BIG where miss; bary weights follow geom.rs:287-293;
      cos_theta = n . d (used for the backface flip by callers).
    """
    cos_theta = vec.dot(n, d)
    dd = vec.dot(n, v0)  # plane constant (geom.rs:274)
    denom = jnp.where(cos_theta == 0.0, 1.0, cos_theta)
    t = (dd - vec.dot(n, o)) / denom
    valid = (cos_theta != 0.0) & (t >= 0.0) & jnp.isfinite(t)

    p = o + d * t[..., None]

    area_abc = vec.dot(n, vec.cross(v1 - v0, v2 - v0))
    area_pbc = vec.dot(n, vec.cross(v1 - p, v2 - p))
    area_pca = vec.dot(n, vec.cross(v2 - p, v0 - p))

    denom_a = jnp.where(area_abc == 0.0, 1.0, area_abc)
    bx = area_pbc / denom_a
    by = area_pca / denom_a
    bz = 1.0 - bx - by

    inside = (bx >= 0.0) & (by >= 0.0) & (bz >= 0.0) & (area_abc != 0.0)
    hit = valid & inside
    t = jnp.where(hit, t, BIG)
    return t, hit, bx, by, bz, cos_theta
