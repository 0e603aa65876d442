"""Ray/sphere intersection, vectorised and f32-stable.

Reference: src/geom.rs:208-235 (f64 quadratic).  The bundled scenes model
ground planes as spheres with radius 1e6 (scenes/spheres_on_plane.yml etc.);
solving the quadratic naively in f32 loses the entire scene scale to
cancellation.  We therefore evaluate the discriminant and roots in
double-single arithmetic (paths_tpu.math.ds) -- pure elementwise VPU work,
~4x the flops of the naive version, negligible next to traversal cost.

Semantics matched to the reference:
  disc = (l.oc)^2 - oc.oc + r^2      (oc = o - c)
  miss if disc < 0
  d1 = -l.oc + sqrt(disc); d2 = -l.oc - sqrt(disc)
  miss if d1 < 0;  t = d2 if d2 > 0 else d1
  normal = normalize(location - c)   (no inside-flip)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from paths_tpu.math import ds
from paths_tpu.math import vec

BIG = np.float32(3.4e38)  # numpy, not jnp: see integrator.py BIG comment


def intersect(o, d, center, radius):
    """Batched ray/sphere test.

    o, d: (..., 3) ray origins/directions.
    center: (..., 3), radius: (...) -- broadcast against rays.

    Returns (t, hit): t = BIG where no hit.
    """
    # oc = o - center, exactly, per component.
    och = []
    ocl = []
    for i in range(3):
        h, l = ds.two_sum(o[..., i], -center[..., i])
        och.append(h)
        ocl.append(l)

    # b = d . oc in double-single.
    b = ds.ds(jnp.zeros_like(och[0]))
    for i in range(3):
        p, e = ds.two_prod(d[..., i], och[i])
        b = ds.add(b, (p, e + d[..., i] * ocl[i]))

    # oc.oc in double-single (dropping the negligible lo*lo term).
    oc2 = ds.ds(jnp.zeros_like(och[0]))
    for i in range(3):
        p, e = ds.two_prod(och[i], och[i])
        oc2 = ds.add(oc2, (p, e + 2.0 * och[i] * ocl[i]))

    r2 = ds.two_prod(radius, radius)

    # disc = b^2 - oc.oc + r^2
    disc = ds.add(ds.sub(ds.sqr(b), oc2), r2)
    disc_v = ds.to_f32(disc)

    # Clamp before sqrt so the untaken branch cannot poison gradients.
    disc_safe = (jnp.maximum(disc[0], 0.0), jnp.where(disc_v >= 0, disc[1], 0.0))
    root = ds.sqrt(disc_safe)

    tmp = ds.neg(b)
    d1 = ds.to_f32(ds.add(tmp, root))
    d2 = ds.to_f32(ds.sub(tmp, root))

    hit = (disc_v >= 0.0) & (d1 >= 0.0)
    t = jnp.where(d2 > 0.0, d2, d1)
    t = jnp.where(hit, t, BIG)
    return t, hit


def surface(o, d, t, center):
    """Hit location and outward normal (geom.rs:230-233)."""
    location = o + d * t[..., None]
    normal = vec.normalize_safe(location - center)
    return location, normal
