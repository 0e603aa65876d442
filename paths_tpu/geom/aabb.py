"""Ray/AABB slab test, vectorised.

Reference: src/bvh.rs:8-21 (scratchapixel slab method with precomputed
inverse direction).  The reference omits a ``tmax > 0`` test so boxes fully
behind the ray still "hit"; we add it -- it can never cull a true t>=0
primitive hit (such a hit point lies in the box, putting the box on the
forward side) and prunes useless traversal.
"""

from __future__ import annotations

import jax.numpy as jnp


def slab_test(o, inv_d, box_min, box_max, t_best):
    """Returns (hit, tmin).  All (..., 3) / (...) broadcastable.

    hit iff tmin < tmax (strict, as bvh.rs:16) and tmin < t_best and tmax > 0.
    """
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tmin = jnp.max(tsmall, axis=-1)
    tmax = jnp.min(tbig, axis=-1)
    hit = (tmin < tmax) & (tmin < t_best) & (tmax > 0.0)
    return hit, tmin
