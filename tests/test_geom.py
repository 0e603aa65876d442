"""Geometry tests: sphere quadratic (incl. the f32-hostile radius-1e6 ground
sphere), triangle plane/barycentric intersection (geom.rs:208-321)."""

import numpy as np
import jax.numpy as jnp

from paths_tpu.geom import sphere as GS
from paths_tpu.geom import triangle as GT
from paths_tpu.geom import aabb


def _sphere_ref(o, d, c, r):
    """f64 reference solve (geom.rs:208-235)."""
    oc = o - c
    disc = np.dot(d, oc) ** 2 - np.dot(oc, oc) + r * r
    if disc < 0:
        return None
    tmp = -np.dot(d, oc)
    sq = np.sqrt(disc)
    d1, d2 = tmp + sq, tmp - sq
    if d1 < 0:
        return None
    return d2 if d2 > 0 else d1


def test_sphere_basic():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit = GS.intersect(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0]))
    assert bool(hit[0]) and abs(float(t[0]) - 4.0) < 1e-6


def test_sphere_miss_behind():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, hit = GS.intersect(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([1.0]))
    assert not bool(hit[0])


def test_sphere_inside():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit = GS.intersect(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]))
    assert bool(hit[0]) and abs(float(t[0]) - 2.0) < 1e-6


def test_huge_ground_sphere_precision():
    """The f32 cancellation case the double-single path exists for."""
    rng = np.random.default_rng(1)
    c = np.array([0.0, -1e6, 0.0])
    r = 1e6
    for _ in range(50):
        o = np.array([rng.uniform(-20, 20), rng.uniform(0.5, 20), rng.uniform(-20, 20)])
        d = np.array([rng.uniform(-1, 1), rng.uniform(-1, -0.05), rng.uniform(-1, 1)])
        d /= np.linalg.norm(d)
        t_ref = _sphere_ref(o, d, c, r)
        t, hit = GS.intersect(
            jnp.asarray(o[None], jnp.float32), jnp.asarray(d[None], jnp.float32),
            jnp.asarray(c[None], jnp.float32), jnp.asarray([r], jnp.float32),
        )
        assert bool(hit[0]), (o, d)
        assert abs(float(t[0]) - t_ref) < 1e-3 * max(1.0, t_ref), (o, d, float(t[0]), t_ref)


def test_huge_ground_sphere_up_rays_miss():
    c = jnp.array([[0.0, -1e6, 0.0]])
    r = jnp.array([1e6])
    o = jnp.array([[3.0, 8.0, -15.0]])
    for dv in [(0, 1, 0), (0.3, 0.7, 0.2), (-0.5, 0.2, 0.5)]:
        d = np.array([dv], np.float64)
        d /= np.linalg.norm(d)
        t, hit = GS.intersect(o, jnp.asarray(d, jnp.float32), c, r)
        assert not bool(hit[0]), dv


def test_triangle_hit_and_bary():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    o = jnp.array([[0.25, 0.25, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit, bx, by, bz, cos = GT.intersect(o, d, v0, v1, v2, n)
    assert bool(hit[0]) and abs(float(t[0]) - 3.0) < 1e-6
    # bx weights v0 (area pbc / area abc), etc. (geom.rs:287-293).
    np.testing.assert_allclose(
        [float(bx[0]), float(by[0]), float(bz[0])], [0.5, 0.25, 0.25], atol=1e-6
    )
    # Interpolated point check: bx*v0 + by*v1 + bz*v2 == p.
    p = 0.5 * np.array([0, 0, 0.0]) + 0.25 * np.array([1, 0, 0.0]) + 0.25 * np.array([0, 1, 0.0])
    np.testing.assert_allclose(p[:2], [0.25, 0.25])


def test_triangle_outside_misses():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    o = jnp.array([[0.9, 0.9, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, hit, *_ = GT.intersect(o, d, v0, v1, v2, n)
    assert not bool(hit[0])


def test_triangle_backface_cos_sign():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    # Ray travelling along +z hits the back side (cos > 0 -> flip).
    o = jnp.array([[0.25, 0.25, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    *_, cos = GT.intersect(o, d, v0, v1, v2, n)
    assert float(cos[0]) > 0  # caller flips normal (geom.rs:298-300)


def test_aabb_slab():
    o = jnp.array([[0.0, 0.0, -5.0]])
    inv_d = 1.0 / jnp.array([[1e-9, 1e-9, 1.0]])
    hit, tmin = aabb.slab_test(
        o, inv_d, jnp.array([[-1.0, -1.0, -1.0]]), jnp.array([[1.0, 1.0, 1.0]]),
        jnp.array([jnp.inf]),
    )
    assert bool(hit[0]) and abs(float(tmin[0]) - 4.0) < 1e-5
    # Box behind the ray must not hit (our tmax>0 extension).
    hit2, _ = aabb.slab_test(
        o, inv_d, jnp.array([[-1.0, -1.0, -10.0]]), jnp.array([[1.0, 1.0, -8.0]]),
        jnp.array([jnp.inf]),
    )
    assert not bool(hit2[0])
