"""CMJ sampler tests: bit-exactness vs a direct u32 port of the reference
hash (sampling.rs:187-235), determinism, and domain membership -- the same
properties the reference asserts (sampling.rs:279-308)."""

import numpy as np
import jax.numpy as jnp

from paths_tpu.sampling import cmj

M32 = 0xFFFFFFFF


def _permute_ref(i, l, p):
    """sampling.rs:187-210.  The scramble loop is guarded by `while i > l`
    and call sites always pass i < l, so it reduces to (i + p) % l."""
    assert i <= l
    return (i + p) % l


def _rand_float_ref(i, p):
    i = (i ^ p) & M32
    i ^= i >> 17
    i ^= i >> 10
    i = (i * 0xB36534E5) & M32
    i ^= i >> 12
    i ^= i >> 21
    i = (i * 0x93FC4795) & M32
    i ^= 0xDF6E307F
    i ^= i >> 17
    i = (i * (1 | (p >> 18))) & M32
    return i * (1.0 / 4294967808.0)


def _cmj_ref(s, m, n, p):
    ps = _permute_ref(s, m * n, (p * 0xA73BD290) & M32)
    sx = _permute_ref(ps % m, m, (p * 0xA511E9B3) & M32)
    sy = _permute_ref(ps // m, n, (p * 0x63D83595) & M32)
    jx = _rand_float_ref(s, (p * 0xA399D265) & M32)
    jy = _rand_float_ref(s, (p * 0x711AD6A5) & M32)
    x = ((s % m) + (sy + jx) / n) / m
    y = ((s // m) + (sx + jy) / m) / n
    return x, y


def test_cmj_bit_exact_vs_reference_hash():
    m, n, p = 7, 5, 42
    s = np.arange(m * n, dtype=np.uint32)
    x, y = cmj.cmj(jnp.asarray(s), m, n, jnp.full(s.shape, p, jnp.uint32))
    for i in range(m * n):
        ex, ey = _cmj_ref(int(s[i]), m, n, p)
        np.testing.assert_allclose(float(x[i]), ex, atol=2e-7)
        np.testing.assert_allclose(float(y[i]), ey, atol=2e-7)


def test_cmj_square_in_domain():
    s = jnp.arange(10000, dtype=jnp.uint32)
    x, y = cmj.cmj_square(s, 100, 100, jnp.full(s.shape, 42, jnp.uint32))
    x, y = np.asarray(x), np.asarray(y)
    assert (x >= 0).all() and (x <= 1).all()
    assert (y >= 0).all() and (y <= 1).all()


def test_cmj_disk_in_domain():
    s = jnp.arange(10000, dtype=jnp.uint32)
    x, y = cmj.cmj_disk(s, 100, 100, jnp.full(s.shape, 42, jnp.uint32))
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()


def test_cmj_deterministic():
    s = jnp.arange(64, dtype=jnp.uint32)
    p = jnp.full(s.shape, 7, jnp.uint32)
    x1, y1 = cmj.cmj(s, 8, 8, p)
    x2, y2 = cmj.cmj(s, 8, 8, p)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_cmj_stratification():
    # Each of the m*n strata should receive exactly one sample.
    m, n = 8, 4
    s = jnp.arange(m * n, dtype=jnp.uint32)
    x, y = cmj.cmj(s, m, n, jnp.full(s.shape, 123, jnp.uint32))
    cells = set()
    for xi, yi in zip(np.asarray(x), np.asarray(y)):
        cells.add((int(xi * m), int(yi * n)))
    assert len(cells) == m * n
