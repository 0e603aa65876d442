"""Math core tests: vec ops, basis construction (geom.rs:334-356 cases),
double-single arithmetic precision."""

import numpy as np
import jax.numpy as jnp
import pytest

from paths_tpu.math import vec, ds


def test_dot_cross():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(vec.dot(a, b)), [32.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(vec.cross(a, b)), [[-3.0, 6.0, -3.0], [0.0, 0.0, -1.0]]
    )


def test_normalize():
    v = jnp.array([[3.0, 0.0, 4.0]])
    np.testing.assert_allclose(np.asarray(vec.normalize(v)), [[0.6, 0.0, 0.8]], rtol=1e-6)


@pytest.mark.parametrize(
    "inv, n, expected",
    [
        # Reference table tests (geom.rs:352-355).
        ((0.0, 1.0, 0.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0)),
        ((0.0, 1.0, 0.0), (1.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
        ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 0.0, 0.0)),
        ((1.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)),
    ],
)
def test_switch_basis_reference_cases(inv, n, expected):
    i, j, k = vec.form_basis(jnp.array([n]))
    out = vec.switch_basis(jnp.array([inv]), i, j, k)
    np.testing.assert_allclose(np.asarray(out)[0], expected, atol=1e-6)


def test_form_basis_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    i, j, k = vec.form_basis(jnp.asarray(n, jnp.float32))
    i, j, k = np.asarray(i), np.asarray(j), np.asarray(k)
    np.testing.assert_allclose((i * j).sum(-1), 0, atol=1e-5)
    np.testing.assert_allclose((i * k).sum(-1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(i, axis=-1), 1, atol=1e-5)


def test_reflect():
    v = jnp.array([[0.6, 0.8, 0.0]])  # outgoing (toward viewer)
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(vec.reflect(v, n))
    np.testing.assert_allclose(out, [[-0.6, 0.8, 0.0]], atol=1e-6)


def test_ds_two_sum_exact():
    a = jnp.float32(1e8)
    b = jnp.float32(1.0)
    s, e = ds.two_sum(a, b)
    # hi+lo recovers the exact sum in f64.
    assert float(s) + float(e) == 1e8 + 1.0


def test_ds_two_prod_exact():
    a = jnp.float32(1000003.0)
    b = jnp.float32(1000003.0)
    p, e = ds.two_prod(a, b)
    assert float(p) + float(e) == 1000003.0 * 1000003.0


def test_ds_dot3_precision():
    # oc . oc - r^2 for the 1e6 ground-sphere case: f32 alone loses this.
    ax, ay, az = (jnp.float32(3.0), jnp.float32(1000008.0), jnp.float32(-15.0))
    d = ds.dot3(ax, ay, az, ax, ay, az)
    exact = 3.0**2 + 1000008.0**2 + 15.0**2
    got = float(d[0]) + float(d[1])
    assert abs(got - exact) / exact < 1e-12


def test_ds_sqrt():
    x = ds.ds(jnp.float32(2.0))
    r = ds.sqrt(x)
    got = float(r[0]) + float(r[1])
    assert abs(got - np.sqrt(2.0)) < 1e-12
