"""Sanitizer + timing utility tests (SURVEY.md section 5 aux subsystems)."""

import numpy as np
import pytest
import jax.numpy as jnp

from paths_tpu.debug import validate_radiance, debug_checks
from paths_tpu.profiling import time_jitted, RayCounter


def test_validate_radiance_clean():
    rep = validate_radiance(np.ones((100, 3)))
    assert rep.ok and rep.n == 100


def test_validate_radiance_flags_and_strict():
    c = np.ones((10, 3))
    c[0, 0] = np.nan
    c[1, 1] = np.inf
    c[2, 2] = -0.5
    rep = validate_radiance(c)
    assert (rep.n_nan, rep.n_inf, rep.n_negative) == (1, 1, 1)
    with pytest.raises(FloatingPointError):
        validate_radiance(c, strict=True)


def test_debug_checks_restores_config():
    import jax

    before = jax.config.jax_debug_nans
    with debug_checks():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_time_jitted_returns_positive():
    import jax

    f = jax.jit(lambda x: x * 2.0)
    dt = time_jitted(f, jnp.ones((128, 128)), reps=2)
    assert dt > 0


def test_ray_counter_line():
    rc = RayCounter()
    rc.add(720 * 480)
    line = rc.line(720, 480)
    assert "1.0/px" in line
