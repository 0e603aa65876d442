"""The render_samples wave-state sort must not change images.

render_samples (Pallas scenes, waves >= _SORT_MIN_N) permutes the whole
per-lane wave state once per bounce and runs the traversal kernels with
their internal lane sort disabled.  Per-lane results are lane-position
independent and the RNG is keyed on the carried pixel_id, so the result
must be BIT-IDENTICAL to the unsorted schedule (PATHS_TPU_WAVE_SORT=0) --
any difference means lane state leaked across the permutation.
"""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("PATHS_TPU_FORCE_PALLAS", "1")


def _render(scene_sd, wave_sort: bool, n_lanes: int, monkeypatch):
    import jax.numpy as jnp

    from paths_tpu.render import render_samples, tiled_pixel_order
    from paths_tpu.scene.build import build_scene

    monkeypatch.setenv("PATHS_TPU_WAVE_SORT", "1" if wave_sort else "0")
    import dataclasses

    static, scene, cam = build_scene(scene_sd)
    static = dataclasses.replace(static, max_bounces=3)
    W = H = 96  # 9216 lanes >= _SORT_MIN_N (8192)
    from paths_tpu import camera as C

    cam = C.resize(cam, W, H)
    pix = tiled_pixel_order(W, H)[:n_lanes]
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)
    out = render_samples(static, scene, cam, px, py, pid, jnp.uint32(0), 2, 7)
    return np.asarray(out)


def test_wave_sort_bit_identical(force_pallas, monkeypatch):
    from paths_tpu.ops.pallas_traverse import _SORT_MIN_N
    from paths_tpu.scene.stress import generate_mixed_scene

    sd = generate_mixed_scene(
        os.path.join(os.path.dirname(__file__), "goldens", "assets"),
        n_spheres=12,
    )
    n = 96 * 96
    assert n >= _SORT_MIN_N
    a = _render(sd, True, n, monkeypatch)
    b = _render(sd, False, n, monkeypatch)
    assert np.isfinite(a).all()
    assert a.shape == b.shape
    # Per-lane results are lane-position independent, so the two schedules
    # agree bit-for-bit on almost every lane.  NOT on all: XLA compiles the
    # two while-loop bodies differently (the sorted one contains the
    # permutation), and fusion/FMA reassociation shifts some f32 results by
    # ulps, which RR / lobe-choice comparisons amplify into different --
    # equally valid -- paths on a fraction of lanes (verified by replaying
    # the exact body eagerly: zero differing lanes).  A real permutation
    # bug (state misaligned across the sort) corrupts lanes wholesale, so
    # gate on: >= 99% lanes bit-equal AND the mean image unchanged.
    diff = (a != b).any(axis=-1)
    frac = diff.mean()
    assert frac < 0.01, f"wave sort changed {diff.sum()} lanes ({frac:.2%})"
    assert np.allclose(a.mean(axis=0), b.mean(axis=0), rtol=0.02, atol=0.02)


def test_permute_lanes_bit_exact():
    """_permute_lanes packs ~27 mixed-dtype columns through one bitcast
    int32 gather; every array must round-trip BIT-exactly (incl. NaN/inf
    payloads, full-range uint32, bools) and in order."""
    import jax.numpy as jnp

    from paths_tpu.render import _permute_lanes

    rng = np.random.default_rng(5)
    N = 257
    f = rng.normal(size=(N, 3)).astype(np.float32)
    f[0] = [np.nan, np.inf, -np.inf]
    f[1] = [-0.0, 1e-42, 3.4e38]  # signed zero + subnormal survive bitcast
    f1 = rng.normal(size=N).astype(np.float32)
    u = rng.integers(0, 2**32, N, dtype=np.uint32)
    i = rng.integers(-(2**31), 2**31, N, dtype=np.int32)
    b = rng.random(N) < 0.5
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    arrays = tuple(map(jnp.asarray, (f, f1, u, i, b)))
    out = _permute_lanes(arrays, perm)
    for x, y in zip(arrays, out):
        assert y.dtype == x.dtype and y.shape == x.shape
        want = np.asarray(jnp.take(x, perm, axis=0))
        got = np.asarray(y)
        if x.dtype == jnp.float32:  # NaN-safe bit comparison
            np.testing.assert_array_equal(
                want.view(np.uint32), got.view(np.uint32))
        else:
            np.testing.assert_array_equal(want, got)


def test_wave_sort_eager_bit_identical(force_pallas, monkeypatch):
    """The eager-replay argument, committed as a test: run the sorted and
    unsorted schedules as HOST loops around the SAME jitted bounce step, so
    the two cannot compile differently -- the only difference is the lane
    permutation applied between steps.  Results must then be BIT-identical
    (zero differing lanes); any difference is a true state misalignment
    across the permutation, not XLA reassociation."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from paths_tpu import camera as C
    from paths_tpu import integrator as I
    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.render import (
        _permute_lanes, gen_camera_rays, tiled_pixel_order,
    )
    from paths_tpu.sampling import hashing as H
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.stress import generate_mixed_scene

    sd = generate_mixed_scene(
        os.path.join(os.path.dirname(__file__), "goldens", "assets"),
        n_spheres=8,
    )
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(
        static, max_bounces=2, wave_presorted=True)
    N, W, H_px, n_samples, seed = 1024, 64, 16, 2, 7
    cam = C.resize(cam, W, H_px)
    pix = tiled_pixel_order(W, H_px)[:N]
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)
    max_b = static.max_bounces + 1
    seed_j = jnp.uint32(seed)

    @partial(jax.jit, static_argnums=(0,))
    def step(static_, scene_, cam_, carry):
        """One bounce + bank + regenerate -- the exact body of
        render_samples minus the permutation."""
        acc, slot, bounce, w, done, state, px_, py_, pid_, orig = (
            carry[0], carry[1], carry[2], carry[3], carry[4],
            carry[5:13], carry[13], carry[14], carry[15], carry[16])

        def u(b_, dim):
            sid = slot  # sample_start = 0
            return H.uniform(
                seed_j, pid_, sid,
                jnp.asarray(b_).astype(jnp.uint32)
                * jnp.uint32(H.DIMS_PER_BOUNCE) + jnp.uint32(dim))

        state = I.path_step(static_, scene_, bounce, state, u)
        bounce = bounce + 1
        alive = state[4]
        finished = ~done & (~alive | (bounce >= max_b))
        acc = acc + jnp.where(
            finished[..., None], state[3] * w[..., None], 0.0)
        slot = jnp.where(finished, slot + 1, slot)
        done = done | (finished & (slot >= jnp.uint32(n_samples)))
        start_new = finished & ~done
        o2, d2, w2 = gen_camera_rays(cam_, px_, py_, pid_, slot, seed_j)
        fresh = I.fresh_path_state(o2, d2)
        bounce = jnp.where(start_new, 0, bounce)
        w = jnp.where(start_new, w2, w)

        def sel(new, old):
            m = start_new[..., None] if new.ndim == 2 else start_new
            return jnp.where(m, new, old)

        state = tuple(sel(n_, o_) for n_, o_ in zip(fresh, state))
        state = state[:4] + (state[4] & ~done,) + state[5:]
        return (acc, slot, bounce, w, done, *state, px_, py_, pid_, orig)

    def run(sort: bool):
        o, d, w0 = gen_camera_rays(cam, px, py, pid, jnp.uint32(0), seed_j)
        state0 = I.fresh_path_state(o, d)
        lo, hi = PT._meta_bounds(scene.ptris.chunk_meta)
        carry = (
            jnp.zeros((N, 3)), jnp.zeros(N, jnp.uint32),
            jnp.zeros(N, jnp.uint32), w0, jnp.zeros(N, bool),
            *state0, px, py, pid, jnp.arange(N, dtype=jnp.int32))
        while not bool(jnp.all(carry[4])):
            if sort:
                state = carry[5:13]
                o_key = jnp.where(
                    (state[4] & ~carry[4])[..., None], state[0], 1e30)
                perm = PT._coherence_perm(
                    o_key, state[1], lo, hi, octant_major=True)
                carry = _permute_lanes(carry, perm)
            carry = step(static, scene, cam, carry)
        acc, orig = carry[0], carry[-1]
        return np.asarray(jnp.zeros_like(acc).at[orig].set(acc))

    a = run(True)
    b = run(False)
    assert np.isfinite(a).all()
    diff = (a != b).any(axis=-1)
    assert diff.sum() == 0, (
        f"eager replay: {diff.sum()} lanes differ -- state misaligned "
        f"across the wave-sort permutation")
    assert (a != 0).any()  # the scene actually shaded something


def test_wave_sort_jitted_permutation_invariance(force_pallas, monkeypatch):
    """The jitted A/B VERDICT r4 item 7 asked for, formulated without the
    reassociation loophole: instead of compiling two different schedules
    (whose XLA fusion/FMA differences force the 1% tolerance above), run
    the SAME compiled wave-sorted render_samples executable twice -- once
    with the wave's lanes pre-shuffled by a random permutation -- and
    assert per-lane BIT-identity after unshuffling.

    This is the production invariant the wave sort rests on: per-lane
    results are lane-position independent (a kernel block's composition
    changes only performance -- a chunk is skipped only when NO lane can
    hit it, early exit only when no lane can improve), and the RNG is
    keyed on the carried pixel_id.  Zero tolerance: both runs are the same
    executable, so ANY differing lane is a true cross-lane leak (state
    misalignment in the permutation, or a kernel whose per-lane result
    depends on its block's other lanes)."""
    import dataclasses

    import jax.numpy as jnp

    from paths_tpu import camera as C
    from paths_tpu.render import _render_samples_jit_inner, tiled_pixel_order
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.stress import generate_mixed_scene

    sd = generate_mixed_scene(
        os.path.join(os.path.dirname(__file__), "goldens", "assets"),
        n_spheres=8,
    )
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(static, max_bounces=3)
    N, W, H = 1024, 64, 16
    cam = C.resize(cam, W, H)
    pix = tiled_pixel_order(W, H)[:N]
    px = (pix % W).astype(np.int32)
    py = (pix // W).astype(np.int32)

    rng = np.random.default_rng(3)
    P = rng.permutation(N)

    def run(order):
        out = _render_samples_jit_inner(
            static, scene, cam,
            jnp.asarray(px[order]), jnp.asarray(py[order]),
            jnp.asarray(pix[order]), jnp.uint32(0), 2, 7, True,
        )
        return np.asarray(out)

    a = run(np.arange(N))
    b = np.empty_like(a)
    b[P] = run(P)  # unshuffle back to canonical lane order
    assert np.isfinite(a).all()
    diff = (a.view(np.uint32) != b.view(np.uint32)).any(axis=-1)
    assert diff.sum() == 0, (
        f"{diff.sum()} lanes changed under lane permutation -- "
        f"per-lane results leaked across the wave")
    assert (a != 0).any()
