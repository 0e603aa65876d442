"""Sorted (front-to-back, early-exit, HBM-streaming) traversal kernels vs
brute force, in interpret mode on CPU.

closest_hit_sorted / occludes_sorted are the production triangle
intersectors (ops/sorted_traverse.py); they must agree exactly with the
streaming reference intersector on hits, distances and indices, in both
stream (HBM + DMA) and resident (VMEM) modes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from paths_tpu.bvh.build import build_bvh
from paths_tpu.ops.pallas_traverse import PACK_LEAF, pack_chunked
from paths_tpu.ops.sorted_traverse import (
    ROWS_PER_CHUNK_SORTED,
    closest_hit_sorted,
    occludes_sorted,
)
from tests.test_pallas import brute  # shared brute-force reference

BIG = 3.4e38


@pytest.fixture(scope="module")
def packed_soup():
    rng = np.random.default_rng(7)
    T = 300
    c = rng.uniform(-1, 1, (T, 3))
    v0 = c + rng.uniform(-0.1, 0.1, (T, 3))
    v1 = c + rng.uniform(-0.1, 0.1, (T, 3))
    v2 = c + rng.uniform(-0.1, 0.1, (T, 3))
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmin, tmax, leaf_size=PACK_LEAF, use_native=False)
    order = flat.order
    v0, v1, v2, n = v0[order], v1[order], v2[order], n[order]
    ents = (np.arange(T) % 13).astype(np.int64)
    ct, n_chunks = pack_chunked(
        flat, v0, v1, v2, n, ent=ents, rows_per_chunk=ROWS_PER_CHUNK_SORTED
    )
    return ct, n_chunks, v0, v1, v2, n, ents


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(3)
    N = 1500
    o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = np.full(N, -1, np.int32)
    excl[:200] = rng.integers(0, 300, 200)
    # A band of dead lanes (integrator pushes origins to 1e30): they must
    # come back as misses and must not break block culling for live lanes.
    o[400:500] = 1e30
    return o, d, excl


@pytest.mark.parametrize("stream", [True, False])
def test_closest_sorted_matches_bruteforce(packed_soup, rays, stream):
    ct, n_chunks, v0, v1, v2, n, ents = packed_soup
    o, d, excl = rays
    t_ref, i_ref = brute(v0, v1, v2, n, o, d, excl)
    t_ref[400:500] = BIG  # dead lanes: garbage brute hits don't count

    t_p, i_p, e_p = closest_hit_sorted(
        ct, n_chunks, jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl),
        jnp.full(len(o), BIG, jnp.float32), stream=stream, interpret=True,
    )
    t_p, i_p, e_p = np.asarray(t_p), np.asarray(i_p), np.asarray(e_p)

    hit_ref = t_ref < 1e38
    hit_p = t_p < 1e38
    np.testing.assert_array_equal(hit_ref, hit_p)
    np.testing.assert_allclose(t_p[hit_p], t_ref[hit_ref], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_p[hit_ref], i_ref[hit_ref])
    np.testing.assert_array_equal(e_p[hit_ref], ents[i_p[hit_ref]])


def test_closest_sorted_respects_t_init(packed_soup, rays):
    ct, n_chunks, *_ = packed_soup
    o, d, excl = rays
    t_p, _, _ = closest_hit_sorted(
        ct, n_chunks, jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl),
        jnp.zeros(len(o), jnp.float32), interpret=True,
    )
    assert (np.asarray(t_p) >= 1e38).all()


@pytest.mark.parametrize("stream", [True, False])
def test_occludes_sorted_matches_bruteforce(packed_soup, rays, stream):
    from paths_tpu.geom import triangle as GT

    ct, n_chunks, v0, v1, v2, n, ents = packed_soup
    o, d, excl = rays
    rng = np.random.default_rng(17)
    N = len(o)
    t_max = rng.uniform(0.1, 6.0, N).astype(np.float32)
    excl_ent = rng.integers(-1, 13, N).astype(np.int32)

    occ_ref = np.zeros(N, bool)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    for s in range(len(v0)):
        t, hit, *_ = GT.intersect(
            oj, dj, jnp.asarray(v0[s]), jnp.asarray(v1[s]),
            jnp.asarray(v2[s]), jnp.asarray(n[s]),
        )
        t = np.asarray(t)
        ok = (
            np.asarray(hit) & (t < t_max) & (np.int32(s) != excl)
            & (ents[s] != excl_ent)
        )
        occ_ref |= ok
    occ_ref[400:500] = False  # dead lanes never occlude

    occ = occludes_sorted(
        ct, n_chunks, oj, dj, jnp.asarray(excl), jnp.asarray(excl_ent),
        jnp.asarray(t_max), stream=stream, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)

def test_replicated_layout_bit_identical(packed_soup, rays):
    """Opt-in field-replicated table (PATHS_TPU_TRI_REP): identical math,
    different constant delivery -- results must be BIT-identical to the
    compact layout for both kernels."""
    from paths_tpu.ops.sorted_traverse import replicate_tris

    ct, n_chunks, *_ = packed_soup
    ct = ct._replace(tris_rep=replicate_tris(ct.tris))
    # A 512-ray slice keeps interpret-mode wall-clock down while still
    # covering live, dead (400:500) and excluded (0:200) lanes.
    o, d, excl = (a[:512] for a in rays)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    excl_j = jnp.asarray(excl)
    t_init = jnp.full(o.shape[0], BIG, jnp.float32)

    a = closest_hit_sorted(ct, n_chunks, oj, dj, excl_j, t_init,
                           stream=True, interpret=True, rep=False)
    b = closest_hit_sorted(ct, n_chunks, oj, dj, excl_j, t_init,
                           stream=True, interpret=True, rep=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    t_max = jnp.full(o.shape[0], 5.0, jnp.float32)
    eent = jnp.full(o.shape[0], -1, jnp.int32)
    oa = occludes_sorted(ct, n_chunks, oj, dj, excl_j, eent, t_max,
                         stream=True, interpret=True, rep=False)
    ob = occludes_sorted(ct, n_chunks, oj, dj, excl_j, eent, t_max,
                         stream=True, interpret=True, rep=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    assert np.asarray(oa).sum() > 0


def test_flat_sphere_kernel_matches_sorted():
    """Opt-in flat unrolled sphere kernel (PATHS_TPU_SPH_FLAT) == sorted
    walk, bit-for-bit, incl. dead lanes, exclusions and any-hit."""
    from paths_tpu.ops.pallas_traverse import (
        _launch_flat_spheres, _sphere_row_test, pack_spheres_chunked,
    )
    from paths_tpu.ops.sorted_traverse import (
        SPH_ROWS_PER_CHUNK_SORTED, _launch_sorted,
    )

    rng = np.random.default_rng(11)
    S = 40
    centers = rng.uniform(-2, 2, (S, 3))
    radii = rng.uniform(0.05, 0.4, S)
    ents = (np.arange(S) % 7).astype(np.int64)
    cs, n_chunks, _ = pack_spheres_chunked(
        centers, radii, ent=ents, rows_per_chunk=SPH_ROWS_PER_CHUNK_SORTED
    )

    N = 384
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    o[100:150] = 1e30  # dead lanes
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = np.full(N, -1, np.int32)
    excl[:80] = rng.integers(0, S, 80)
    oj, dj, ej = jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl)
    t0 = jnp.full(N, BIG, jnp.float32)

    a = _launch_flat_spheres(cs.tris, oj, dj, ej, t0, anyhit=False,
                             interpret=True)
    b = _launch_sorted(cs.chunk_meta, cs.tris, oj, dj, ej, t0, n_chunks,
                       SPH_ROWS_PER_CHUNK_SORTED, _sphere_row_test,
                       anyhit=False, stream=False, has_row_meta=False,
                       interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (np.asarray(a[0]) < 1e38).sum() > 0

    eent = jnp.asarray(rng.integers(-1, 7, N).astype(np.int32))
    tmx = jnp.full(N, 5.0, jnp.float32)
    oa = _launch_flat_spheres(cs.tris, oj, dj, ej, tmx, anyhit=True,
                              excl_ent=eent, interpret=True)
    ob = _launch_sorted(cs.chunk_meta, cs.tris, oj, dj, ej, tmx, n_chunks,
                        SPH_ROWS_PER_CHUNK_SORTED, _sphere_row_test,
                        anyhit=True, stream=False, excl_ent=eent,
                        has_row_meta=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_two_phase_matches_single_phase(packed_soup, rays):
    """Opt-in straggler-compacted walk == single front-to-back walk on the
    same soup/rays the brute-force parity test uses (incl. dead lanes and
    per-lane exclusions)."""
    ct, n_chunks, *_ = packed_soup
    o, d, excl = rays
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    excl_j = jnp.asarray(excl)
    t_init = jnp.full(o.shape[0], BIG, jnp.float32)

    t_sp, i_sp, e_sp = closest_hit_sorted(
        ct, n_chunks, oj, dj, excl_j, t_init, stream=True, interpret=True,
        two_phase=False)
    t_tp, i_tp, e_tp = closest_hit_sorted(
        ct, n_chunks, oj, dj, excl_j, t_init, stream=True, interpret=True,
        two_phase=True)
    t_sp, t_tp = np.asarray(t_sp), np.asarray(t_tp)
    hit_sp, hit_tp = t_sp < 1e38, t_tp < 1e38
    assert hit_sp.sum() > 0
    np.testing.assert_array_equal(hit_sp, hit_tp)
    np.testing.assert_allclose(t_sp[hit_sp], t_tp[hit_sp], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(i_sp)[hit_sp], np.asarray(i_tp)[hit_sp])
    np.testing.assert_array_equal(
        np.asarray(e_sp)[hit_sp], np.asarray(e_tp)[hit_sp])


def test_sub_block_gating_bit_identical():
    """Sub-block row-test gating (round 5, _half_cond_enabled) must be a
    pure perf transform: a skipped sub-block is one whose precise slab
    test proves no lane can hit the chunk, so results are bit-identical
    with the gating forced off -- for compact and replicated layouts,
    closest-hit and any-hit, with dead lanes present."""
    import os

    import numpy as np
    import jax.numpy as jnp

    from paths_tpu.bvh.build import build_bvh
    from paths_tpu.ops.pallas_traverse import pack_chunked
    from paths_tpu.ops.sorted_traverse import (
        closest_hit_sorted, occludes_sorted, replicate_tris,
    )

    rng = np.random.default_rng(5)
    T = 400
    v0 = rng.uniform(-2, 2, (T, 3))
    e1 = rng.normal(scale=0.4, size=(T, 3))
    e2 = rng.normal(scale=0.4, size=(T, 3))
    v1, v2 = v0 + e1, v0 + e2
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    ent = (np.arange(T) % 9).astype(np.int64)
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmin, tmax, leaf_size=8)
    v0, v1, v2, n, ent = (a[flat.order] for a in (v0, v1, v2, n, ent))
    ct, C = pack_chunked(flat, v0, v1, v2, n, ent=ent, rows_per_chunk=15)
    ct = ct._replace(tris_rep=replicate_tris(ct.tris))

    N = 4096
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    o[500:900] = 1e30
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = np.full(N, -1, np.int32)
    excl[:100] = rng.integers(0, T, 100)
    oj, dj, ej = jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl)
    t0 = jnp.full(N, np.float32(3.4e38))
    tmx = jnp.full(N, np.float32(6.0))
    eent = jnp.asarray(rng.integers(-1, 9, N).astype(np.int32))

    def run(rep):
        a = closest_hit_sorted(ct, C, oj, dj, ej, t0, stream=True,
                               interpret=True, block_rows=16, rep=rep)
        b = occludes_sorted(ct, C, oj, dj, ej, eent, tmx, stream=True,
                            interpret=True, block_rows=16, rep=rep)
        return [np.asarray(x) for x in a] + [np.asarray(b)]

    old = os.environ.get("PATHS_TPU_HALF_COND")
    try:
        os.environ["PATHS_TPU_HALF_COND"] = "0"
        plain = {rep: run(rep) for rep in (False, True)}
        os.environ["PATHS_TPU_HALF_COND"] = "1"
        gated = {rep: run(rep) for rep in (False, True)}
    finally:
        if old is None:
            os.environ.pop("PATHS_TPU_HALF_COND", None)
        else:
            os.environ["PATHS_TPU_HALF_COND"] = old
    for rep in (False, True):
        for x, y in zip(plain[rep], gated[rep]):
            np.testing.assert_array_equal(x, y)
    assert (plain[False][0] < 1e38).sum() > 0
    assert plain[False][3].sum() > 0
