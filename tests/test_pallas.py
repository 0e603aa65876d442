"""Pallas traversal kernels vs brute force (interpret mode on CPU).

The chunked culled-brute kernel is the production TPU triangle intersector
(integrator.intersect_brief); the packet skip-link kernel is the
tree-stepping alternative kept for very large meshes.  Both must agree
exactly with the streaming reference intersector on hits and indices.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from paths_tpu.bvh.build import build_bvh
from paths_tpu.geom import triangle as GT
from paths_tpu.ops.pallas_traverse import (
    PACK_LEAF,
    closest_hit_chunked,
    closest_hit_packet,
    pack_bvh,
    pack_chunked,
)

BIG = 3.4e38


@pytest.fixture(scope="module")
def tri_soup():
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
    return flat, v0[order], v1[order], v2[order], n[order]


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(3)
    N = 1500
    o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = np.full(N, -1, np.int32)
    excl[:200] = rng.integers(0, 300, 200)
    return o, d, excl


def brute(v0, v1, v2, n, o, d, excl):
    N = len(o)
    t_ref = np.full(N, BIG, np.float32)
    i_ref = np.zeros(N, np.int32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    for s in range(len(v0)):
        t, hit, *_ = GT.intersect(
            oj, dj, jnp.asarray(v0[s]), jnp.asarray(v1[s]),
            jnp.asarray(v2[s]), jnp.asarray(n[s]),
        )
        t = np.asarray(t)
        ok = np.asarray(hit) & (t < t_ref) & (np.int32(s) != excl)
        t_ref = np.where(ok, t, t_ref)
        i_ref = np.where(ok, s, i_ref)
    return t_ref, i_ref


@pytest.mark.parametrize("kernel", ["chunked", "packet"])
def test_traversal_kernels_match_bruteforce(tri_soup, rays, kernel):
    flat, v0, v1, v2, n = tri_soup
    o, d, excl = rays
    t_ref, i_ref = brute(v0, v1, v2, n, o, d, excl)

    t_init = jnp.full(len(o), BIG, jnp.float32)
    if kernel == "chunked":
        ct, n_chunks = pack_chunked(flat, v0, v1, v2, n, rows_per_chunk=4)
        t_p, i_p, _ = closest_hit_chunked(
            ct, n_chunks, jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl),
            t_init, interpret=True,
        )
    else:
        pt = pack_bvh(flat, v0, v1, v2, n)
        t_p, i_p, _ = closest_hit_packet(
            pt, jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl),
            t_init, interpret=True,
        )
    t_p, i_p = np.asarray(t_p), np.asarray(i_p)

    hit_ref = t_ref < 1e38
    hit_p = t_p < 1e38
    np.testing.assert_array_equal(hit_ref, hit_p)
    np.testing.assert_allclose(t_p[hit_p], t_ref[hit_ref], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_p[hit_ref], i_ref[hit_ref])


def test_chunked_respects_t_init_pruning(tri_soup, rays):
    """With t_init = 0 no triangle can win (cross-primitive pruning)."""
    flat, v0, v1, v2, n = tri_soup
    o, d, excl = rays
    ct, n_chunks = pack_chunked(flat, v0, v1, v2, n)
    t_p, _, _ = closest_hit_chunked(
        ct, n_chunks, jnp.asarray(o), jnp.asarray(d), jnp.asarray(excl),
        jnp.zeros(len(o), jnp.float32), interpret=True,
    )
    assert (np.asarray(t_p) >= 1e38).all()


def test_sphere_kernel_matches_bruteforce():
    from paths_tpu.geom import sphere as GS
    from paths_tpu.ops.pallas_traverse import pack_spheres_chunked, closest_hit_spheres

    rng = np.random.default_rng(11)
    S, N = 200, 900
    c = rng.uniform(-40, 40, (S, 3))
    r = rng.uniform(0.5, 5.0, S)
    ents = np.arange(S) * 7
    cs, n_chunks, order = pack_spheres_chunked(c, r, ent=ents, gid0=0,
                                               rows_per_chunk=2)
    ents = ents[order]
    c, r = c[order], r[order]

    o = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = np.full(N, -1, np.int32)
    excl[:100] = rng.integers(0, S, 100)

    t_ref = np.full(N, BIG, np.float32)
    i_ref = np.zeros(N, np.int32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    for s in range(S):
        t, hit = GS.intersect(oj, dj, jnp.asarray(c[s], jnp.float32),
                              jnp.asarray(r[s], jnp.float32))
        t = np.asarray(t)
        ok = np.asarray(hit) & (t < t_ref) & (np.int32(s) != excl)
        t_ref = np.where(ok, t, t_ref)
        i_ref = np.where(ok, s, i_ref)

    t_p, i_p, e_p = closest_hit_spheres(
        cs, n_chunks, oj, dj, jnp.asarray(excl),
        jnp.full(N, BIG, jnp.float32), interpret=True,
    )
    t_p, i_p, e_p = np.asarray(t_p), np.asarray(i_p), np.asarray(e_p)
    hit_ref = t_ref < 1e38
    hit_p = t_p < 1e38
    # Plain f32 vs double-single: tolerate boundary flips on grazing rays.
    flips = (hit_ref != hit_p).sum()
    assert flips <= N * 0.01, f"{flips} hit flips"
    both = hit_ref & hit_p & (i_p == i_ref)
    np.testing.assert_allclose(t_p[both], t_ref[both], rtol=1e-4, atol=1e-4)
    idx_mism = (i_p != i_ref) & hit_ref & hit_p
    assert idx_mism.sum() <= N * 0.01
    # Entities ride in the packed rows.
    np.testing.assert_array_equal(e_p[both], ents[i_p[both]])


def test_take_rows_onehot_matches_gather():
    from paths_tpu.integrator import _take_rows

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal((37, 14)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 37, 500), jnp.int32)
    a = _take_rows(table, idx, onehot=True)
    b = _take_rows(table, idx, onehot=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_anyhit_tri_matches_closest_derived(tri_soup, rays):
    """occludes_chunked == (closest hit with t < t_max and ent != excl_ent)."""
    from paths_tpu.ops.pallas_traverse import occludes_chunked

    flat, v0, v1, v2, n = tri_soup
    o, d, excl = rays
    rng = np.random.default_rng(17)
    N = len(o)
    ents = (np.arange(len(v0)) % 13).astype(np.int64)
    ct, n_chunks = pack_chunked(flat, v0, v1, v2, n, ent=ents,
                                rows_per_chunk=4)
    t_max = rng.uniform(0.1, 6.0, N).astype(np.float32)
    excl_ent = rng.integers(-1, 13, N).astype(np.int32)

    # Reference occlusion: ANY qualifying hit, not just the closest --
    # build it by brute force with the entity/t_max filters applied.
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

    occ = occludes_chunked(
        ct, n_chunks, oj, dj, jnp.asarray(excl), jnp.asarray(excl_ent),
        jnp.asarray(t_max), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)


def test_anyhit_sphere_matches_bruteforce():
    from paths_tpu.geom import sphere as GS
    from paths_tpu.ops.pallas_traverse import (
        pack_spheres_chunked, occludes_spheres,
    )

    rng = np.random.default_rng(23)
    S, N = 150, 800
    c = rng.uniform(-40, 40, (S, 3))
    r = rng.uniform(0.5, 5.0, S)
    ents = np.arange(S) % 9
    cs, n_chunks, order = pack_spheres_chunked(c, r, ent=ents, gid0=0,
                                               rows_per_chunk=2)
    ents, c, r = ents[order], c[order], r[order]

    o = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = np.full(N, -1, np.int32)
    excl[:100] = rng.integers(0, S, 100)
    excl_ent = rng.integers(-1, 9, N).astype(np.int32)
    t_max = rng.uniform(1.0, 120.0, N).astype(np.float32)

    occ_ref = np.zeros(N, bool)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    for s in range(S):
        t, hit = GS.intersect(oj, dj, jnp.asarray(c[s], jnp.float32),
                              jnp.asarray(r[s], jnp.float32))
        t = np.asarray(t)
        ok = (
            np.asarray(hit) & (t < t_max) & (np.int32(s) != excl)
            & (ents[s] != excl_ent)
        )
        occ_ref |= ok

    occ = np.asarray(occludes_spheres(
        cs, n_chunks, oj, dj, jnp.asarray(excl), jnp.asarray(excl_ent),
        jnp.asarray(t_max), interpret=True,
    ))
    # f32 kernel vs double-single reference: tolerate grazing-ray flips.
    flips = (occ != occ_ref).sum()
    assert flips <= N * 0.01, f"{flips} occlusion flips"
