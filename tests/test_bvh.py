"""BVH tests: structural invariants of the skip-link flatten, and traversal
equivalence against the brute-force scan on real meshes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import REFERENCE_DIR
from paths_tpu.bvh.build import build_bvh, LEAF_SIZE
from paths_tpu.bvh.traverse import closest_hit_bvh
from paths_tpu import integrator as I
from paths_tpu.scene.yaml_loader import load_scene_description
from paths_tpu.scene.build import build_scene


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 3))
    v0 = base
    v1 = base + rng.uniform(-1, 1, (n, 3))
    v2 = base + rng.uniform(-1, 1, (n, 3))
    return v0, v1, v2


def test_build_invariants():
    v0, v1, v2 = _random_tris(500)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    b = build_bvh(tri_min, tri_max)

    # Permutation covers all prims exactly once.
    assert sorted(b.order.tolist()) == list(range(500))
    # Leaves cover [0, T) disjointly.
    leaves = b.prim_count > 0
    spans = sorted(
        zip(b.prim_start[leaves].tolist(), b.prim_count[leaves].tolist())
    )
    pos = 0
    for s, c in spans:
        assert s == pos
        assert 1 <= c <= LEAF_SIZE
        pos += c
    assert pos == 500
    # Inner hit_link is the next preorder node; links stay in range or -1.
    inner = ~leaves
    np.testing.assert_array_equal(
        b.hit_link[inner], np.nonzero(inner)[0] + 1
    )
    assert ((b.miss_link >= -1) & (b.miss_link < b.n_nodes)).all()
    # Child AABBs nested in parents: verified transitively via traversal test.


@pytest.fixture(scope="module")
def teapot():
    sd = load_scene_description(os.path.join(REFERENCE_DIR, "scenes", "teapot.yml"))
    # Force the BVH on (the default threshold prefers brute force at 6.3k tris).
    return build_scene(sd, search_dirs=[REFERENCE_DIR], bvh_threshold=64)


def test_teapot_uses_bvh(teapot):
    static, scene, cam = teapot
    assert static.use_bvh
    assert scene.bvh is not None


def test_traversal_matches_bruteforce(teapot):
    static, scene, cam = teapot
    rng = np.random.default_rng(2)
    N = 512
    # Rays from a shell aimed at the teapot's bounding volume.
    o = rng.uniform(-8, 8, (N, 3))
    o[:, 1] = np.abs(o[:, 1]) + 3.0
    tgt = rng.uniform(-2, 2, (N, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    no_excl = jnp.zeros(N, jnp.int32)
    t_init = jnp.full(N, 3.4e38, jnp.float32)

    t_bvh, i_bvh = jax.jit(
        lambda s, o, d: closest_hit_bvh(s, o, d, no_excl, no_excl, t_init)
    )(scene, o, d)
    t_bf, i_bf = jax.jit(
        lambda s, o, d: I._scan_tris(static, s, o, d, no_excl, no_excl)
    )(scene, o, d)

    t_bvh, t_bf = np.asarray(t_bvh), np.asarray(t_bf)
    hit_bvh = t_bvh < 1e38
    hit_bf = t_bf < 1e38
    np.testing.assert_array_equal(hit_bvh, hit_bf)
    np.testing.assert_allclose(t_bvh[hit_bvh], t_bf[hit_bf], rtol=1e-5)
    # Same triangle (or an exactly-coincident one).
    same = np.asarray(i_bvh)[hit_bvh] == np.asarray(i_bf)[hit_bf]
    assert same.mean() > 0.99


def test_traversal_exclusion(teapot):
    static, scene, cam = teapot
    # A ray starting exactly on triangle 0, excluded: must not hit tri 0.
    v0 = np.asarray(scene.tri_v0[0])
    v1 = np.asarray(scene.tri_v1[0])
    v2 = np.asarray(scene.tri_v2[0])
    p = (v0 + v1 + v2) / 3.0
    o = jnp.asarray(p[None], jnp.float32)
    d = jnp.asarray(np.array([[0.0, 1.0, 0.0]]), jnp.float32)
    t, idx = closest_hit_bvh(
        scene, o, d,
        jnp.full(1, 2, jnp.int32), jnp.zeros(1, jnp.int32),
        jnp.full(1, 3.4e38, jnp.float32),
    )
    assert not (float(t[0]) < 1e30 and int(idx[0]) == 0)


def test_native_builder_matches_python():
    """C++ binned-SAH builder (native/bvh_builder.cc) produces a valid
    skip-link tree whose traversal finds identical closest hits to the
    Python builder's tree."""
    from paths_tpu import native
    from paths_tpu.bvh.build import _build_bvh_py

    if not native.available():
        pytest.skip("native library unavailable")

    v0, v1, v2 = _random_tris(4096, seed=3)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)

    out = native.build_bvh_native(tri_min, tri_max, LEAF_SIZE)
    assert out is not None
    (node_min, node_max, hit_link, miss_link, prim_start, prim_count,
     order, n_nodes, depth) = out

    # Structural invariants (same as the Python builder's).
    assert sorted(order.tolist()) == list(range(4096))
    leaves = prim_count > 0
    spans = sorted(zip(prim_start[leaves].tolist(), prim_count[leaves].tolist()))
    pos = 0
    for s, c in spans:
        assert s == pos
        assert 1 <= c <= LEAF_SIZE
        pos += c
    assert pos == 4096
    inner = ~leaves
    np.testing.assert_array_equal(hit_link[inner], np.nonzero(inner)[0] + 1)
    assert ((miss_link >= -1) & (miss_link < n_nodes)).all()

    # Root AABB identical to Python build (both cover all prims).
    pb = _build_bvh_py(tri_min, tri_max)
    np.testing.assert_allclose(node_min[0], pb.node_min[0], rtol=1e-6)
    np.testing.assert_allclose(node_max[0], pb.node_max[0], rtol=1e-6)

    # Traversal equivalence: same closest hit t on random rays through both
    # trees (prim ids differ under reordering; compare distances).
    from paths_tpu.scene.types import BvhArrays

    def scene_for(bvh_tuple, perm):
        nmin, nmax, hl, ml, ps, pc = bvh_tuple
        class S:  # minimal duck-typed scene for closest_hit_bvh
            bvh = BvhArrays(
                node_min=jnp.asarray(nmin), node_max=jnp.asarray(nmax),
                hit_link=jnp.asarray(hl), miss_link=jnp.asarray(ml),
                prim_start=jnp.asarray(ps), prim_count=jnp.asarray(pc),
            )
            tri_v0 = jnp.asarray(v0[perm], jnp.float32)
            tri_v1 = jnp.asarray(v1[perm], jnp.float32)
            tri_v2 = jnp.asarray(v2[perm], jnp.float32)
            tri_n = jnp.asarray(
                np.cross(v1 - v0, v2 - v0)[perm]
                / np.maximum(np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1, keepdims=True), 1e-12),
                jnp.float32,
            )
        return S()

    rng = np.random.default_rng(7)
    n_rays = 256
    o = rng.uniform(-15, 15, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    sn = scene_for((node_min, node_max, hit_link, miss_link, prim_start, prim_count), order)
    sp = scene_for((pb.node_min, pb.node_max, pb.hit_link, pb.miss_link,
                    pb.prim_start, pb.prim_count), pb.order)
    big = jnp.full(n_rays, 3.4e38, jnp.float32)
    excl = jnp.full(n_rays, -1, jnp.int32)
    kind = jnp.zeros(n_rays, jnp.int32)
    tn, _ = closest_hit_bvh(sn, jnp.asarray(o), jnp.asarray(d), kind, excl, big)
    tp, _ = closest_hit_bvh(sp, jnp.asarray(o), jnp.asarray(d), kind, excl, big)
    np.testing.assert_allclose(np.asarray(tn), np.asarray(tp), rtol=1e-5)
