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
