"""Experiment: TRUE candidate-union per group vs the conservative interval
cull.  exp_group_cull measures the interval-arithmetic union the kernel
actually uses; this measures the exact per-lane slab tests OR-reduced over
the group -- the gap between the two is recoverable by replacing the
interval cull with an exact OR-union pre-pass, the gap between group sizes
is only recoverable by finer work granularity / lane clustering.

Usage: python benchmarks/exp_true_union.py [n_tris] [coherent|incoherent|bounce]
"""

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_traverse import make_mesh, make_rays  # noqa: E402
from benchmarks.exp_group_cull import make_bounce_rays  # noqa: E402


def exact_lane_hits(o, d, t_ub, meta, n_chunks):
    """Exact per-lane slab test vs every chunk AABB: (N, C) bool."""
    from paths_tpu.ops.pallas_traverse import BIG

    clo = meta[:n_chunks, 0:3]
    chi = meta[:n_chunks, 3:6]
    inv = 1.0 / d  # (N, 3)
    tmin = jnp.full((o.shape[0], n_chunks), -BIG)
    tmax = jnp.full((o.shape[0], n_chunks), BIG)
    for ax in range(3):
        t0 = (clo[None, :, ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t1 = (chi[None, :, ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    alive = o[:, 0] < 1e29
    return (tmin <= tmax) & (tmax > 0.0) & (tmin < t_ub[:, None]) & alive[:, None]


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    kind = sys.argv[2] if len(sys.argv) > 2 else "bounce"
    N = 337 * 1024

    from paths_tpu.bvh.build import build_bvh
    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.ops import sorted_traverse as STV

    v0, v1, v2, n = make_mesh(T)
    tmn = np.minimum(np.minimum(v0, v1), v2)
    tmx = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmn, tmx, leaf_size=PT.PACK_LEAF)
    v0, v1, v2, n = (a[flat.order] for a in (v0, v1, v2, n))
    ct, C = PT.pack_chunked(flat, v0, v1, v2, n,
                            rows_per_chunk=STV.ROWS_PER_CHUNK_SORTED)
    print(f"mesh {len(v0)} tris, {C} chunks, wave {N}, kind={kind}")

    if kind == "bounce":
        o, d = make_bounce_rays(v0, v1, v2, n, N)
    else:
        o, d = make_rays(N, coherent=(kind == "coherent"))

    lo, hi = PT._meta_bounds(ct.chunk_meta)
    perm = PT._coherence_perm(jnp.asarray(o), jnp.asarray(d), lo, hi,
                              octant_major=True)
    o_s = jnp.take(jnp.asarray(o), perm, axis=0)
    d_s = jnp.take(jnp.asarray(d), perm, axis=0)
    t_ub = jnp.full(N, PT.BIG, jnp.float32)

    @partial(jax.jit, static_argnums=(0,))
    def union_batch(g, o_b, d_b, t_b):
        hit = exact_lane_hits(o_b, d_b, t_b, ct.chunk_meta, C)
        G = o_b.shape[0] // g
        return jnp.any(hit.reshape(G, g, C), axis=1).sum(axis=1)

    BATCH = 16 * 1024
    for g in (1024, 128, 16, 1):
        counts = []
        for s in range(0, N, BATCH):
            counts.append(np.asarray(union_batch(
                g, o_s[s:s + BATCH], d_s[s:s + BATCH], t_ub[s:s + BATCH])))
        cand = np.concatenate(counts)
        print(f"  true union group={g:5d}: mean={cand.mean():8.1f}  "
              f"p95={np.percentile(cand, 95):8.0f}  max={cand.max():6.0f}"
              f"   ({100 * cand.mean() / C:.1f}% of chunks)")


if __name__ == "__main__":
    main()
