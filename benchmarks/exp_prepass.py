"""Experiment: decompose the sorted-traversal XLA pre-pass cost on TPU.

Components per wave: (1) coherence lane sort (argsort N + gather), (2)
interval block-cull keys (G x C vector math), (3) per-block front-to-back
argsort (G x C) + gather, (4) unsort scatter.  bench_traverse measured the
whole pre-pass at ~50ms on a 398k-tri mesh -- half the coherent wave time.

Usage: python benchmarks/exp_prepass.py [n_tris]
"""

import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_traverse import make_mesh, make_rays  # noqa: E402


def timed(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    N = 337 * 1024  # multiple of BLOCK_N (the cull's reshape granularity)

    from paths_tpu.bvh.build import build_bvh
    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.ops import sorted_traverse as STV

    v0, v1, v2, n = make_mesh(T)
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmin, tmax, leaf_size=PT.PACK_LEAF)
    v0, v1, v2, n = (a[flat.order] for a in (v0, v1, v2, n))
    ct, C = PT.pack_chunked(flat, v0, v1, v2, n,
                            rows_per_chunk=STV.ROWS_PER_CHUNK_SORTED)
    G = -(-N // PT.BLOCK_N)
    print(f"mesh {len(v0)} tris, {C} chunks, {G} blocks, wave {N}")

    o, d = make_rays(N, coherent=False)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t_ub = jnp.full(N, PT.BIG, jnp.float32)
    lo, hi = PT._meta_bounds(ct.chunk_meta)

    @jax.jit
    def lane_sort(o_, d_):
        perm = PT._coherence_perm(o_, d_, lo, hi, octant_major=True)
        cols = jnp.concatenate([o_, d_], axis=1)
        return jnp.take(cols, perm, axis=0).sum()

    @jax.jit
    def keys_only(o_, d_):
        return STV._block_cull_keys(o_, d_, t_ub, ct.chunk_meta, C).sum()

    @jax.jit
    def keys_sort(o_, d_):
        ids, keys = STV._block_cull_sort(o_, d_, t_ub, ct.chunk_meta, C)
        return keys.sum() + ids.sum()

    @jax.jit
    def unsort(o_):
        perm = PT._coherence_perm(o_, dj, lo, hi, octant_major=True)
        out = jnp.zeros_like(o_).at[perm].set(o_)
        return out.sum()

    for name, fn, args in [
        ("lane argsort+gather", lane_sort, (oj, dj)),
        ("cull keys (interval math)", keys_only, (oj, dj)),
        ("keys + per-block argsort", keys_sort, (oj, dj)),
        ("unsort scatter", unsort, (oj,)),
    ]:
        dt = timed(lambda: float(fn(*args)))
        print(f"  {name:28s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
