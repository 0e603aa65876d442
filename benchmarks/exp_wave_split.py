"""Experiment: split one dragon-class bounce wave into its cost pieces.

Times, on a realistic bounce wave over the dragon-scale mesh:
  - the cull+argsort pre-pass alone (what _block_cull_sort costs)
  - the full closest-hit sorted streaming call (pre-pass + kernel + unsort)
  - the any-hit occlusion call with shadow-ray-like t_max
so the per-bounce ~300 ms marginal cost (exp_dragon_profile) decomposes.

Usage: python benchmarks/exp_wave_split.py [n_tris]
"""

import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_traverse import make_mesh  # noqa: E402
from benchmarks.exp_group_cull import make_bounce_rays  # noqa: E402


def timed(label, f, reps=5):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    dt = statistics.median(ts)
    print(f"  {label:40s}: {dt*1e3:8.1f} ms")
    return dt


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    N = 337 * 1024

    from paths_tpu.bvh.build import build_bvh
    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.ops import sorted_traverse as ST

    v0, v1, v2, n = make_mesh(T)
    tmn = np.minimum(np.minimum(v0, v1), v2)
    tmx = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmn, tmx, leaf_size=PT.PACK_LEAF)
    v0, v1, v2, n = (a[flat.order] for a in (v0, v1, v2, n))
    ct, C = PT.pack_chunked(flat, v0, v1, v2, n,
                            rows_per_chunk=ST.ROWS_PER_CHUNK_SORTED)
    print(f"mesh {len(v0)} tris, {C} chunks, wave {N}")

    o_np, d_np = make_bounce_rays(v0, v1, v2, n, N)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    excl = jnp.full(N, -1, jnp.int32)
    eent = jnp.full(N, -1, jnp.int32)
    t_init = jnp.full(N, PT.BIG, jnp.float32)
    # Shadow-like t_max: light ~3 units above, so t_max ~ distance scale.
    t_max = jnp.full(N, 3.0, jnp.float32)

    @jax.jit
    def cull_sort(o_, d_, t_):
        ids, keys = ST._block_cull_sort(o_, d_, t_, ct.chunk_meta, C)
        return ids.sum() + keys.sum()

    @jax.jit
    def cull_only(o_, d_, t_):
        return ST._block_cull_keys(o_, d_, t_, ct.chunk_meta, C).sum()

    @jax.jit
    def closest(o_, d_):
        t, i, e = ST.closest_hit_sorted(ct, C, o_, d_, excl, t_init)
        return t.sum() + i.sum() + e.sum()

    @jax.jit
    def occl(o_, d_):
        h = ST.occludes_sorted(ct, C, o_, d_, excl, eent, t_max)
        return h.sum()

    @jax.jit
    def perm_only(o_, d_):
        lo, hi = PT._meta_bounds(ct.chunk_meta)
        p = PT._coherence_perm(o_, d_, lo, hi, octant_major=True)
        return p.sum()

    timed("coherence perm (sort lanes)", lambda: perm_only(o, d).block_until_ready())
    timed("block cull keys only", lambda: cull_only(o, d, t_init).block_until_ready())
    timed("block cull + chunk argsort", lambda: cull_sort(o, d, t_init).block_until_ready())
    timed("closest_hit_sorted (stream) total", lambda: closest(o, d).block_until_ready())
    timed("occludes_sorted (stream) total", lambda: occl(o, d).block_until_ready())


if __name__ == "__main__":
    main()
