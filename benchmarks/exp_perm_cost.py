"""Experiment: where does the per-traversal pre-pass time go NOW?

After the v2/block_rows kernel speedups the walk shrank ~1.7x, so the
XLA pre-pass (coherence perm argsort + payload gather + block cull +
chunk argsort + unsort scatter) is suspected to dominate dragon bounce
steps.  Times each piece at the production wave size.

Usage: python benchmarks/exp_perm_cost.py [n_tris] [block_rows]
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


def timed(label, f, reps=7):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    dt = statistics.median(ts)
    print(f"  {label:44s}: {dt*1e3:8.2f} ms")
    return dt


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    br = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    N = 336 * 1024

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
    print(f"mesh {len(v0)} tris, {C} chunks, wave {N}, block_rows={br}")

    o_np, d_np = make_bounce_rays(v0, v1, v2, n, N)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    t_ub = jnp.full(N, PT.BIG, jnp.float32)
    lo, hi = PT._meta_bounds(ct.chunk_meta)
    bn = br * 128

    @jax.jit
    def key_only(o_, d_):
        ext = jnp.maximum(hi - lo, 1e-20)
        q = jnp.clip((o_ - lo) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
        m = (PT._spread3(q[:, 0]) | (PT._spread3(q[:, 1]) << 1)
             | (PT._spread3(q[:, 2]) << 2))
        octant = ((d_[:, 0] < 0).astype(jnp.uint32)
                  | ((d_[:, 1] < 0).astype(jnp.uint32) << 1)
                  | ((d_[:, 2] < 0).astype(jnp.uint32) << 2))
        return (octant << 30) | m

    @jax.jit
    def argsort_only(k):
        return jnp.argsort(k).astype(jnp.int32)

    @jax.jit
    def take_payload(perm, o_, d_, t_):
        packed = jnp.concatenate(
            [o_, d_, t_[:, None], t_[:, None]], axis=1)
        return jnp.take(packed, perm, axis=0).sum()

    @jax.jit
    def unsort_scatter(perm, t_):
        packed = jnp.stack([t_, t_, t_], 1)
        return jnp.zeros_like(packed).at[perm].set(packed).sum()

    @jax.jit
    def cull_keys(o_, d_, t_):
        return ST._block_cull_keys(o_, d_, t_, ct.chunk_meta, C, bn).sum()

    @jax.jit
    def cull_sort(o_, d_, t_):
        ids, keys = ST._block_cull_sort(o_, d_, t_, ct.chunk_meta, C, bn)
        return ids.sum() + keys.sum()

    @jax.jit
    def full_perm(o_, d_):
        return PT._coherence_perm(o_, d_, lo, hi, octant_major=True).sum()

    k = key_only(o, d)
    perm = argsort_only(k)
    timed("morton+octant key", lambda: key_only(o, d).block_until_ready())
    timed("argsort keys (345k u32)", lambda: argsort_only(k).block_until_ready())
    timed("payload gather (8 cols take)", lambda: take_payload(perm, o, d, t_ub).block_until_ready())
    timed("unsort scatter (3 cols)", lambda: unsort_scatter(perm, t_ub).block_until_ready())
    timed("_coherence_perm total", lambda: full_perm(o, d).block_until_ready())
    timed(f"block cull keys (G={N//bn})", lambda: cull_keys(o, d, t_ub).block_until_ready())
    timed("block cull + chunk argsort", lambda: cull_sort(o, d, t_ub).block_until_ready())


if __name__ == "__main__":
    main()
