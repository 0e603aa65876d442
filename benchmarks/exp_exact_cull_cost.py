"""Experiment: what do the exact-cull pre-pass pieces cost on the TPU?

The sorted kernel walks the block's INTERVAL-cull candidate list (mean 2057
chunks/block on the dragon bounce wave) while the true per-block union is
1287 and the per-128-lane-row union is 450 (exp_true_union).  Replacing the
interval cull with exact per-lane tests buys 1.6x (block granularity) to
~3x (sublane-row granularity) fewer chunk visits -- IF the pre-pass is
affordable.  This times, on the real wave shapes:

  1. exact per-lane slab tests vs all chunks, fused OR+min reduce to
     per-group (1024 and 128) hit masks + entry keys;
  2. the (G, C) argsort that turns keys into a walk order, at G=337
     (blocks) and G=2696 (sublane rows);
  3. the current interval cull + argsort, for reference.

Usage: python benchmarks/exp_exact_cull_cost.py [n_tris]
"""

import os
import statistics
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_traverse import make_mesh  # noqa: E402
from benchmarks.exp_group_cull import make_bounce_rays  # noqa: E402


def timeit(label, f, reps=5):
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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
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
    print(f"mesh {len(v0)} tris, {C} chunks, wave {N}")

    o_np, d_np = make_bounce_rays(v0, v1, v2, n, N)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    t_ub = jnp.full(N, PT.BIG, jnp.float32)
    meta = ct.chunk_meta
    lo, hi = PT._meta_bounds(meta)

    clo = meta[:C, 0:3]
    chi = meta[:C, 3:6]

    @partial(jax.jit, static_argnums=(0,))
    def exact_group_cull(g, o_, d_, t_):
        """Per-lane slab tests vs all chunks, reduced to per-group-of-g
        (any-hit, min-entry) -- returns keys (N//g, C): min tmin where some
        lane hits, _MISS otherwise."""
        G = o_.shape[0] // g
        ob = o_.reshape(G, g, 3)
        db = d_.reshape(G, g, 3)
        tb = t_.reshape(G, g)
        inv = 1.0 / db
        tmin = jnp.full((G, g, C), -PT.BIG)
        tmax = jnp.full((G, g, C), PT.BIG)
        for ax in range(3):
            t0_ = (clo[None, None, :, ax] - ob[:, :, ax:ax+1]) * inv[:, :, ax:ax+1]
            t1_ = (chi[None, None, :, ax] - ob[:, :, ax:ax+1]) * inv[:, :, ax:ax+1]
            tmin = jnp.maximum(tmin, jnp.minimum(t0_, t1_))
            tmax = jnp.minimum(tmax, jnp.maximum(t0_, t1_))
        alive = ob[..., 0] < STV._DEAD
        hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < tb[..., None]) & alive[..., None]
        key = jnp.min(jnp.where(hit, tmin, STV._MISS), axis=1)
        return key

    @jax.jit
    def argsort_rows(keys):
        order = jnp.argsort(keys, axis=1).astype(jnp.int32)
        return order, jnp.take_along_axis(keys, order, axis=1)

    @jax.jit
    def interval_cull_sort(o_, d_, t_):
        return STV._block_cull_sort(o_, d_, t_, meta, C)

    # Pre-pass candidates in one jit each (realistic fusion).
    for g in (1024, 128):
        keys = exact_group_cull(g, o, d, t_ub)
        keys.block_until_ready()
        timeit(f"exact cull g={g} (fused OR/min reduce)",
               lambda g=g: exact_group_cull(g, o, d, t_ub).block_until_ready())
        timeit(f"argsort rows ({N//g}, {C})",
               lambda keys=keys: argsort_rows(keys)[0].block_until_ready())

    timeit("current interval cull+sort (337 blocks)",
           lambda: interval_cull_sort(o, d, t_ub)[0].block_until_ready())

    # Hierarchical variant: exact per-lane at SUPERCHUNK level (cheap),
    # then chunk-level interval cull gated by the superchunk mask.
    SUP = 64  # chunks per superchunk
    nsup = -(-C // SUP)
    slo = np.full((nsup, 3), np.inf, np.float32)
    shi = np.full((nsup, 3), -np.inf, np.float32)
    clo_np = np.asarray(clo)
    chi_np = np.asarray(chi)
    for s in range(nsup):
        sl = slice(s * SUP, min((s + 1) * SUP, C))
        slo[s] = clo_np[sl].min(axis=0)
        shi[s] = chi_np[sl].max(axis=0)
    slo_j = jnp.asarray(slo)
    shi_j = jnp.asarray(shi)

    @partial(jax.jit, static_argnums=(0,))
    def hier_cull(g, o_, d_, t_):
        G = o_.shape[0] // g
        ob = o_.reshape(G, g, 3)
        db = d_.reshape(G, g, 3)
        tb = t_.reshape(G, g)
        inv = 1.0 / db
        tmin = jnp.full((G, g, nsup), -PT.BIG)
        tmax = jnp.full((G, g, nsup), PT.BIG)
        for ax in range(3):
            t0_ = (slo_j[None, None, :, ax] - ob[:, :, ax:ax+1]) * inv[:, :, ax:ax+1]
            t1_ = (shi_j[None, None, :, ax] - ob[:, :, ax:ax+1]) * inv[:, :, ax:ax+1]
            tmin = jnp.maximum(tmin, jnp.minimum(t0_, t1_))
            tmax = jnp.minimum(tmax, jnp.maximum(t0_, t1_))
        alive = ob[..., 0] < STV._DEAD
        hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < tb[..., None]) & alive[..., None]
        sup_mask = jnp.any(hit, axis=1)  # (G, nsup)
        ikeys = STV._block_cull_keys(o_, d_, t_, meta, C) if g == 1024 else None
        if ikeys is None:
            return sup_mask
        gate = jnp.repeat(sup_mask, SUP, axis=1)[:, :C]
        return jnp.where(gate, ikeys, STV._MISS)

    keys_h = hier_cull(1024, o, d, t_ub)
    nh = (np.asarray(keys_h) < STV._MISS).sum(axis=1)
    print(f"  hier (exact-super g=1024 AND interval) union: mean={nh.mean():.1f} "
          f"p95={np.percentile(nh, 95):.0f}")
    timeit("hier cull g=1024 (super-exact AND interval)",
           lambda: hier_cull(1024, o, d, t_ub).block_until_ready())


if __name__ == "__main__":
    main()
