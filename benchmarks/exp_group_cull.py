"""Experiment: how does the candidate-chunk union scale with ray-group size?

The sorted kernels walk, per 1024-lane block, the union of the block's
lanes' candidate chunks.  BASELINE.md names this union blowup as the
dragon-class bottleneck.  This script measures, on the coherence-sorted
wave (exactly what the kernel sees), the mean/max candidate count per group
for group sizes 1024 (current block), 128 (one VPU lane row), 16, and 1
(per-lane floor) -- the available speedup from finer work granularity is
the ratio between the 1024 row and the finer rows.

Usage: python benchmarks/exp_group_cull.py [n_tris] [coherent|incoherent|bounce]
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_traverse import make_mesh, make_rays  # noqa: E402


def make_bounce_rays(v0, v1, v2, n, N, seed=3):
    """Diffuse-bounce-like wave: origins on mesh faces, cosine directions
    about the (outward) normal -- the realistic hard case for the walk."""
    rng = np.random.default_rng(seed)
    f = rng.integers(0, len(v0), N)
    b = rng.dirichlet((1, 1, 1), N)
    o = b[:, :1] * v0[f] + b[:, 1:2] * v1[f] + b[:, 2:3] * v2[f]
    nn = n[f]
    u, v = rng.random(N), rng.random(N)
    r = np.sqrt(u)
    th = 2 * np.pi * v
    local = np.stack([r * np.cos(th), 1.0 - u, r * np.sin(th)], -1)
    a = np.where((np.abs(nn[:, 1]) < 0.9)[:, None], [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    t = np.cross(a, nn)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    bb = np.cross(nn, t)
    d = local[:, :1] * t + local[:, 1:2] * nn + local[:, 2:3] * bb
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (o + 1e-4 * nn).astype(np.float32), d.astype(np.float32)


def group_keys(o, d, t_ub, meta, n_chunks, gsize):
    """_block_cull_keys generalised to group size gsize (same interval
    math, different reshape)."""
    from paths_tpu.ops.pallas_traverse import BIG
    from paths_tpu.ops import sorted_traverse as STV

    G = o.shape[0] // gsize
    ob = o.reshape(G, gsize, 3)
    db = d.reshape(G, gsize, 3)
    tb = t_ub.reshape(G, gsize)
    alive = ob[..., 0] < STV._DEAD
    am = alive[..., None]
    olo = jnp.min(jnp.where(am, ob, BIG), axis=1)
    ohi = jnp.max(jnp.where(am, ob, -BIG), axis=1)
    dlo = jnp.min(jnp.where(am, db, BIG), axis=1)
    dhi = jnp.max(jnp.where(am, db, -BIG), axis=1)
    t_ub_g = jnp.max(jnp.where(alive, tb, -BIG), axis=1)
    block_alive = jnp.any(alive, axis=1)

    clo = meta[:n_chunks, 0:3]
    chi = meta[:n_chunks, 3:6]
    tmin = jnp.full((G, n_chunks), -BIG)
    tmax = jnp.full((G, n_chunks), BIG)
    for ax in range(3):
        dl = dlo[:, ax:ax + 1]
        dh = dhi[:, ax:ax + 1]
        same = (dl > 0.0) | (dh < 0.0)
        il = 1.0 / jnp.where(same, dh, 1.0)
        ih = 1.0 / jnp.where(same, dl, 1.0)
        nlo_lo = clo[None, :, ax] - ohi[:, ax:ax + 1]
        nlo_hi = clo[None, :, ax] - olo[:, ax:ax + 1]
        nhi_lo = chi[None, :, ax] - ohi[:, ax:ax + 1]
        nhi_hi = chi[None, :, ax] - olo[:, ax:ax + 1]

        def pb(nl, nh):
            ps = [nl * il, nl * ih, nh * il, nh * ih]
            return (jnp.minimum(jnp.minimum(ps[0], ps[1]), jnp.minimum(ps[2], ps[3])),
                    jnp.maximum(jnp.maximum(ps[0], ps[1]), jnp.maximum(ps[2], ps[3])))

        lo1, hi1 = pb(nlo_lo, nlo_hi)
        lo2, hi2 = pb(nhi_lo, nhi_hi)
        nl = jnp.where(same, jnp.minimum(lo1, lo2), -BIG)
        fu = jnp.where(same, jnp.maximum(hi1, hi2), BIG)
        tmin = jnp.maximum(tmin, nl)
        tmax = jnp.minimum(tmax, fu)

    hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < t_ub_g[:, None]) & block_alive[:, None]
    return hit


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    kind = sys.argv[2] if len(sys.argv) > 2 else "bounce"
    N = 337 * 1024  # multiple of every group size tested

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

    from functools import partial

    @partial(jax.jit, static_argnums=(0,), donate_argnums=())
    def stats_batch(gsize, o_b, d_b, t_b):
        hit = group_keys(o_b, d_b, t_b, ct.chunk_meta, C, gsize)
        return hit.sum(axis=1)

    # Batch over lane slices so the (groups, C) intermediates stay small.
    BATCH = 32 * 1024
    for g in (1024, 128, 16, 1):
        counts = []
        for s in range(0, N, BATCH):
            counts.append(np.asarray(stats_batch(
                g, o_s[s:s + BATCH], d_s[s:s + BATCH], t_ub[s:s + BATCH])))
        cand = np.concatenate(counts)
        print(f"  group={g:5d}: mean={cand.mean():8.1f}  "
              f"p95={np.percentile(cand, 95):8.0f}  max={cand.max():6.0f}"
              f"   ({100*cand.mean()/C:.1f}% of chunks)")


if __name__ == "__main__":
    main()
