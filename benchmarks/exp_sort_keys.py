"""Experiment: lane-sort key design vs candidate-union per block.

The sorted kernels' cost per wave ~ n_blocks * E[union of block's candidate
chunks].  The sort key decides which lanes share a block.  Current key is
octant(3b, major) | morton30(origin).  exp_true_union shows per-lane
candidates ~15 but 1024-lane true unions ~1287: origin-tight groups still
diverge by direction *within* an octant.  This sweeps keys mixing origin
morton bits with finer direction bits (octahedral-map quantization) and
reports, per variant, the true OR-union and the interval-cull union (what
the kernel actually walks) at group=1024.

Usage: python benchmarks/exp_sort_keys.py [n_tris] [kind]
"""

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_traverse import make_mesh, make_rays  # noqa: E402
from benchmarks.exp_group_cull import make_bounce_rays, group_keys  # noqa: E402
from benchmarks.exp_true_union import exact_lane_hits  # noqa: E402


def octa_uv(d):
    """Octahedral map of |d| within its octant -> (u, v) in [0,1)^2.
    Directions in the same octant with close (u, v) are angularly close."""
    a = jnp.abs(d)
    s = a[:, 0] + a[:, 1] + a[:, 2]
    return a[:, 0] / s, a[:, 1] / s


def make_key(o, d, lo, hi, ko, kd):
    """[octant:3][morton_hi:3*ko][dir:2*kd][morton_mid:fill] in 32 bits
    (the lowest morton bits are dropped -- they only order lanes within a
    handful of neighbours and can't affect 1024-lane block membership)."""
    from paths_tpu.ops.pallas_traverse import _spread3

    ext = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((o - lo) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    m = _spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1) | (_spread3(q[:, 2]) << 2)
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] < 0).astype(jnp.uint32) << 2)
    )
    hi_bits = 3 * ko
    lo_keep = min(30 - hi_bits, 32 - 3 - hi_bits - 2 * kd)
    m_hi = m >> (30 - hi_bits)
    m_lo = (m >> (30 - hi_bits - lo_keep)) & ((1 << lo_keep) - 1)
    u, v = octa_uv(d)
    qu = jnp.clip(u * (1 << kd), 0, (1 << kd) - 1).astype(jnp.uint32)
    qv = jnp.clip(v * (1 << kd), 0, (1 << kd) - 1).astype(jnp.uint32)
    dq = (qu << kd) | qv
    key = octant
    key = (key << hi_bits) | m_hi
    key = (key << (2 * kd)) | dq
    key = (key << lo_keep) | m_lo
    return key


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
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    lo, hi = PT._meta_bounds(ct.chunk_meta)
    t_ub = jnp.full(N, PT.BIG, jnp.float32)

    @partial(jax.jit, static_argnums=(0,))
    def true_union_batch(g, o_b, d_b, t_b):
        hit = exact_lane_hits(o_b, d_b, t_b, ct.chunk_meta, C)
        G = o_b.shape[0] // g
        return jnp.any(hit.reshape(G, g, C), axis=1).sum(axis=1)

    @jax.jit
    def interval_union(o_s, d_s, t_s):
        hit = group_keys(o_s, d_s, t_s, ct.chunk_meta, C, 1024)
        return hit.sum(axis=1)

    def report(name, perm):
        o_s = jnp.take(o, perm, axis=0)
        d_s = jnp.take(d, perm, axis=0)
        BATCH = 16 * 1024
        counts = []
        for s in range(0, N, BATCH):
            counts.append(np.asarray(true_union_batch(
                1024, o_s[s:s + BATCH], d_s[s:s + BATCH], t_ub[s:s + BATCH])))
        tr = np.concatenate(counts)
        iv = np.asarray(interval_union(o_s, d_s, t_ub))
        print(f"  {name:34s}: true mean={tr.mean():7.1f} p95={np.percentile(tr, 95):6.0f}"
              f"   interval mean={iv.mean():7.1f} p95={np.percentile(iv, 95):6.0f}")

    perm0 = PT._coherence_perm(o, d, lo, hi, octant_major=True)
    report("current (oct|morton30)", perm0)

    for ko in (3, 4, 5, 6, 8):
        for kd in (2, 3, 4):
            key = make_key(o, d, lo, hi, ko, kd)
            perm = jnp.argsort(key).astype(jnp.int32)
            report(f"oct|m_hi{3*ko}|dir{2*kd}|m_lo", perm)


if __name__ == "__main__":
    main()
