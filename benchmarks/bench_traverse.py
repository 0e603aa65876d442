"""Micro-benchmark: traversal kernels head-to-head on the real chip.

Compares the linear culled-chunk kernel (pallas_traverse.closest_hit_chunked,
VMEM-resident, 32-row chunks) against the sorted kernels
(sorted_traverse.closest_hit_sorted, resident and streaming) on
camera-coherent and scrambled (incoherent) waves over a parametric mesh.

Usage: python benchmarks/bench_traverse.py [n_tris]
"""

import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_mesh(T, seed=0):
    """A bumpy sphere shell with ~T triangles (dense, teapot-like locality)."""
    rng = np.random.default_rng(seed)
    n_lat = max(8, int(np.sqrt(T / 2)))
    n_lon = 2 * n_lat
    lat = np.linspace(0.05, np.pi - 0.05, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    r = 1.0 + 0.1 * np.sin(5 * LA) * np.cos(7 * LO)
    x = r * np.sin(LA) * np.cos(LO)
    y = r * np.cos(LA)
    z = r * np.sin(LA) * np.sin(LO)
    V = np.stack([x, y, z], -1).reshape(-1, 3)
    idx = np.arange(n_lat * n_lon).reshape(n_lat, n_lon)
    a = idx[:-1, :]
    b = idx[1:, :]
    c = np.roll(idx[:-1, :], -1, axis=1)
    d = np.roll(idx[1:, :], -1, axis=1)
    f1 = np.stack([a.ravel(), b.ravel(), c.ravel()], -1)
    f2 = np.stack([c.ravel(), b.ravel(), d.ravel()], -1)
    F = np.concatenate([f1, f2])
    v0, v1, v2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    ok = nn[:, 0] > 1e-12
    v0, v1, v2, n = v0[ok], v1[ok], v2[ok], n[ok] / nn[ok]
    return v0, v1, v2, n


def make_rays(N, seed=1, coherent=True):
    rng = np.random.default_rng(seed)
    if coherent:
        # Camera-like: common origin plane, directions toward the mesh.
        px = rng.uniform(-1.2, 1.2, N)
        py = rng.uniform(-1.2, 1.2, N)
        o = np.stack([px, py, np.full(N, -4.0)], -1)
        tgt = np.stack([px * 0.8, py * 0.8, np.zeros(N)], -1)
        d = tgt - o
        srt = np.lexsort((py // 0.075, px // 0.075))  # tile-ish coherence
        o, d = o[srt], d[srt]
    else:
        o = rng.uniform(-2, 2, (N, 3))
        d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def timed(fn, reps=5):
    fn()  # warmup (compile + first fetch)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    N = 345600

    from paths_tpu.bvh.build import build_bvh
    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.ops import sorted_traverse as ST

    v0, v1, v2, n = make_mesh(T)
    print(f"mesh: {len(v0)} tris, wave: {N} rays")
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmin, tmax, leaf_size=PT.PACK_LEAF)
    v0, v1, v2, n = (a[flat.order] for a in (v0, v1, v2, n))

    ct32, c32 = PT.pack_chunked(flat, v0, v1, v2, n, rows_per_chunk=32)
    ct8, c8 = PT.pack_chunked(flat, v0, v1, v2, n,
                              rows_per_chunk=ST.ROWS_PER_CHUNK_SORTED)
    fits_vmem = PT.vmem_bytes(len(v0), 2 * len(v0)) < PT.VMEM_LIMIT_BYTES
    print(f"chunks: linear={c32} sorted={c8}; fits VMEM: {fits_vmem}")

    excl = jnp.full(N, -1, jnp.int32)
    t_init = jnp.full(N, PT.BIG, jnp.float32)

    def hit_sum(t):
        # Clamped: grazing f32 hits can carry t ~ 1e7 and near-ties resolve
        # differently across processing orders -- don't let them dominate.
        return jnp.where(t < 1e38, jnp.minimum(t, 100.0), 0.0).sum()

    # Candidate statistics + precompute-only timing for the sorted path.
    from jax import lax

    @jax.jit
    def cull_stats(o_, d_):
        from paths_tpu.ops.sorted_traverse import _block_cull_sort
        perm = PT._coherence_perm(o_, d_, *PT._meta_bounds(ct8.chunk_meta))
        o_s = jnp.take(o_, perm, axis=0)
        d_s = jnp.take(d_, perm, axis=0)
        npad = -(-N // PT.BLOCK_N) * PT.BLOCK_N
        pad = npad - N
        o_s = jnp.concatenate([o_s, jnp.full((pad, 3), 1e30, o_s.dtype)])
        d_s = jnp.concatenate([d_s, jnp.ones((pad, 3), d_s.dtype)])
        t_s = jnp.concatenate([t_init, jnp.zeros(pad, t_init.dtype)])
        ids, keys = _block_cull_sort(o_s, d_s, t_s, ct8.chunk_meta, c8)
        cand = (keys < 1e38).sum(axis=1)
        return cand.mean(), cand.max(), jnp.where(keys < 1e38, keys, 0.0).sum()

    for coh in (True, False):
        o, d = make_rays(N, coherent=coh)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        tag = "coherent" if coh else "incoherent"

        mean_c, max_c, _ = (float(x) for x in cull_stats(oj, dj))
        dt_pre = timed(lambda: float(cull_stats(oj, dj)[2]))
        print(f"  [{tag}] candidates/block: mean={mean_c:.1f} max={max_c:.0f} "
              f"of {c8}; cull+sort precompute: {dt_pre*1e3:.2f} ms")

        variants = {}
        if fits_vmem:
            variants["linear-resident-32"] = jax.jit(
                lambda o_, d_: hit_sum(PT.closest_hit_chunked(
                    ct32, c32, o_, d_, excl, t_init)[0])
            )
            variants["sorted-resident-8"] = jax.jit(
                lambda o_, d_: hit_sum(ST.closest_hit_sorted(
                    ct8, c8, o_, d_, excl, t_init, stream=False)[0])
            )
        variants["sorted-stream-8"] = jax.jit(
            lambda o_, d_: hit_sum(ST.closest_hit_sorted(
                ct8, c8, o_, d_, excl, t_init, stream=True)[0])
        )

        ref = None
        for name, fn in variants.items():
            dt = timed(lambda: float(fn(oj, dj)))
            val = float(fn(oj, dj))
            if ref is None:
                ref = val
            print(f"  [{tag}] {name:>22}: {dt*1e3:8.2f} ms  "
                  f"({N/dt/1e6:7.1f} Mray/s)  sum={val:.6g} "
                  f"{'OK' if abs(val-ref) < abs(ref)*1e-3 + 1 else 'MISMATCH'}")


if __name__ == "__main__":
    main()
