"""Experiment: is the streaming walk DMA-latency-bound?

Two probes on the same bounce wave:
  1. resident vs stream on a mesh small enough for VMEM residence -- the
     delta is pure DMA/ring overhead;
  2. STREAM_NBUF (prefetch ring depth) sweep on a dragon-scale mesh --
     if deeper rings speed the walk, the loop is waiting on copies.

Usage: python benchmarks/exp_stream_cost.py [small_T] [big_T]
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


def timed(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def setup(T):
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
    return ct, C, v0, v1, v2, n


def main():
    smallT = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    bigT = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
    N = 337 * 1024

    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.ops import sorted_traverse as ST

    excl = jnp.full(N, -1, jnp.int32)
    t_init = jnp.full(N, PT.BIG, jnp.float32)

    ct, C, v0, v1, v2, n = setup(smallT)
    o, d = (jnp.asarray(a) for a in make_bounce_rays(v0, v1, v2, n, N))
    print(f"small mesh {C} chunks ({ct.tris.shape[0]*512/1e6:.1f} MB)")
    for stream in (False, True):
        fn = jax.jit(lambda o_, d_, s=stream: ST.closest_hit_sorted(
            ct, C, o_, d_, excl, t_init, stream=s)[0].sum())
        dt = timed(lambda: fn(o, d).block_until_ready())
        print(f"  stream={int(stream)}: {dt*1e3:8.1f} ms")

    ct, C, v0, v1, v2, n = setup(bigT)
    o, d = (jnp.asarray(a) for a in make_bounce_rays(v0, v1, v2, n, N))
    print(f"big mesh {C} chunks ({ct.tris.shape[0]*512/1e6:.1f} MB)")
    for nbuf in (2, 4, 8, 16):
        ST.STREAM_NBUF = nbuf
        fn = jax.jit(lambda o_, d_, nb=nbuf: ST.closest_hit_sorted(
            ct, C, o_, d_, excl, t_init, stream=True)[0].sum())
        dt = timed(lambda: fn(o, d).block_until_ready())
        print(f"  NBUF={nbuf:2d}: {dt*1e3:8.1f} ms")
    ST.STREAM_NBUF = 4


if __name__ == "__main__":
    main()
