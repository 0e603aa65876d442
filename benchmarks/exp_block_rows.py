"""Experiment: ray-block sublane count (block_rows) sweep.

Hypothesis: the row test is SCALAR-bound -- 128 scalar VMEM reads +
broadcasts per row (16 fields x 8 slots) serialize on the scalar unit
(~270 ns) while the vector math is ~96 ns, so a (8,128) block wastes the
VPU.  Wider blocks amortize the broadcasts over more lanes: the splat
registers are reused across sublane tiles.  Counter-pressure: the block
cull's candidate union grows with block size (dragon bounce wave:
1039 chunks @1024 lanes -> 1530 @4096), but blocks shrink 4x, so total
chunk visits DROP 2.7x.  Net effect measured here.

Usage: python benchmarks/exp_block_rows.py [n_tris] [rows ...]
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
from benchmarks.exp_group_cull import make_bounce_rays  # noqa: E402


def timed(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    rows_list = [int(v) for v in sys.argv[2:]] or [8, 16, 32, 64]
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

    excl = jnp.full(N, -1, jnp.int32)
    eent = jnp.full(N, -1, jnp.int32)
    t_init = jnp.full(N, PT.BIG, jnp.float32)
    t_max = jnp.full(N, 3.0, jnp.float32)

    waves = {
        "coherent": make_rays(N, coherent=True),
        "bounce": make_bounce_rays(v0, v1, v2, n, N),
    }
    ref = {}
    for tag, (o_np, d_np) in waves.items():
        o, d = jnp.asarray(o_np), jnp.asarray(d_np)
        for br in rows_list:
            fn = jax.jit(lambda o_, d_, br=br: ST.closest_hit_sorted(
                ct, C, o_, d_, excl, t_init, block_rows=br)[0].sum())
            fo = jax.jit(lambda o_, d_, br=br: ST.occludes_sorted(
                ct, C, o_, d_, excl, eent, t_max, block_rows=br).sum())
            fv = jax.jit(lambda o_, d_, br=br: jnp.where(
                (t := ST.closest_hit_sorted(
                    ct, C, o_, d_, excl, t_init, block_rows=br)[0]) < 1e30,
                t, -1.0))
            dt = timed(lambda: fn(o, d).block_until_ready())
            dto = timed(lambda: fo(o, d).block_until_ready())
            val = np.asarray(fv(o, d))
            key = tag
            if key in ref:
                bad = int((np.abs(val - ref[key]) > 1e-4).sum())
                ok = "OK" if bad == 0 else f"MISMATCH({bad} lanes)"
            else:
                ref[key] = val
                ok = "ref"
            print(f"  [{tag:8s}] block_rows={br:3d}: closest {dt*1e3:8.1f} ms"
                  f"   occl {dto*1e3:8.1f} ms   {ok}")


if __name__ == "__main__":
    main()
