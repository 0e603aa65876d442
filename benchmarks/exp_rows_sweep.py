"""Experiment: rows_per_chunk sweep for the sorted streaming kernel.

Hypothesis (from incoherent-walk arithmetic): per-chunk-visit SCALAR
overhead (~400ns: SMEM id/key reads, while-loop, lax.cond branch, DMA
wait) dominates large-mesh walks, so bigger chunks amortize it near-
linearly until row tests / coarser early exit push back.

Usage: python benchmarks/exp_rows_sweep.py [n_tris] [rows ...]
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


def timed(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    rows_list = [int(v) for v in sys.argv[2:]] or [15, 30, 45, 60]
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

    excl = jnp.full(N, -1, jnp.int32)
    t_init = jnp.full(N, PT.BIG, jnp.float32)

    def hit_sum(t):
        return jnp.where(t < 1e38, jnp.minimum(t, 100.0), 0.0).sum()

    waves = {
        "coherent": make_rays(N, coherent=True),
        "bounce": make_bounce_rays(v0, v1, v2, n, N),
        "incoherent": make_rays(N, coherent=False),
    }
    ref = {}
    for rows in rows_list:
        ct, C = PT.pack_chunked(flat, v0, v1, v2, n, rows_per_chunk=rows)
        for cond in (True, False):
            os.environ["PATHS_TPU_NO_CHUNK_COND"] = "0" if cond else "1"
            for tag, (o, d) in waves.items():
                oj, dj = jnp.asarray(o), jnp.asarray(d)
                fn = jax.jit(lambda o_, d_, ct=ct, C=C, rows=rows: hit_sum(
                    ST.closest_hit_sorted(ct, C, o_, d_, excl, t_init,
                                          rows_per_chunk=rows, stream=True)[0]))
                dt = timed(lambda: float(fn(oj, dj)))
                val = float(fn(oj, dj))
                ok = "OK"
                if tag in ref:
                    ok = "OK" if abs(val - ref[tag]) < abs(ref[tag]) * 1e-3 + 1 else "MISMATCH"
                else:
                    ref[tag] = val
                print(f"  rows={rows:3d} C={C:5d} cond={int(cond)} "
                      f"[{tag:10s}]: {dt*1e3:8.2f} ms "
                      f"({N/dt/1e6:6.2f} Mray/s) {ok}")
        os.environ.pop("PATHS_TPU_NO_CHUNK_COND", None)


if __name__ == "__main__":
    main()
