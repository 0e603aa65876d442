"""One-off experiment: isolate per-chunk-visit cost in the sorted kernel.

Variants: rows_per_chunk in {8, 15}, row gates on/off.  Not part of the
benchmark suite -- a scratch harness for kernel tuning.
"""

import statistics
import sys
import time
import os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_traverse import make_mesh, make_rays  # noqa: E402


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

    packs = {}
    for R in (8, 15):
        ct, c = PT.pack_chunked(flat, v0, v1, v2, n, rows_per_chunk=R)
        packs[R] = (ct, c)
        print(f"R={R}: {c} chunks")

    for coh in (True, False):
        o, d = make_rays(N, coherent=coh)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        tag = "coherent" if coh else "incoherent"
        for R in (8, 15):
            ct, c = packs[R]
            for gates in (True, False):
                ST._ROW_GATES = gates
                fn = jax.jit(
                    lambda o_, d_, ct=ct, c=c, R=R: hit_sum(
                        ST.closest_hit_sorted(
                            ct, c, o_, d_, excl, t_init,
                            rows_per_chunk=R, stream=True)[0])
                )
                dt = timed(lambda: float(fn(oj, dj)))
                print(f"  [{tag}] R={R:2d} gates={int(gates)}: "
                      f"{dt*1e3:8.2f} ms ({N/dt/1e6:6.2f} Mray/s)")
    ST._ROW_GATES = True


if __name__ == "__main__":
    main()
