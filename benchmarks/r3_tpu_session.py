"""Round-3 consolidated TPU measurement session.

Runs, strictly serially on the one tunneled chip, everything the round-3
kernel work needs measured, and prints a compact report:

  1. pre-pass piece costs (exp_perm_cost inline, dragon-scale)
  2. dragon_standin full-wave: block_rows {16,32} x wave-sort {on,off}
  3. doom_standin / bunny / teapot wave timings at the chosen config
  4. stress-500 wave timing (sphere kernel path)

Usage: python benchmarks/r3_tpu_session.py [quick]
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


def timed(label, f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    dt = statistics.median(ts)
    print(f"  {label:52s}: {dt*1e3:9.1f} ms", flush=True)
    return dt


def wave_bench(scene_path, label, spp=1, env=None):
    """One full-wave render_samples timing for a scene, under env knobs."""
    import dataclasses

    from paths_tpu.render import render_samples, tiled_pixel_order
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.yaml_loader import load_scene_description

    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: str(v) for k, v in env.items()})
    try:
        sd = load_scene_description(scene_path)
        static, scene, cam = build_scene(sd)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    @partial(jax.jit, static_argnums=(0, 7))
    def wave_sum(st, sc, cm, px, py, pid, s0, n, seed):
        return render_samples(st, sc, cm, px, py, pid, s0, n, seed).sum()

    W, H = sd.camera.image_width, sd.camera.image_height
    pix = tiled_pixel_order(W, H)
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)
    f = lambda r: float(wave_sum(static, scene, cam, px, py, pid,
                                 jnp.uint32(r * spp), spp, 0))
    dt = timed(label, lambda r=[0]: (r.__setitem__(0, r[0] + 1),
                                     f(r[0]))[1])
    print(f"  {'':52s}  -> {W*H*spp/dt/1e6:.3f} Mray/s", flush=True)
    return W * H * spp / dt


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    print("== 1. pre-pass piece costs (dragon-scale synthetic) ==", flush=True)
    from benchmarks.bench_traverse import make_mesh
    from benchmarks.exp_group_cull import make_bounce_rays
    from paths_tpu.bvh.build import build_bvh
    from paths_tpu.ops import pallas_traverse as PT
    from paths_tpu.ops import sorted_traverse as ST

    v0, v1, v2, n = make_mesh(100000)
    tmn = np.minimum(np.minimum(v0, v1), v2)
    tmx = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(tmn, tmx, leaf_size=PT.PACK_LEAF)
    v0, v1, v2, n = (a[flat.order] for a in (v0, v1, v2, n))
    ct, C = PT.pack_chunked(flat, v0, v1, v2, n,
                            rows_per_chunk=ST.ROWS_PER_CHUNK_SORTED)
    N = 336 * 1024
    o_np, d_np = make_bounce_rays(v0, v1, v2, n, N)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    t_ub = jnp.full(N, PT.BIG, jnp.float32)
    lo, hi = PT._meta_bounds(ct.chunk_meta)

    @jax.jit
    def key_only(o_, d_):
        return PT._coherence_perm(o_, d_, lo, hi, octant_major=True)

    perm = key_only(o, d)
    perm.block_until_ready()
    timed("coherence perm (key+argsort, 344k)",
          lambda: key_only(o, d).block_until_ready())

    @jax.jit
    def take9(p, o_, d_, t_):
        packed = jnp.concatenate([o_, d_, t_[:, None], t_[:, None], t_[:, None]], 1)
        return jnp.take(packed, p, axis=0).sum()

    timed("payload gather (9 cols)", lambda: take9(perm, o, d, t_ub).block_until_ready())

    @jax.jit
    def unsort3(p, t_):
        packed = jnp.stack([t_, t_, t_], 1)
        return jnp.zeros_like(packed).at[p].set(packed).sum()

    timed("unsort scatter (3 cols)", lambda: unsort3(perm, t_ub).block_until_ready())

    for bn in (16 * 128, 32 * 128):
        @jax.jit
        def cullsort(o_, d_, t_, bn=bn):
            ids, keys = ST._block_cull_sort(o_, d_, t_, ct.chunk_meta, C, bn)
            return ids.sum() + keys.sum()

        timed(f"block cull + chunk argsort (block_n={bn})",
              lambda: cullsort(o, d, t_ub).block_until_ready())

    print("== 2. dragon config matrix ==", flush=True)
    results = {}
    cfgs = [("br32_ws1", {"PATHS_TPU_BLOCK_ROWS": 32, "PATHS_TPU_WAVE_SORT": 1}),
            ("br32_ws0", {"PATHS_TPU_BLOCK_ROWS": 32, "PATHS_TPU_WAVE_SORT": 0})]
    if not quick:
        cfgs += [("br16_ws1", {"PATHS_TPU_BLOCK_ROWS": 16, "PATHS_TPU_WAVE_SORT": 1})]
    for tag, env in cfgs:
        results[tag] = wave_bench("scenes/dragon_standin.yml",
                                  f"dragon 1-wave [{tag}]", env=env)

    print("== 3. other scenes (best dragon config) ==", flush=True)
    wave_bench("scenes/doom_standin.yml", "doom 1-wave")
    if not quick:
        wave_bench("/root/reference/scenes/teapot.yml", "teapot 1-wave")
        wave_bench("/root/reference/scenes/bunny.yml", "bunny 1-wave")

    print("== done ==", flush=True)


if __name__ == "__main__":
    main()
