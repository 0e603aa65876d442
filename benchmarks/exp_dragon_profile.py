"""Experiment: where does the dragon render actually spend its time?

Renders scenes/dragon_standin.yml one full 345k-lane wave at increasing
max_bounces and with/without NEE (shadow rays), so the marginal cost of
each bounce depth and of the occlusion queries falls out by differencing.

Usage: python benchmarks/exp_dragon_profile.py [scene.yml]
"""

import dataclasses
import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/dragon_standin.yml"

    from functools import partial

    from paths_tpu.render import render_samples, tiled_pixel_order
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.yaml_loader import load_scene_description

    @partial(jax.jit, static_argnums=(0, 7))
    def wave_sum(static, scene, cam, px, py, pid, s0, n_samples, seed):
        return render_samples(
            static, scene, cam, px, py, pid, s0, n_samples, seed).sum()

    sd = load_scene_description(scene_path)
    static0, scene, cam = build_scene(sd)
    W, H = sd.camera.image_width, sd.camera.image_height
    pix = tiled_pixel_order(W, H)
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)
    print(f"{scene_path}: {static0.n_tris} tris, {static0.pallas_tri_chunks} "
          f"chunks, stream={static0.pallas_tri_stream}, wave {W*H}")

    def run(static, label):
        f = lambda: float(wave_sum(static, scene, cam, px, py, pid,
                                   jnp.uint32(0), 1, 0))
        f()
        ts = []
        for _ in range(3):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        dt = statistics.median(ts)
        print(f"  {label:24s}: {dt*1e3:8.1f} ms/wave ({W*H/dt/1e6:.3f} Mray/s)")
        return dt

    prev = 0.0
    for mb in (0, 1, 2, 4, 10):
        dt = run(dataclasses.replace(static0, max_bounces=mb),
                 f"max_bounces={mb}")
        if mb:
            print(f"{'':28s}marginal: {(dt-prev)*1e3:7.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
