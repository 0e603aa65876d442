"""Mesh-path benchmark: rays/s on the bundled mesh scenes (teapot/bunny).

Same timing discipline as bench.py (scalar-reducing jit, fetch-synced,
median of reps).  Usage:
    python benchmarks/bench_mesh.py [scene.yml] [spp]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene(scene_path: str, spp: int, tile: int = 345600, reps: int = 3):
    from functools import partial

    import numpy as np
    import jax
    import jax.numpy as jnp
    from paths_tpu.scene.yaml_loader import load_scene_description
    from paths_tpu.scene.build import build_scene
    from paths_tpu.render import render_samples, tiled_pixel_order

    @partial(jax.jit, static_argnums=(0, 7))
    def wave_sum(static, scene, cam, px, py, pid, s0, n_samples, seed):
        return render_samples(
            static, scene, cam, px, py, pid, s0, n_samples, seed
        ).sum()

    sd = load_scene_description(scene_path)
    static, scene, cam = build_scene(sd)
    W, H = sd.camera.image_width, sd.camera.image_height
    tile = min(tile, W * H)
    pix = tiled_pixel_order(W, H)[:tile]
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)

    float(wave_sum(static, scene, cam, px, py, pid, jnp.uint32(0), spp, 0))
    times = []
    for r in range(reps):
        t0 = time.time()
        float(wave_sum(static, scene, cam, px, py, pid,
                       jnp.uint32((r + 1) * spp), spp, 0))
        times.append(time.time() - t0)
    dt = statistics.median(times)
    return tile * spp / dt, times


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/scenes/teapot.yml"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rps, times = bench_scene(path, spp)
    print(json.dumps({"scene": path.rsplit("/", 1)[-1], "spp": spp,
                      "rays_per_sec": round(rps, 1),
                      "times": [round(t, 3) for t in times]}))
