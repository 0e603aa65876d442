"""Experiment: dragon_standin full-wave time vs kernel config knobs
(block_rows x rows_per_chunk), rebuilding the scene per config.

Usage: python benchmarks/exp_dragon_cfg.py [scene] [spp]
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


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/dragon_standin.yml"

    from paths_tpu.render import render_samples, tiled_pixel_order
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.yaml_loader import load_scene_description

    @partial(jax.jit, static_argnums=(0, 7))
    def wave_sum(static, scene, cam, px, py, pid, s0, n_samples, seed):
        return render_samples(
            static, scene, cam, px, py, pid, s0, n_samples, seed).sum()

    sd = load_scene_description(scene_path)
    W, H = sd.camera.image_width, sd.camera.image_height
    pix = tiled_pixel_order(W, H)
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)

    for rows in (15, 10):
        for br in (16, 32):
            os.environ["PATHS_TPU_ROWS_PER_CHUNK"] = str(rows)
            os.environ["PATHS_TPU_BLOCK_ROWS"] = str(br)
            static, scene, cam = build_scene(sd)
            f = lambda r: float(wave_sum(static, scene, cam, px, py, pid,
                                         jnp.uint32(r), 1, 0))
            f(0)
            ts = []
            for r in range(3):
                t0 = time.time()
                f(r + 1)
                ts.append(time.time() - t0)
            dt = statistics.median(ts)
            print(f"  rows={rows:2d} block_rows={br:2d}: {dt*1e3:8.1f} ms/wave"
                  f" ({W*H/dt/1e6:.3f} Mray/s)", flush=True)
    os.environ.pop("PATHS_TPU_ROWS_PER_CHUNK", None)
    os.environ.pop("PATHS_TPU_BLOCK_ROWS", None)


if __name__ == "__main__":
    main()
