"""Measure the CPU anchor on THIS host.

The Rust reference cannot be built here (no cargo, no network: rustup and
pypi are unreachable -- attempted 2026-08-20); its only perf surface is the
runtime rays/s counter (/root/reference/src/main.rs:107-112).  The stand-in
anchor is paths_tpu/native/cpu_tracer.cc -- an independent C++
implementation of the reference's exact algorithm (same BVH capability,
same materials, same integrator semantics) run with the reference's worker
count (4 threads, main.rs:87).  Numbers it prints are the per-scene
``vs_baseline`` denominators for bench.py / BASELINE.md.

A "ray" is a pixel-sample (the reference's counting unit, renderer.rs:101):
one ≤11-bounce path + its NEE shadow rays.

Usage: python benchmarks/bench_anchor.py [--threads N] [--spp N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = [
    ("spheres_on_plane", "/root/reference/scenes/spheres_on_plane.yml"),
    ("bokeh_demo", "/root/reference/scenes/bokeh_demo.yml"),
    ("teapot", "/root/reference/scenes/teapot.yml"),
    ("bunny", "/root/reference/scenes/bunny.yml"),
    ("doom_standin", "scenes/doom_standin.yml"),
    ("dragon_standin", "scenes/dragon_standin.yml"),
    ("stress500", None),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4,
                    help="worker threads (reference uses 4, main.rs:87)")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--size", default="720x480")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from paths_tpu import camera as C
    from paths_tpu import native
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.stress import generate_stress_scene
    from paths_tpu.scene.yaml_loader import load_scene_description

    if not native.available():
        raise SystemExit("native library unavailable")

    W, H = (int(v) for v in args.size.split("x"))
    out = {}
    for name, path in SCENES:
        if path is None:
            sd = generate_stress_scene(500, seed=0)
        else:
            sd = load_scene_description(path)
        static, arrays, cam = build_scene(sd)
        cam = C.resize(cam, W, H)
        # Warm run at 1spp (BVH build + cache warm), then timed run.
        native.cpu_render(static, arrays, cam, W, H, 1, seed=7,
                          n_threads=args.threads)
        t0 = time.time()
        native.cpu_render(static, arrays, cam, W, H, args.spp, seed=7,
                          n_threads=args.threads)
        dt = time.time() - t0
        rps = W * H * args.spp / dt
        out[name] = round(rps, 1)
        print(f"{name:20s} {rps/1e6:8.3f} M pixel-samples/s "
              f"({dt:6.2f}s @ {args.spp}spp {W}x{H}, {args.threads} threads)")
    print(json.dumps({"threads": args.threads, "spp": args.spp,
                      "size": args.size, "anchor_rays_per_sec": out}))


if __name__ == "__main__":
    main()
