"""Multi-chip scaling harness: rays/s/chip at 1/2/4/8 devices.

On a machine without a pod this measures the *SPMD program* on virtual CPU
devices (the same 8-device emulation the test suite uses): each device count
runs in a fresh subprocess (device count is fixed per process), renders the
same dp-sharded production wave (dist.sharded_render_samples), and reports
throughput.  NB virtual CPU devices share one host's cores, so absolute
numbers and even scaling efficiency are bounded by the physical core count
-- the harness's purpose off-pod is to (a) prove the sharded path runs at
every mesh size and (b) give a conservative lower bound on scaling; on real
ICI the collective-free forward path has no cross-chip traffic at all.

Usage:
    python benchmarks/bench_scaling.py            # parent: runs 1/2/4/8
    python benchmarks/bench_scaling.py --worker N # one measurement
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = 9216  # divides 1/2/4/8
N_SAMPLES = 2
MAX_BOUNCES = 4
# > _UNROLL_MAX so the chunked-scan intersector is used: the unrolled
# small-scene path compiles each sphere's test inline, which XLA CPU takes
# tens of minutes to compile at 64 spheres x 5 bounce iterations.
N_SPHERES = 100


def worker(n_devices: int):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass

    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from paths_tpu import camera as C
    from paths_tpu.dist import make_mesh, sharded_render_samples
    from paths_tpu.render import tiled_pixel_order
    from paths_tpu.scene.build import build_scene
    from paths_tpu.scene.stress import generate_stress_scene

    assert len(jax.devices()) >= n_devices
    mesh = make_mesh(jax.devices()[:n_devices])

    sd = generate_stress_scene(N_SPHERES, seed=0)
    static, scene, cam = build_scene(sd)
    static = dataclasses.replace(static, max_bounces=MAX_BOUNCES)
    W, H = 96, 96
    cam = C.resize(cam, W, H)
    pix = tiled_pixel_order(W, H)[:LANES]
    px = jnp.asarray((pix % W).astype(np.int32))
    py = jnp.asarray((pix // W).astype(np.int32))
    pid = jnp.asarray(pix)

    fwd = sharded_render_samples(static, mesh, n_samples=N_SAMPLES)

    def run(s0):
        return float(fwd(scene, cam, px, py, pid, jnp.uint32(s0), 0).sum())

    run(0)  # compile + first fetch
    times = []
    for r in range(5):
        t0 = time.time()
        run((r + 1) * N_SAMPLES)
        times.append(time.time() - t0)
    dt = statistics.median(times)
    rays = LANES * N_SAMPLES
    print(json.dumps({
        "devices": n_devices,
        "rays_per_sec": round(rays / dt, 1),
        "rays_per_sec_per_chip": round(rays / dt / n_devices, 1),
        "times": [round(t, 4) for t in times],
    }))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    results = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"devices={n}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec))
    if results and results[0]["devices"] == 1:
        base = results[0]["rays_per_sec"]
        for r in results[1:]:
            eff = r["rays_per_sec"] / (base * r["devices"])
            print(f"scaling efficiency @ {r['devices']} devices: {eff:.2%}")


if __name__ == "__main__":
    main()
