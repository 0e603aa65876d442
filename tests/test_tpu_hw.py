"""Hardware (non-interpret) parity for the Mosaic-lowered traversal kernels.

The rest of the suite runs the Pallas kernels in INTERPRET mode on CPU
(conftest forces jax_platforms=cpu), which exercises the kernel *logic*
through XLA lowering but not the Mosaic compiler itself.  One documented
correctness dependency needs the real lowering: the min-composed hit mask
(ops/pallas_traverse.py _tri_row_test_v2) relies on ``jnp.minimum``
propagating NaN -- dead-lane 1e30 origins can yield finite t with NaN
barycentrics, and only NaN propagation through the min tree keeps ok False.
IEEE minimum does propagate NaN, XLA:TPU does, but nothing in interpret-mode
coverage proves MOSAIC's does.

This test runs the production kernels non-interpret on a real accelerator in
a subprocess (the suite's own process is pinned to CPU) and asserts
bit-identity against the interpret-mode (XLA-lowered) run of the SAME
inputs on the SAME device -- same f32 math, different compiler -- over a
wave deliberately salted with dead lanes (origin 1e30), near-overflow
origins, and axis-parallel rays (t = +-inf/NaN cases).  Skips cleanly when
no accelerator is reachable (the driver's CPU-only test runs).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
if dev.platform == "cpu":
    print(json.dumps({"skip": "no accelerator"}))
    sys.exit(0)

from paths_tpu.ops.pallas_traverse import pack_chunked
from paths_tpu.ops.sorted_traverse import (
    closest_hit_sorted, occludes_sorted, replicate_tris,
)
from paths_tpu.bvh.build import build_bvh

rng = np.random.default_rng(5)
T = 480
v0 = rng.uniform(-2, 2, (T, 3))
e1 = rng.normal(scale=0.4, size=(T, 3))
e2 = rng.normal(scale=0.4, size=(T, 3))
v1 = v0 + e1
v2 = v0 + e2
n = np.cross(e1, e2)
n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
ent = (np.arange(T) % 9).astype(np.int64)

tri_min = np.minimum(np.minimum(v0, v1), v2)
tri_max = np.maximum(np.maximum(v0, v1), v2)
flat = build_bvh(tri_min, tri_max, leaf_size=8)
v0, v1, v2, n, ent = (a[flat.order] for a in (v0, v1, v2, n, ent))
ct, n_chunks = pack_chunked(flat, v0, v1, v2, n, ent=ent, rows_per_chunk=15)
ct = ct._replace(tris_rep=replicate_tris(ct.tris))

N = 4096
o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
# Dead lanes: the integrator's origin push.  Their 1e30 components are the
# NaN mint (1e30 * g overflows, inf - inf = NaN in the barycentric forms).
o[500:900] = 1e30
# Near-overflow but live origins: finite t with garbage barycentrics.
o[900:1100] = np.float32(1e18) * np.sign(o[900:1100])
# Axis-parallel rays: cos == 0 - t = +-inf/NaN.
d[1100:1300] = 0.0
d[1100:1300, 0] = 1.0
excl = np.full(N, -1, np.int32)
excl[:200] = rng.integers(0, T, 200)

oj = jnp.asarray(o)
dj = jnp.asarray(d)
ej = jnp.asarray(excl)
t0 = jnp.full(N, np.float32(3.4e38))
eent = jnp.asarray(rng.integers(-1, 9, N).astype(np.int32))
tmx = jnp.full(N, np.float32(6.0))

report = {}
for name, kw in [
    ("stream", dict(stream=True, rep=False)),
    ("rep", dict(stream=True, rep=True)),
    ("resident", dict(stream=False, rep=False)),
    # Production block width: covers the Mosaic lowering of the round-5
    # sub-block row-test conds (block_rows >= 16 engages them).
    ("stream_br16_subcond", dict(stream=True, rep=False, block_rows=16)),
]:
    got = [np.asarray(x) for x in closest_hit_sorted(
        ct, n_chunks, oj, dj, ej, t0, interpret=False, **kw)]
    want = [np.asarray(x) for x in closest_hit_sorted(
        ct, n_chunks, oj, dj, ej, t0, interpret=True, **kw)]
    eq = all(np.array_equal(g, w) for g, w in zip(got, want))
    dead_miss = bool((got[0][500:900] >= 1e38).all())
    report[name] = {
        "bit_identical": bool(eq),
        "dead_lanes_all_miss": dead_miss,
        "hits": int((got[0] < 1e38).sum()),
    }
    og = np.asarray(occludes_sorted(
        ct, n_chunks, oj, dj, ej, eent, tmx, interpret=False, **kw))
    ow = np.asarray(occludes_sorted(
        ct, n_chunks, oj, dj, ej, eent, tmx, interpret=True, **kw))
    report[name]["anyhit_identical"] = bool(np.array_equal(og, ow))
    report[name]["anyhit_dead_clear"] = bool((~og[500:900]).all())
    report[name]["occluded"] = int(og.sum())
print(json.dumps(report))
"""


@pytest.mark.slow
def test_mosaic_min_nan_parity_on_hardware():
    # Inherit the environment untouched: the tunneled-TPU backend needs its
    # JAX_PLATFORMS / PYTHONPATH plumbing intact.  Only prepend the repo.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the suite's 8-virtual-CPU-device flag
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Persistent executable cache: repeat runs skip the ~6 kernel compiles.
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    try:
        out = subprocess.run(
            [sys.executable, "-c", _SCRIPT], env=env, cwd=_REPO,
            capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator subprocess timed out (tunnel stall)")
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        pytest.skip(f"accelerator unavailable: {out.stderr[-400:]}")
    report = json.loads(lines[-1])
    if "skip" in report:
        pytest.skip(report["skip"])
    for name, r in report.items():
        assert r["bit_identical"], (name, r)
        assert r["anyhit_identical"], (name, r)
        assert r["dead_lanes_all_miss"], (name, r)
        assert r["anyhit_dead_clear"], (name, r)
        assert r["hits"] > 0, (name, r)
        assert r["occluded"] > 0, (name, r)
