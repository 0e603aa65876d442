"""Round-5 dragon-tier sweep: narrow ray blocks x replicated table x
occlusion-wave self-sort x forced wave sort.

VERDICT r4 named the untried cross: the replicated table removes the scalar
splat stream entirely (18% win at block_rows=8 where the walk is
scalar-bound, BASELINE.md), and narrower blocks have strictly tighter
per-block candidate unions (true OR union 29% vs block interval 47%), so
narrow blocks x rep may beat the current block_rows=16 x rep production
config.  Separately, the diagnosed reason wave-sort loses on big meshes is
occlusion rays riding the bounce sort -- PATHS_TPU_OCCL_SORT=1 gives the
shadow wave its own (light-relative) per-call sort.

Each config is measured END-TO-END on the driver-visible tier
(dragon_standin_4spp through bench.bench_scene, median of 3 reps) so
kernel-level wins that lose to launch overhead can't mislead.  Env vars are
resolved at scene build / outside jit, so one process can sweep: every
config lands in a distinct jit cache entry (block_rows / rep / occl_sort /
wave_presorted are SceneStatic fields).

Usage: python benchmarks/exp_dragon_sweep.py [scene ...]
  scene in {dragon, doom, teapot}; default dragon.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = {
    "dragon": ("scenes/dragon_standin.yml", 4, 2.818e5),
    "doom": ("scenes/doom_standin.yml", 4, 4.361e5),
    "teapot": ("/root/reference/scenes/teapot.yml", 4, 8.044e5),
}

# (label, env overrides).  Round-1 sweep (2026-08-21, BENCH-visible tier):
#   base br=16 rep=1            0.992x   <- r4 production config holds
#   br=8 rep=1                  0.884x   \  VERDICT r4's "narrow blocks x
#   br=4 rep=1                  Mosaic reject (sublane tile < 8)  } rep"
#   br=8 rep=0                  0.775x   /  hypothesis FALSIFIED
#   br=16 rep=0                 0.969x
#   ws=1 occl={0,1} br=16 rep=1 0.601x both: occlusion self-sort does NOT
#     rescue wave-sort on big meshes; the wave-sort loss is not the
#     occlusion key (VERDICT r4 hypothesis 2 falsified at dragon scale).
# Round 2 swept chunk granularity / chunk-cond / stream depth (dragon):
#   base rows=15 nbuf=4         0.993x (anyhit select removal: no change)
#   rows=8 0.926 | rows=12 0.980 | rows=20 1.002
#   no-chunk-cond               0.697x  <- the per-chunk any-lane cond
#                                          saves ~30%, keep it
#   nbuf=8                      1.014x  <- rep's 860 KB/chunk copies were
#   nbuf=2                      0.919x     latency-exposed at ring depth 4
# Round 3 composes the winners and re-tests wave-sort after the root-miss
# wave-key fix (render.py: mesh-root-missing lanes now pack to the tail).
# Round 3 (dragon/doom, post root-miss wave-key fix):
#   dragon: nbuf8 rows20 1.025 | rows31 1.018 | nbuf16 1.012 |
#           ws=1 occl={0,1} 0.80 both (up from 0.60 pre-fix; still off)
#   doom:   nbuf8 rows20 1.696 | rows31 1.442 | nbuf16 1.728 |
#           ws=1 occl={0,1} 1.527 both (base 1.73; ws stays off)
#   rep=0 @ nbuf8 rows20: dragon 0.974 (rep keeps winning)
# Round 4 fine-tuned that point (reproducible <0.1%): rows=18 1.022 |
# rows=24 1.025 | occl-rep neutral | nbuf=12 1.031 -> STREAM_NBUF 12.
# Round 5's decisive change is SUB-BLOCK ROW-TEST GATING
# (sorted_traverse._half_cond_enabled): per-(8,128)-sub-block conds keep
# admission 1024-lane-granular at any block width, flipping the optimal
# width to 64 -- dragon 1.031 -> 1.107 (br16+sub) -> 1.199 (br32) ->
# 1.219x (br64; br128 1.202), doom 1.731 -> 1.897x (br64), and the
# sphere kernels 4.66 -> 4.93x (stress-500, sph_br=64).  At wide blocks
# the replicated table became ESSENTIAL (no-rep br64 0.836x: every
# sub-block re-splats compact-slot scalars) and wave-sort still loses
# (dragon 1.194, doom 1.82 vs 1.90 -- gate stays).  These are the
# production defaults now; the configs below sweep AROUND them for the
# next round.
CONFIGS = [
    ("base (br=64 sub-cond rows=20 nbuf=12 rep)", {}),
    ("br=32", {"PATHS_TPU_BLOCK_ROWS": "32"}),
    ("br=128", {"PATHS_TPU_BLOCK_ROWS": "128"}),
    ("no-sub-cond", {"PATHS_TPU_HALF_COND": "0",
                     "PATHS_TPU_BLOCK_ROWS": "16"}),
    ("rows=15", {"PATHS_TPU_ROWS_PER_CHUNK": "15"}),
    ("ws=1", {"PATHS_TPU_WAVE_SORT": "1"}),
]

_SWEEP_KEYS = [
    "PATHS_TPU_BLOCK_ROWS", "PATHS_TPU_TRI_REP", "PATHS_TPU_WAVE_SORT",
    "PATHS_TPU_OCCL_SORT", "PATHS_TPU_ROWS_PER_CHUNK",
    "PATHS_TPU_NO_CHUNK_COND", "PATHS_TPU_STREAM_NBUF",
    "PATHS_TPU_OCCL_REP", "PATHS_TPU_HALF_COND",
    "PATHS_TPU_SPH_BLOCK_ROWS",
]


def run_one(name: str, idx: int):
    """Run one config in THIS process (env already set by the driver).
    One process per config: PATHS_TPU_STREAM_NBUF binds at import and
    PATHS_TPU_NO_CHUNK_COND at trace time, so in-process sweeping would
    silently reuse the first-compiled schedule."""
    import bench

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path, spp, anchor = SCENES[name]
    if not os.path.isabs(path):
        path = os.path.join(repo, path)
    label, _ = CONFIGS[idx]
    t0 = time.time()
    try:
        rps = bench.bench_scene(path, spp=spp, reps=3)
        rec = {"scene": name, "config": label,
               "rays_per_sec": round(rps, 1),
               "vs_anchor": round(rps / anchor, 3),
               "wall_s": round(time.time() - t0, 1)}
    except Exception as e:
        rec = {"scene": name, "config": label,
               "error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(rec), flush=True)


def main():
    import subprocess

    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(sys.argv[i + 2], int(sys.argv[i + 1]))
        return
    names = [a for a in sys.argv[1:] if a in SCENES] or ["dragon"]
    for name in names:
        path, spp, anchor = SCENES[name]
        print(f"== {name} ({spp}spp, anchor {anchor:.3e}) ==", flush=True)
        for idx, (label, env) in enumerate(CONFIGS):
            child = dict(os.environ)
            for k in _SWEEP_KEYS:
                child.pop(k, None)
            child.update(env)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 str(idx), name],
                env=child, capture_output=True, text=True, timeout=1200,
            )
            out = [l for l in r.stdout.splitlines() if l.startswith("{")]
            print(out[-1] if out else json.dumps(
                {"config": label, "error": r.stderr[-200:]}), flush=True)


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
