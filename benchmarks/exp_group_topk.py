"""De-risk the transposed per-ray-group kernel design: launch-side costs.

The design gives every 8-ray group its own nearest-K candidate-chunk list
(vs today's per-1024/2048-lane block list), attacking the measured ~40x
block-union amplification.  Feasibility hinges on the launch-side costs at
dragon scale (345k lanes -> 43k groups, 2339 chunks):

  1. per-group interval cull keys: (NG, C) grid of interval slab tests;
  2. nearest-K selection: lax.top_k over (NG, C) -- TPU TopK has
     historically lowered to a full sort, which would kill the idea;
  3. per-group candidate-count statistics: how tight is the 8-ray union
     (decides K and the overflow rate).

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return out, sorted(ts)[len(ts) // 2]


def main():
    from paths_tpu.scene.yaml_loader import load_scene_description
    from paths_tpu.scene.build import build_scene
    from paths_tpu.ops import sorted_traverse as STV
    from paths_tpu.ops import pallas_traverse as PT

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = load_scene_description(os.path.join(repo, "scenes/dragon_standin.yml"))
    static, scene, cam = build_scene(sd)
    C = static.pallas_tri_chunks
    meta = scene.ptris.chunk_meta
    print(json.dumps({"chunks": C, "tris_rows": int(scene.ptris.tris.shape[0])}),
          flush=True)

    # Dragon-scale incoherent bounce wave: cosine-hemisphere rays from the
    # mesh's bounding volume (same construction as exp_block_rows.py).
    rng = np.random.default_rng(0)
    N = 345600
    lo, hi = [np.asarray(x) for x in PT._meta_bounds(meta)]
    o = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    t_ub = jnp.full(N, 3.4e38, jnp.float32)

    # Coherence-sort the wave like the launcher does.
    perm = PT._coherence_perm(oj, dj, jnp.asarray(lo), jnp.asarray(hi),
                              octant_major=True)
    oj = jnp.take(oj, perm, axis=0)
    dj = jnp.take(dj, perm, axis=0)

    # 1. per-group interval cull at group sizes 8 / 32 / 128 lanes, vs the
    #    current block (2048) granularity.
    def cull_keys(gn):
        npad = -(-N // gn) * gn
        op = jnp.pad(oj, ((0, npad - N), (0, 0)), constant_values=1e30)
        dp = jnp.pad(dj, ((0, npad - N), (0, 0)), constant_values=1.0)
        tp = jnp.pad(t_ub, (0, npad - N))
        f = jax.jit(lambda o, d, t: STV._block_cull_keys(o, d, t, meta, C, gn))
        keys, dt = timed(f, op, dp, tp)
        cnt = jnp.sum(keys < STV._MISS, axis=1)
        return keys, dt, cnt

    for gn in (128, 1024, 2048):
        keys, dt, cnt = cull_keys(gn)
        c = np.asarray(cnt)
        print(json.dumps({
            "granularity_lanes": gn, "cull_ms": round(dt * 1e3, 2),
            "cand_mean": round(float(c.mean()), 1),
            "cand_p50": int(np.percentile(c, 50)),
            "cand_p99": int(np.percentile(c, 99)),
            "cand_max": int(c.max()),
        }), flush=True)

    # Group=8 granularity needs its own bounds math (sub-rows of 128 are the
    # floor for _block_cull_keys); compute interval bounds over each 8-lane
    # group directly.
    def group8_keys(o, d, t):
        G = o.shape[0] // 8
        ob = o.reshape(G, 8, 3)
        db = d.reshape(G, 8, 3)
        alive = ob[..., 0] < STV._DEAD
        am = alive[..., None]
        olo = jnp.min(jnp.where(am, ob, PT.BIG), axis=1)
        ohi = jnp.max(jnp.where(am, ob, -PT.BIG), axis=1)
        dlo = jnp.min(jnp.where(am, db, PT.BIG), axis=1)
        dhi = jnp.max(jnp.where(am, db, -PT.BIG), axis=1)
        t_m = jnp.max(jnp.where(alive, t.reshape(G, 8), -PT.BIG), axis=1)
        row_alive = jnp.any(alive, axis=1)
        clo = meta[:C, 0:3]
        chi = meta[:C, 3:6]
        tmin = jnp.full((G, C), -PT.BIG)
        tmax = jnp.full((G, C), PT.BIG)
        for ax in range(3):
            dl = dlo[:, ax:ax + 1]
            dh = dhi[:, ax:ax + 1]
            same = (dl > 0.0) | (dh < 0.0)
            il = 1.0 / jnp.where(same, dh, 1.0)
            ih = 1.0 / jnp.where(same, dl, 1.0)
            nlo_lo = clo[None, :, ax] - ohi[:, ax:ax + 1]
            nlo_hi = clo[None, :, ax] - olo[:, ax:ax + 1]
            nhi_lo = chi[None, :, ax] - ohi[:, ax:ax + 1]
            nhi_hi = chi[None, :, ax] - olo[:, ax:ax + 1]

            def pb(nl, nh):
                p1, p2, p3, p4 = nl * il, nl * ih, nh * il, nh * ih
                return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                        jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

            lo1, hi1 = pb(nlo_lo, nlo_hi)
            lo2, hi2 = pb(nhi_lo, nhi_hi)
            near = jnp.where(same, jnp.minimum(lo1, lo2), -PT.BIG)
            far = jnp.where(same, jnp.maximum(hi1, hi2), PT.BIG)
            tmin = jnp.maximum(tmin, near)
            tmax = jnp.minimum(tmax, far)
        hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < t_m[:, None]) \
            & row_alive[:, None]
        return jnp.where(hit, tmin, STV._MISS)

    f8 = jax.jit(group8_keys)
    keys8, dt8 = timed(f8, oj, dj, t_ub)
    c8 = np.asarray(jnp.sum(keys8 < STV._MISS, axis=1))
    print(json.dumps({
        "granularity_lanes": 8, "cull_ms": round(dt8 * 1e3, 2),
        "cand_mean": round(float(c8.mean()), 1),
        "cand_p50": int(np.percentile(c8, 50)),
        "cand_p90": int(np.percentile(c8, 90)),
        "cand_p99": int(np.percentile(c8, 99)),
        "cand_max": int(c8.max()),
        "frac_over_64": round(float((c8 > 64).mean()), 4),
        "frac_over_128": round(float((c8 > 128).mean()), 4),
    }), flush=True)

    # 2. top_k over the (NG, C) keys.
    for k in (64, 128):
        fk = jax.jit(lambda keys, k=k: jax.lax.top_k(-keys, k))
        _, dtk = timed(fk, keys8)
        print(json.dumps({"topk_k": k, "topk_ms": round(dtk * 1e3, 2)}),
              flush=True)

    # 3. argsort baseline at group granularity for comparison.
    fs = jax.jit(lambda keys: jnp.argsort(keys, axis=1))
    try:
        _, dts = timed(fs, keys8)
        print(json.dumps({"full_argsort_ms": round(dts * 1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"full_argsort_error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
