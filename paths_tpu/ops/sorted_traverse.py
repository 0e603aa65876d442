"""Sorted, streaming Pallas traversal: per-block front-to-back chunk order
with early exit, and HBM-resident triangle tables.

This supersedes the linear culled-chunk scan in pallas_traverse.py as the
production triangle intersector.  Two problems with the linear scan:

  1. *Scale*: it keeps the whole packed table in VMEM, capping meshes at
     ~10k triangles (the reference's BVH handles arbitrary in-RAM scenes,
     bvh.rs:78-141,170-171).
  2. *Work*: each ray block brute-forces every chunk whose AABB it crosses,
     in layout order -- no front-to-back ordering, no early termination, so
     a primary ray tests hundreds of triangles where the reference's BVH
     tests tens.

The TPU-native fix splits traversal across the machine:

  - XLA (outside the kernel) computes, for every (ray block, chunk) pair, a
    *conservative* slab test by interval arithmetic over the block's ray
    bounds -- pure vectorised VPU math on a (n_blocks, n_chunks) grid --
    and argsorts each block's surviving chunks by their lower-bound entry
    distance.  This is the "traversal order" computation, done massively
    parallel where the TPU is strong, instead of per-step scalar logic
    where it is weak.
  - The Pallas kernel walks its block's sorted chunk list:
      * EARLY EXIT: keys are lower bounds of every lane's entry distance
        and ascend, so once every live lane's current best t is <= the next
        key, no remaining chunk can improve any lane -- break.  (The same
        invariant the reference's ordered stack traversal exploits,
        bvh.rs:110-127, block-wise.)
      * The chunk's 8 triangle rows are DMA'd HBM->VMEM, double-buffered
        (chunk k+1's copy is issued before chunk k is processed), so the
        table never needs to be VMEM-resident: mesh size is bounded by HBM,
        not VMEM.  ``resident=True`` skips the DMA and reads the rows
        straight from a VMEM-resident table (fastest for small meshes).
      * A precise per-lane slab test on the chunk AABB drops conservative
        false positives before any triangle math.

Layouts are shared with pallas_traverse.pack_chunked: tris (R, 128) leaf
rows of 8 triangle slots, chunk_meta (C, 128) rows [aabb lo, aabb hi, row0,
nrows].  Chunks here are ROWS_PER_CHUNK_SORTED rows (finer than the linear
kernel's 32: ordering + early exit make small chunks pay).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paths_tpu.ops.pallas_traverse import (
    BIG,
    BLOCK,
    BLOCK_N,
    PACK_LEAF,
    TRI_STRIDE,
    _SORT_MIN_N,
    _chunk_shift,
    _coherence_perm,
    _meta_bounds,
    _sphere_row_test,
    _tri_row_test_v2,
)

# Rows per chunk for the sorted kernels, RESIDENT tables.  At the
# round-5 wide blocks + sub-block row-test gating, finer chunks pay on
# resident meshes -- the per-chunk cull/cond granularity tightens while
# the (VMEM-read) per-chunk fixed cost is small: rows=8 measured teapot
# 4.05 -> 4.23x and doom 1.896 -> 1.923x anchor (doom rows=4: 1.801 --
# past the optimum; the pre-sub-block rounds had measured 15 best).
ROWS_PER_CHUNK_SORTED = 8

# STREAMED meshes use coarser chunks: the round-5 dragon sweep
# (benchmarks/exp_dragon_sweep.py, 2026-08-21) measured rows=20 at 1.025x
# anchor vs 0.993x at 15 (rows=31: 1.018, rows=12: 0.980, rows=8: 0.926;
# re-checked at block_rows=64 + sub-block gating: rows=8 1.151 vs rows=20
# 1.212) -- fewer, larger replicated-table DMAs amortise ring latency.
ROWS_PER_CHUNK_STREAMED = 20

# Streaming prefetch depth (ring buffer slots).  Default 12, measured
# round 5: the replicated table's ~1.15 MB/chunk copies are
# latency-exposed at depth 4 (dragon 0.993x -> 1.014x at 8 -> 1.031x at
# 12, exactly reproducible across passes; 16 at rows=15 gained nothing;
# 2 loses 7%).  PATHS_TPU_STREAM_NBUF overrides at IMPORT time (a fresh
# process per setting, since the constant is baked into traced kernels).
import os as _os

STREAM_NBUF = int(_os.environ.get("PATHS_TPU_STREAM_NBUF", 12))

# Per-row AABB gates.  Measured SLOWER than unconditionally testing every
# row (same 400k-tri waves: gates cost a scalar reduction + lax.cond per
# row, which Mosaic compiles to real branches that outweigh the ~50-op row
# tests they skip).  Kept as a knob for future hardware where branches are
# cheaper; the per-row AABBs stay in the meta layout either way.
_ROW_GATES = False


def _chunk_cond_enabled() -> bool:
    """Experiment knob: PATHS_TPU_NO_CHUNK_COND=1 drops the per-chunk
    any-lane-hit lax.cond and tests every row of every visited chunk
    unconditionally (same results -- the row test is t-gated per lane).
    MEASURED round 5: the cond EARNS its branch -- removing it drops the
    dragon tier 1.025x -> 0.697x."""
    import os

    return os.environ.get("PATHS_TPU_NO_CHUNK_COND", "") in ("", "0")


def _half_cond_enabled() -> bool:
    """Sub-block row-test gating (default ON; PATHS_TPU_HALF_COND=0 opts
    out): inside the per-chunk any-lane cond, the row tests run per
    (8,128) SUB-BLOCK under that sub-block's own precise any-lane test,
    so a chunk crossed by only some sub-blocks of a wide block pays row
    tests on those sub-blocks alone.  This decouples the two things
    block_rows used to couple -- per-visit FIXED costs (amortised over
    the whole block: meta read, slab test, DMA, loop machinery) and
    row-test ADMISSION (now at 1024-lane granularity regardless of
    width) -- which flips the optimum block width from 16 to 64:

    measured round 5 (driver tiers, rays/s vs anchor):
      dragon  br16 1.030 -> br16+sub 1.107 -> br32+sub 1.199 ->
              br64+sub 1.219 (br128 1.202)
      doom    br8 1.731 -> br16+sub 1.834 -> br32+sub 1.890 -> br64 1.896
      teapot  br8 4.006 -> br16+sub 4.081;  bunny br32+sub 3.377

    Same results either way: the row test is t-gated per lane, and a
    skipped sub-block is one whose precise slab test proves no lane can
    hit the chunk (bit-identity asserted in tests/test_sorted_traverse
    and on hardware in tests/test_tpu_hw.py)."""
    import os

    return os.environ.get("PATHS_TPU_HALF_COND", "1") == "1"

# Field-replicated triangle-table layout for the STREAMED kernels (opt-in,
# PATHS_TPU_TRI_REP=1).  The compact plane-form row packs 8 slots x 16
# fields into one (1,128) row, read by the row test as scalar extracts +
# splats; this layout stores each constant as a full (1,128) row so one
# (112,128) VMEM read + static sub-slices replaces the splats.  The table
# is 112x larger (dragon-class ~2 GB HBM, ~860 KB DMA/chunk -- still under
# the per-visit compute at ~820 GB/s) and is built ON DEVICE
# (replicate_tris) so it never crosses the host link.
#
# MEASURED (TPU v5e, dragon-scale 345k-lane incoherent wave, 2026-08-21):
# closest-hit 456 -> 432 ms, occlusion 342 -> 376 ms -- net neutral, so
# the default stays compact.  This experiment FALSIFIED the r3 roofline's
# "84% of row cost is scalar splats": removing every splat moved closest
# only 5%.  The decisive measurement is a no-row-test walk at 77 ms vs the
# real 456 ms -- the kernel is VPU-FLOP-BOUND on the pair tests themselves
# (~3.9e12 elem-ops/s ~= VPU peak), and the (1,128)->(block,128) sublane
# broadcasts this layout needs materialize vregs at roughly the cost the
# splats had.  Next meaningful lever: fewer pair tests, or the MXU.
REP_FIELDS = 14
# Source lanes within a compact slot: 12 plane-form floats, gid (12),
# ent (14); lanes 13/15 are pad.
_REP_SRC = tuple(range(12)) + (12, 14)

# HBM budget for the replicated table (the layout is 112x the compact one:
# ~7 KB/triangle, ~1.4 GB at 200k tris).  Past this the measured ~5%
# closest-hit gain is not worth risking HBM exhaustion on million-triangle
# meshes that stream fine without it; scene/build.py skips rep above the
# budget.  PATHS_TPU_TRI_REP_MAX_BYTES overrides (v5e has 16 GB HBM, most
# of it needed for wave state at full tile sizes).
REP_MAX_BYTES = 4 << 30


def rep_bytes(tris: "jnp.ndarray") -> int:
    """HBM bytes replicate_tris(tris) would occupy."""
    return tris.shape[0] * PACK_LEAF * REP_FIELDS * 128 * 4


def replicate_tris(tris: jnp.ndarray) -> jnp.ndarray:
    """(R, 128) compact plane-form rows -> (R * 8 * REP_FIELDS, 128)
    field-replicated rows, built on device."""
    R = tris.shape[0]
    slots = tris.reshape(R, PACK_LEAF, TRI_STRIDE)
    sel = slots[:, :, jnp.asarray(_REP_SRC, dtype=jnp.int32)]
    rep = jnp.broadcast_to(
        sel[..., None], (R, PACK_LEAF, REP_FIELDS, 128)
    )
    return rep.reshape(R * PACK_LEAF * REP_FIELDS, 128)


def _tri_row_test_rep(grp, o, d, excl_i, t_best, i_best, e_best,
                      excl_ent=None, any_hit=False, track_ent=True):
    """_tri_row_test_v2 over a replicated row GROUP: `grp` is the
    (PACK_LEAF * REP_FIELDS, 128) block of one 8-triangle row, each field a
    lane-replicated (1,128) row.  Identical math and semantics to
    _tri_row_test_v2 (same plane-form fields, same ok-mask, same any_hit
    collapse); only the constant delivery differs -- static sub-slices of
    one vector load + sublane broadcasts, no scalar splats."""
    blk = o[0].shape

    def bcast(k, f):
        j = k * REP_FIELDS + f
        return jnp.broadcast_to(grp[j:j + 1, :], blk)

    for k in range(PACK_LEAF):
        nrm = [bcast(k, j) for j in range(3)]
        dd_ = bcast(k, 3)
        g1 = [bcast(k, 4 + j) for j in range(3)]
        c1 = bcast(k, 7)
        g2 = [bcast(k, 8 + j) for j in range(3)]
        c2 = bcast(k, 11)
        gid = bcast(k, 12).astype(jnp.int32)
        ent = bcast(k, 13).astype(jnp.int32) if track_ent else None

        cos = nrm[0] * d[0] + nrm[1] * d[1] + nrm[2] * d[2]
        n_o = nrm[0] * o[0] + nrm[1] * o[1] + nrm[2] * o[2]
        t = (dd_ - n_o) / cos
        bx = c1 + (g1[0] * o[0] + g1[1] * o[1] + g1[2] * o[2]) \
            + t * (g1[0] * d[0] + g1[1] * d[1] + g1[2] * d[2])
        by = c2 + (g2[0] * o[0] + g2[1] * o[1] + g2[2] * o[2]) \
            + t * (g2[0] * d[0] + g2[1] * d[1] + g2[2] * d[2])
        bz = 1.0 - bx - by

        # Same min-composed mask as _tri_row_test_v2 (identical semantics,
        # fewer VPU ops; XLA min propagates NaN).
        ok = (
            (jnp.minimum(jnp.minimum(t, bx), jnp.minimum(by, bz)) >= 0.0)
            & (t < t_best)
            & (gid != excl_i)
        )
        if excl_ent is not None:
            ok = ok & (ent != excl_ent)
        if any_hit:
            # Collapsed-t only; id/ent selects are waste (see
            # _tri_row_test_v2).
            t_best = jnp.where(ok, 0.0, t_best)
            continue
        t_best = jnp.where(ok, t, t_best)
        i_best = jnp.where(ok, gid, i_best)
        if track_ent:
            e_best = jnp.where(ok, ent, e_best)
    return t_best, i_best, e_best


# Above this chunk count, occlusion waves re-sort by their own key even
# when the bounce wave is presorted (see scene/build._occl_sort_default and
# SceneStatic.occl_sort).  MEASURED (round-5 sweep, exp_dragon_sweep.py):
# NEUTRAL at both dragon (225k rays/s either way under forced wave-sort)
# and doom (666k) scale -- the r4 "occlusion rays riding the bounce sort"
# hypothesis did not survive measurement; the real big-mesh wave-sort loss
# was the root-cull packing (render.py root-miss keys).  The knob stays
# because it is free where it matters (production wave-sort is gated off
# above this same chunk count, so occl_sort only engages when a user
# forces PATHS_TPU_WAVE_SORT=1 on a big mesh -- where its per-call sort
# also restores the occlusion root-cull packing the wave key can't give
# shadow rays).
OCCL_SORT_MIN_CHUNKS = 512

# Keys >= this are "miss" sentinels (chunk can't be hit by this block).
_MISS = np.float32(1e38)
# Integrator's dead-lane origin push is 1e30; anything past this is dead.
_DEAD = np.float32(1e29)


def _block_cull_keys(o, d, t_ub_lane, meta, n_chunks, block_n=BLOCK_N):
    """Conservative per-(block, chunk) cull: raw entry-distance keys.

    o, d: (grid*rows, 128, 3)-reshapable (N, 3) lane arrays AFTER padding (N
    a multiple of block_n).  t_ub_lane: (N,) per-lane upper bound on a
    useful hit (t_init for closest-hit, t_max for occlusion).  meta:
    (Cpad, 128) chunk rows.  Returns keys: (grid, n_chunks) f32 lower-bound
    entry distances, _MISS where the block cannot usefully hit the chunk.

    The slab test is evaluated in interval arithmetic over each 128-lane
    SUB-ROW of the block (origins bound by a box, directions by a per-axis
    interval; an axis whose direction interval spans zero contributes
    (-inf, inf) -- conservative, never wrong), then OR-reduced to block
    level: a chunk is a candidate if ANY sub-row's interval crosses it, and
    the block's sort key is the min over sub-row lower bounds.  The union
    of 8-16 tight per-row intervals is strictly tighter than one interval
    over the whole block (the measured block-level interval union admits
    47% of chunks where the true per-lane OR is 29%; sub-rows recover part
    of that 1.6x because the coherence sort makes consecutive 128-lane rows
    spatially compact).  Cost: the interval math runs on a (G*S, C) grid
    instead of (G, C) -- pure fused VPU elementwise, sub-ms at dragon scale
    and paid once per launch -- while the (G, C) argsort is unchanged.
    Dead lanes (origin pushed past _DEAD by the integrator) are excluded
    from the bounds; an all-dead sub-row culls every chunk."""
    G = o.shape[0] // block_n
    S = block_n // BLOCK[1]  # 128-lane sub-rows per block
    GS = G * S
    ob = o.reshape(GS, BLOCK[1], 3)
    db = d.reshape(GS, BLOCK[1], 3)
    tb = t_ub_lane.reshape(GS, BLOCK[1])
    alive = ob[..., 0] < _DEAD  # (GS, 128)

    am = alive[..., None]
    olo = jnp.min(jnp.where(am, ob, BIG), axis=1)  # (GS, 3)
    ohi = jnp.max(jnp.where(am, ob, -BIG), axis=1)
    dlo = jnp.min(jnp.where(am, db, BIG), axis=1)
    dhi = jnp.max(jnp.where(am, db, -BIG), axis=1)
    t_ub = jnp.max(jnp.where(alive, tb, -BIG), axis=1)  # (GS,)
    row_alive = jnp.any(alive, axis=1)

    clo = meta[:n_chunks, 0:3]  # (C, 3)
    chi = meta[:n_chunks, 3:6]

    tmin = jnp.full((GS, n_chunks), -BIG)
    tmax = jnp.full((GS, n_chunks), BIG)
    for ax in range(3):
        dl = dlo[:, ax:ax + 1]  # (GS, 1)
        dh = dhi[:, ax:ax + 1]
        same_sign = (dl > 0.0) | (dh < 0.0)
        # inv(1/[dl,dh]) = [1/dh, 1/dl] for any same-sign interval.
        safe_dl = jnp.where(same_sign, dl, 1.0)
        safe_dh = jnp.where(same_sign, dh, 1.0)
        il = 1.0 / safe_dh
        ih = 1.0 / safe_dl
        # Numerator intervals for the two slab planes.
        nlo_lo = clo[None, :, ax] - ohi[:, ax:ax + 1]  # (GS, C)
        nlo_hi = clo[None, :, ax] - olo[:, ax:ax + 1]
        nhi_lo = chi[None, :, ax] - ohi[:, ax:ax + 1]
        nhi_hi = chi[None, :, ax] - olo[:, ax:ax + 1]

        def prod_bounds(nl, nh):
            p1 = nl * il
            p2 = nl * ih
            p3 = nh * il
            p4 = nh * ih
            return (
                jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
            )

        lo1, hi1 = prod_bounds(nlo_lo, nlo_hi)
        lo2, hi2 = prod_bounds(nhi_lo, nhi_hi)
        # Per-lane t_near = min(plane1, plane2): lower bound is the min of
        # both plane lower bounds; t_far symmetric.
        near_lb = jnp.minimum(lo1, lo2)
        far_ub = jnp.maximum(hi1, hi2)
        near_lb = jnp.where(same_sign, near_lb, -BIG)
        far_ub = jnp.where(same_sign, far_ub, BIG)
        tmin = jnp.maximum(tmin, near_lb)
        tmax = jnp.minimum(tmax, far_ub)

    hit = (
        (tmin <= tmax)
        & (tmax > 0.0)
        & (tmin < t_ub[:, None])
        & row_alive[:, None]
    )
    keys_rows = jnp.where(hit, tmin, _MISS)  # (GS, C)
    return jnp.min(keys_rows.reshape(G, S, n_chunks), axis=1)


def _block_cull_sort(o, d, t_ub_lane, meta, n_chunks, block_n=BLOCK_N):
    """Cull + full front-to-back order: (ids, keys) with keys ascending
    (_MISS sentinels sort last, terminating the walk)."""
    keys = _block_cull_keys(o, d, t_ub_lane, meta, n_chunks, block_n)
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    skeys = jnp.take_along_axis(keys, order, axis=1)
    return order, skeys


def _block_cull_topk(o, d, t_ub_lane, meta, n_chunks, k, block_n=BLOCK_N):
    """Cull + the k nearest candidate chunks per block (ascending keys).
    top_k instead of a full argsort: phase 1 of the two-phase walk only
    needs the front of the order."""
    keys = _block_cull_keys(o, d, t_ub_lane, meta, n_chunks, block_n)
    neg, idx = lax.top_k(-keys, k)
    return idx.astype(jnp.int32), -neg


def _block_cull_compact(o, d, t_ub_lane, meta, n_chunks, block_n=BLOCK_N):
    """Cull + candidates compacted to the front IN CHUNK-ID ORDER (no
    front-to-back sort).  Keys are 0 for candidates and _MISS past them, so
    the kernel's ordered-walk machinery degenerates to exactly the right
    semantics: walk every candidate (no distance-based early exit -- phase-2
    straggler lanes rarely beat one anyway), stop at the first _MISS, and
    exit immediately when every lane is done (t_cap > 0 fails).  Id order
    keeps the streamed DMA reads near-sequential in HBM."""
    keys = _block_cull_keys(o, d, t_ub_lane, meta, n_chunks, block_n)
    hit = keys < _MISS
    order = jnp.argsort(~hit, axis=1, stable=True).astype(jnp.int32)
    skeys = jnp.where(
        jnp.take_along_axis(hit, order, axis=1), jnp.float32(0.0), _MISS
    )
    return order, skeys


def _make_sorted_kernel(n_chunks: int, rows_per_chunk: int, row_test,
                        anyhit: bool, stream: bool, emit_bound: bool = False,
                        has_row_meta: bool = True, block_rows: int = BLOCK[0],
                        plane_rows: bool = False, rep: bool = False):
    """Kernel factory.  Refs:
      ids (SMEM (1, Cpad)), keys (SMEM (1, Cpad)), meta (VMEM), table
      (ANY=HBM when stream else VMEM), ray blocks... [+ excl_ent, t seeds],
      outputs, then scratch (VMEM ring) + DMA sems when streaming.

    emit_bound (closest-hit only): adds a 4th output -- the key at the walk's
    stopping position, a LOWER bound on every unvisited chunk's per-lane
    entry distance.  A lane with t_best <= bound provably cannot be improved
    by the unvisited tail: the two-phase walk uses this as its per-lane
    done test."""
    R = rows_per_chunk
    C = n_chunks
    # Table rows per 8-triangle row group: 1 compact row, or REP_FIELDS
    # rows per slot in the replicated layout (read as one vector block).
    span = PACK_LEAF * REP_FIELDS if rep else 1
    RT = R * span  # table rows per chunk
    blk = (block_rows, BLOCK[1])
    # per-row AABBs present in meta (and gating enabled); sphere tables
    # don't carry them (has_row_meta=False)
    row_cull = rows_per_chunk <= 15 and _ROW_GATES and has_row_meta
    chunk_cond = _chunk_cond_enabled()
    half_cond = (
        chunk_cond and _half_cond_enabled()
        and block_rows >= 16 and block_rows % 8 == 0
    )

    def kernel(ids_ref, keys_ref, meta_ref, tab_ref, ox, oy, oz, dx, dy, dz,
               excl, *rest):
        if anyhit:
            eent, tinit, texit = rest[0], rest[1], rest[2]
            outs = rest[3:4]
            extra = rest[4:]
        else:
            n_out = 4 if emit_bound else 3
            tinit, texit = rest[0], rest[1]
            outs = rest[2:2 + n_out]
            extra = rest[2 + n_out:]
        if stream:
            scratch, sems = extra
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        excl_i = excl[:]
        excl_e = eent[:] if anyhit else None
        t0 = tinit[:]
        t_x = texit[:]
        dead = o[0] > _DEAD

        def t_cap(tb):
            # Lanes that can no longer improve: dead, or (anyhit) already
            # occluded (t collapsed to 0).  They compare as -BIG so the
            # all-done early exit ignores them.  Live lanes compare as
            # min(t_best, root-AABB EXIT distance): every real hit lies
            # inside the root box, so once the walk's ascending keys pass a
            # lane's exit distance no remaining chunk can produce a hit for
            # it -- without this, one through-miss lane (t_best stuck at
            # BIG) drags its whole block through the entire candidate list.
            done = dead
            if anyhit:
                done = done | (tb <= 0.0)
            return jnp.where(done, -BIG, jnp.minimum(tb, t_x))

        def chunk_id(k):
            return ids_ref[0, 0, k]

        def chunk_key(k):
            return keys_ref[0, 0, k]

        if stream:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    tab_ref.at[pl.ds(c * RT, RT), :],
                    scratch.at[pl.ds(slot * RT, RT), :],
                    sems.at[slot],
                )

            def issue(j):
                """Start chunk j's copy into ring slot j % NBUF (if j is a
                live candidate)."""
                key_j = chunk_key(jnp.minimum(j, C - 1))

                @pl.when((j < C) & (key_j < _MISS))
                def _():
                    dma(j % STREAM_NBUF, chunk_id(j)).start()

        def read_row(slot, c, r):
            if stream:
                return scratch[pl.ds(slot * RT + r * span, span), :]
            return tab_ref[pl.ds(c * RT + r * span, span), :]

        key0 = chunk_key(0)
        if stream:
            # Fill the prefetch ring: chunks 0..NBUF-2 (the body issues
            # k+NBUF-1 before waiting on k, keeping NBUF-1 copies in
            # flight).
            for j in range(STREAM_NBUF - 1):
                issue(jnp.int32(j))

        zero_i = jnp.zeros(blk, jnp.int32)
        if anyhit:
            carry0 = (jnp.int32(0), key0, t0)
        else:
            carry0 = (jnp.int32(0), key0, t0, zero_i, zero_i)

        def cond(carry):
            k, key_k, tb = carry[0], carry[1], carry[2]
            return (k < C) & (key_k < _MISS) & jnp.any(t_cap(tb) > key_k)

        def body(carry):
            k, key_k, tb = carry[0], carry[1], carry[2]
            slot = k % STREAM_NBUF if stream else k & 1
            c = chunk_id(k)
            k1 = jnp.minimum(k + 1, C - 1)
            key1 = chunk_key(k1)
            if stream:
                # Top up the ring (chunk k+NBUF-1) before waiting on chunk
                # k; the early-exit check can't run yet (tb not final), so
                # up to NBUF-1 prefetches may be wasted on exit -- the drain
                # after the loop waits for them.
                issue(k + STREAM_NBUF - 1)
                dma(slot, c).wait()

            # Precise per-lane slab test on the chunk AABB (conservative
            # block cull lets through chunks no lane actually crosses).
            row = meta_ref[pl.ds(c, 1), :]

            def bc(j):
                return jnp.broadcast_to(row[0, j], blk)

            tmin = jnp.full(blk, -BIG)
            tmax = jnp.full(blk, BIG)
            for ax in range(3):
                t0_ = (bc(ax) - o[ax]) * inv[ax]
                t1_ = (bc(3 + ax) - o[ax]) * inv[ax]
                tmin = jnp.maximum(tmin, jnp.minimum(t0_, t1_))
                tmax = jnp.minimum(tmax, jnp.maximum(t0_, t1_))
            lane_hit = (tmin < tmax) & (tmin < tb) & (tmax > 0.0)
            any_hit = jnp.any(lane_hit) if chunk_cond else None
            o_r = _chunk_shift(bc, o) if plane_rows else o

            def row_gate(r, tb):
                """Per-ROW AABB gate (meta cols 8+8r..): the sub-hierarchy
                level below chunks -- one 30-op vector slab test guards a
                ~560-op 8-triangle row test."""
                if not row_cull:
                    return None  # caller tests unconditionally
                rtmin = jnp.full(blk, -BIG)
                rtmax = jnp.full(blk, BIG)
                b0 = 8 + 8 * r
                for ax in range(3):
                    t0_ = (bc(b0 + ax) - o[ax]) * inv[ax]
                    t1_ = (bc(b0 + 3 + ax) - o[ax]) * inv[ax]
                    rtmin = jnp.maximum(rtmin, jnp.minimum(t0_, t1_))
                    rtmax = jnp.minimum(rtmax, jnp.maximum(t0_, t1_))
                return jnp.any((rtmin < rtmax) & (rtmin < tb) & (rtmax > 0.0))

            if anyhit:
                def proc(tb):
                    if half_cond:
                        outs_h = []
                        for h in range(block_rows // 8):
                            s = slice(8 * h, 8 * h + 8)
                            o_h = tuple(x[s] for x in o_r)
                            d_h = tuple(x[s] for x in d)

                            def go(t, s=s, o_h=o_h, d_h=d_h):
                                for r in range(R):
                                    tr = read_row(slot, c, r)
                                    t, _, _ = row_test(
                                        tr, o_h, d_h, excl_i[s], t,
                                        zero_i[s], zero_i[s],
                                        excl_ent=(None if excl_e is None
                                                  else excl_e[s]),
                                        any_hit=True,
                                    )
                                return t

                            outs_h.append(lax.cond(
                                jnp.any(lane_hit[s]), go,
                                lambda t: t, tb[s]))
                        return jnp.concatenate(outs_h, axis=0)
                    for r in range(R):
                        def test(tb, r=r):
                            tr = read_row(slot, c, r)
                            tb, _, _ = row_test(
                                tr, o_r, d, excl_i, tb, zero_i, zero_i,
                                excl_ent=excl_e, any_hit=True,
                            )
                            return tb

                        g = row_gate(r, tb)
                        tb = test(tb) if g is None else lax.cond(
                            g, test, lambda tb: tb, tb)
                    return tb

                tb = (lax.cond(any_hit, proc, lambda tb: tb, tb)
                      if chunk_cond else proc(tb))
                return (k + 1, key1, tb)
            else:
                ib, eb = carry[3], carry[4]

                def proc(tb, ib, eb):
                    if half_cond:
                        outs_h = []
                        for h in range(block_rows // 8):
                            s = slice(8 * h, 8 * h + 8)
                            o_h = tuple(x[s] for x in o_r)
                            d_h = tuple(x[s] for x in d)

                            def go(t3, s=s, o_h=o_h, d_h=d_h):
                                t, i, e = t3
                                for r in range(R):
                                    tr = read_row(slot, c, r)
                                    t, i, e = row_test(
                                        tr, o_h, d_h, excl_i[s], t, i, e)
                                return (t, i, e)

                            outs_h.append(lax.cond(
                                jnp.any(lane_hit[s]), go,
                                lambda t3: t3, (tb[s], ib[s], eb[s])))
                        return (
                            jnp.concatenate([x[0] for x in outs_h], axis=0),
                            jnp.concatenate([x[1] for x in outs_h], axis=0),
                            jnp.concatenate([x[2] for x in outs_h], axis=0),
                        )
                    for r in range(R):
                        def test(tb, ib, eb, r=r):
                            tr = read_row(slot, c, r)
                            return row_test(tr, o_r, d, excl_i, tb, ib, eb)

                        g = row_gate(r, tb)
                        tb, ib, eb = test(tb, ib, eb) if g is None else lax.cond(
                            g, test, lambda tb, ib, eb: (tb, ib, eb), tb, ib, eb)
                    return tb, ib, eb

                tb, ib, eb = (
                    lax.cond(any_hit, proc,
                             lambda tb, ib, eb: (tb, ib, eb), tb, ib, eb)
                    if chunk_cond else proc(tb, ib, eb)
                )
                return (k + 1, key1, tb, ib, eb)

        carry = lax.while_loop(cond, body, carry0)
        k_end, key_end, tb = carry[0], carry[1], carry[2]

        if stream:
            # Drain: chunks k_end..k_end+NBUF-2 may have copies in flight
            # (pre-loop fill when the loop never ran, ring top-ups when it
            # exited early).  Wait for each live one.
            for i in range(STREAM_NBUF - 1):
                j = k_end + i
                key_j = chunk_key(jnp.minimum(j, C - 1))

                @pl.when((j < C) & (key_j < _MISS))
                def _(j=j):
                    dma(j % STREAM_NBUF, chunk_id(j)).wait()

        if anyhit:
            outs[0][:] = tb
        else:
            outs[0][:] = jnp.where(tb < t0, tb, BIG)
            outs[1][:] = carry[3]
            outs[2][:] = carry[4]
            if emit_bound:
                outs[3][:] = jnp.broadcast_to(key_end, blk)

    return kernel


# Phase-1 walk length of the opt-in two-phase walk: candidate chunks
# visited before stragglers are re-blocked.  Front-to-back, ~all hitting
# lanes finish within this many.
PHASE1_K = 64


def _launch_sorted(meta, table, o, d, excl_idx, t_seed, n_chunks,
                   rows_per_chunk, row_test, anyhit, stream, excl_ent=None,
                   interpret=False, two_phase=None, has_row_meta=True,
                   block_rows=BLOCK[0], plane_rows=False, lane_sort=True,
                   rep=False, ent_map=None):
    """Shared launch: coherence sort, pad, block cull + order, pallas_call,
    unsort.  t_seed is t_init (closest) or t_max (anyhit).

    Closest-hit on large meshes runs TWO PHASES (the packet-traversal fix
    for divergence): a block visits the union of its lanes' candidate
    chunks, so one straggler lane -- typically a miss ray -- drags all 1024
    lanes through the whole candidate list at full per-chunk cost.  Phase 1
    walks only the PHASE1_K nearest candidates per block and proves most
    lanes done (t_best <= lower bound of everything unvisited); phase 2
    compacts the stragglers into their own (mostly-dead-free) blocks and
    finishes them.  Finished lanes pack into all-done blocks whose walk
    exits immediately, so phase 2's cost scales with the straggler count,
    not the wave size."""
    N = o.shape[0]
    block_n = block_rows * BLOCK[1]
    npad = -(-N // block_n) * block_n
    grid = npad // block_n

    o = lax.stop_gradient(o)
    d = lax.stop_gradient(d)
    t_seed = lax.stop_gradient(t_seed.astype(jnp.float32))
    excl_idx = excl_idx.astype(jnp.int32)
    meta = lax.stop_gradient(meta)
    table = lax.stop_gradient(table)

    # Root cull: a lane whose ray provably misses the mesh's root AABB
    # (slightly enlarged so f32 rounding stays conservative) cannot hit any
    # chunk with t < its seed -- mark it dead (origin -> 1e30).  The
    # coherence sort then packs such lanes into all-dead tail blocks whose
    # walk culls every chunk and exits immediately, so sky rays and
    # off-mesh shadow rays (usually most of a wave) stop dragging their
    # blocks through the full candidate walk.  Results are unchanged: dead
    # lanes come back as misses, which is what they are.
    lo, hi = _meta_bounds(meta)
    ext = jnp.maximum(hi - lo, 1e-6)
    lo_e = lo - 1e-3 * ext
    hi_e = hi + 1e-3 * ext
    inv_d = 1.0 / d
    rt0 = (lo_e[None, :] - o) * inv_d
    rt1 = (hi_e[None, :] - o) * inv_d
    rtn = jnp.minimum(rt0, rt1)
    rtx = jnp.maximum(rt0, rt1)
    # 0 * inf = NaN when an origin component sits exactly on an enlarged
    # slab plane with d == 0 on that axis; a NaN here would mark a LIVE
    # lane dead (whole-mesh miss).  Treat such axes as unbounded --
    # conservative, matching the cull's intent.
    rtn = jnp.where(jnp.isnan(rtn), -BIG, rtn)
    rtx = jnp.where(jnp.isnan(rtx), BIG, rtx)
    rtmin = jnp.max(rtn, axis=1)
    rtmax = jnp.min(rtx, axis=1)
    root_hit = (rtmin < rtmax) & (rtmax > 0.0) & (rtmin < t_seed)
    o = jnp.where(root_hit[:, None], o, 1e30)
    # Per-lane hit upper bound for the kernel's early-exit test: every real
    # hit lies inside the (enlarged) root box, so no hit can have t past
    # the lane's exit distance.  The 1e-3 box enlargement above dwarfs f32
    # rounding in rtmax; the extra 1.0001 keeps the bound conservative.
    t_exit = jnp.where(root_hit, rtmax * 1.0001, 0.0)

    perm = None
    if lane_sort and N >= _SORT_MIN_N:
        perm = _coherence_perm(o, d, lo, hi, octant_major=True)
        cols = [o, d, excl_idx.astype(jnp.float32)[:, None], t_seed[:, None],
                t_exit[:, None]]
        if anyhit:
            cols.append(excl_ent.astype(jnp.float32)[:, None])
        packed = jnp.take(jnp.concatenate(cols, axis=1), perm, axis=0)
        o, d = packed[:, 0:3], packed[:, 3:6]
        excl_idx = packed[:, 6].astype(jnp.int32)
        t_seed = packed[:, 7]
        t_exit = packed[:, 8]
        if anyhit:
            excl_ent = packed[:, 9].astype(jnp.int32)

    # Pad (dead fill: origin past _DEAD so the cull ignores the lane).
    def cat(x, fill):
        return jnp.concatenate([x, jnp.full((npad - N,) + x.shape[1:], fill, x.dtype)]) if npad != N else x

    o_p = cat(o, 1e30)
    d_p = cat(d, 1.0)
    t_p = cat(t_seed, 0.0)
    tx_p = cat(t_exit, 0.0)
    excl_p = cat(excl_idx, jnp.int32(-1))
    eent_p = cat(excl_ent.astype(jnp.int32), jnp.int32(-1)) if anyhit else None

    def run(ids, keys, n_c, o_, d_, excl_, t_, tx_, eent_=None,
            emit_bound=False):
        """One pallas_call over padded lane arrays with a given chunk
        order."""
        cpad = -(-n_c // 8) * 8
        if cpad != n_c:
            ids = jnp.pad(ids, ((0, 0), (0, cpad - n_c)))
            keys = jnp.pad(keys, ((0, 0), (0, cpad - n_c)),
                           constant_values=_MISS)
        args = [
            o_[:, 0].reshape(grid * block_rows, BLOCK[1]),
            o_[:, 1].reshape(grid * block_rows, BLOCK[1]),
            o_[:, 2].reshape(grid * block_rows, BLOCK[1]),
            d_[:, 0].reshape(grid * block_rows, BLOCK[1]),
            d_[:, 1].reshape(grid * block_rows, BLOCK[1]),
            d_[:, 2].reshape(grid * block_rows, BLOCK[1]),
            excl_.reshape(grid * block_rows, BLOCK[1]),
        ]
        if anyhit:
            args.append(eent_.reshape(grid * block_rows, BLOCK[1]))
        args.append(t_.reshape(grid * block_rows, BLOCK[1]))
        args.append(tx_.reshape(grid * block_rows, BLOCK[1]))

        # SMEM rows ride as (grid, 1, cpad) so the block's trailing two dims
        # equal the array's (a Mosaic block-shape requirement); each program
        # sees its (1, 1, cpad) row.
        ids = ids.reshape(grid, 1, cpad)
        keys = keys.reshape(grid, 1, cpad)
        ray_spec = pl.BlockSpec((block_rows, BLOCK[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        smem_row = pl.BlockSpec((1, 1, cpad), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec(memory_space=pl.ANY if stream else pltpu.VMEM)
        span = PACK_LEAF * REP_FIELDS if rep else 1
        scratch_shapes = []
        if stream:
            scratch_shapes = [
                pltpu.VMEM(
                    (STREAM_NBUF * rows_per_chunk * span, 128), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((STREAM_NBUF,)),
            ]

        kernel = _make_sorted_kernel(n_c, rows_per_chunk, row_test, anyhit,
                                     stream, emit_bound, has_row_meta,
                                     block_rows, plane_rows, rep)
        fshape = jax.ShapeDtypeStruct((grid * block_rows, BLOCK[1]), jnp.float32)
        ishape = jax.ShapeDtypeStruct((grid * block_rows, BLOCK[1]), jnp.int32)
        if anyhit:
            out_shape = fshape
            out_specs = ray_spec
        else:
            n_out = 4 if emit_bound else 3
            out_shape = tuple([fshape, ishape, ishape, fshape][:n_out])
            out_specs = tuple([ray_spec] * n_out)

        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[smem_row, smem_row, meta_spec, tab_spec]
            + [ray_spec] * len(args),
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(ids, keys, meta, table, *args)

    if two_phase is None:
        # Measured on TPU v5e (398k-tri mesh, 345k-ray wave): two-phase is
        # SLOWER than the single front-to-back walk on both coherent
        # (133 -> 163 ms) and incoherent (908 -> 1112 ms) waves -- miss
        # lanes can never be proven done by phase 1 (their bound only
        # collapses when every candidate is exhausted), so phase 2 repeats
        # most of the walk and the extra launches/sorts are pure overhead.
        # Kept as an opt-in for hit-dominated workloads; off by default.
        two_phase = False

    if anyhit:
        ids, keys = _block_cull_sort(o_p, d_p, t_p, meta, n_chunks, block_n)
        res = run(ids, keys, n_chunks, o_p, d_p, excl_p, t_p, tx_p, eent_p)
        t_out = res.reshape(npad)[:N]
        if perm is not None:
            t_out = jnp.zeros_like(t_out).at[perm].set(t_out)
        return t_out == 0.0

    if not two_phase:
        ids, keys = _block_cull_sort(o_p, d_p, t_p, meta, n_chunks, block_n)
        res = run(ids, keys, n_chunks, o_p, d_p, excl_p, t_p, tx_p)
        t_out, i_out, e_out = res
        t_out = t_out.reshape(npad)[:N]
        i_out = i_out.reshape(npad)[:N]
        e_out = e_out.reshape(npad)[:N]
    else:
        K = min(PHASE1_K, n_chunks)
        ids1, keys1 = _block_cull_topk(o_p, d_p, t_p, meta, n_chunks, K,
                                       block_n)
        t1, i1, e1, bound = run(ids1, keys1, K, o_p, d_p, excl_p, t_p, tx_p,
                                emit_bound=True)
        t1 = t1.reshape(npad)
        i1 = i1.reshape(npad)
        e1 = e1.reshape(npad)
        bound = bound.reshape(npad)
        # t1 == BIG means "nothing beat the seed"; the lane's current best
        # is then the seed itself (e.g. a closer sphere hit).
        t_eff = jnp.minimum(t1, t_p)
        dead = o_p[:, 0] > _DEAD
        # bound >= _MISS: the walk exhausted every candidate -- anything
        # unvisited was culled as unhittable, so the lane is done even at
        # t_eff == BIG (a miss lane with no candidates left).  bound >=
        # t_exit: every unvisited chunk starts past the lane's root-box
        # exit, so a through-miss lane is provably done without exhausting
        # the candidates (the failure mode that made two-phase lose).
        done = dead | (t_eff <= bound) | (bound >= _MISS) | (bound >= tx_p)

        # Compact stragglers to the front; done lanes pack into all-done
        # blocks that cull every chunk and exit the walk instantly.
        perm2 = jnp.argsort(done, stable=True).astype(jnp.int32)
        packed2 = jnp.take(
            jnp.concatenate(
                [
                    o_p, d_p,
                    excl_p.astype(jnp.float32)[:, None],
                    t_eff[:, None],
                    tx_p[:, None],
                    t1[:, None],
                    i1.astype(jnp.float32)[:, None],
                    e1.astype(jnp.float32)[:, None],
                    done.astype(jnp.float32)[:, None],
                ],
                axis=1,
            ),
            perm2, axis=0,
        )
        done2 = packed2[:, 12] > 0.5
        o2 = jnp.where(done2[:, None], 1e30, packed2[:, 0:3])
        d2 = packed2[:, 3:6]
        excl2 = packed2[:, 6].astype(jnp.int32)
        t_eff2 = packed2[:, 7]
        tx2 = packed2[:, 8]

        ids2, keys2 = _block_cull_compact(o2, d2, t_eff2, meta, n_chunks,
                                          block_n)
        t2, i2, e2 = run(ids2, keys2, n_chunks, o2, d2, excl2, t_eff2, tx2)
        t2 = t2.reshape(npad)
        i2 = i2.reshape(npad)
        e2 = e2.reshape(npad)

        # Merge: phase 2 beat the phase-1 best, else phase 1 beat the
        # original seed, else BIG (the caller's "no triangle hit" contract).
        hit2 = t2 < BIG
        hit1 = packed2[:, 9] < BIG
        t_m = jnp.where(hit2, t2, jnp.where(hit1, packed2[:, 9], BIG))
        i_m = jnp.where(hit2, i2, packed2[:, 10].astype(jnp.int32))
        e_m = jnp.where(hit2, e2, packed2[:, 11].astype(jnp.int32))

        # Undo the straggler compaction.
        packed_u = jnp.stack(
            [t_m, i_m.astype(jnp.float32), e_m.astype(jnp.float32)], 1
        )
        restored2 = jnp.zeros_like(packed_u).at[perm2].set(packed_u)
        t_out = restored2[:N, 0]
        i_out = restored2[:N, 1].astype(jnp.int32)
        e_out = restored2[:N, 2].astype(jnp.int32)

    if ent_map is not None:
        # The kernel ran with track_ent=False (two fewer ops per slot in
        # the flop-bound walk); resolve ent = map[gid] with one gather --
        # exact: the packed slot ent IS this map's value, and misses keep
        # the kernel contract's e == 0.
        e_out = jnp.where(
            t_out < BIG, jnp.take(ent_map, i_out), jnp.int32(0)
        )
    if perm is not None:
        packed_out = jnp.stack(
            [t_out, i_out.astype(jnp.float32), e_out.astype(jnp.float32)], 1
        )
        restored = jnp.zeros_like(packed_out).at[perm].set(packed_out)
        t_out = restored[:, 0]
        i_out = restored[:, 1].astype(jnp.int32)
        e_out = restored[:, 2].astype(jnp.int32)
    return t_out, i_out, e_out


def closest_hit_sorted(ct, n_chunks, o, d, excl_idx, t_init,
                       rows_per_chunk=ROWS_PER_CHUNK_SORTED, stream=True,
                       interpret=False, two_phase=None,
                       block_rows=None, lane_sort=True, rep=False):
    """Closest triangle hit via sorted (front-to-back) chunk traversal.
    Same contract as pallas_traverse.closest_hit_chunked: (t, idx, ent),
    t == BIG where nothing beat t_init.  stream=True keeps the triangle
    table in HBM (DMA'd per chunk); stream=False requires it VMEM-resident.
    two_phase: opt IN to the straggler-compacted two-phase walk (measured
    slower than the single walk on this chip; off by default).
    rep=True streams the field-replicated table (ct.tris_rep) so the row
    test runs scalar-free -- requires stream=True and a packed tris_rep.

    Deferred ent resolution (track_ent=False on the row test + _launch_sorted's
    ent_map gather after the walk) measured SLOWER at every tier on TPU v5e
    (teapot 2.89 -> 2.67, bunny 2.34 -> 2.02, dragon 0.280 -> 0.275 Mray/s):
    the per-launch gather outweighs the 2-ops/slot in-kernel saving on short
    walks.  The machinery stays in _launch_sorted (exact, parity-tested via
    the row tests' track_ent flag) but production keeps in-kernel ent."""
    rep = rep and stream and ct.tris_rep is not None
    rt = _tri_row_test_rep if rep else _tri_row_test_v2
    return _launch_sorted(
        ct.chunk_meta, ct.tris_rep if rep else ct.tris, o, d, excl_idx,
        t_init, n_chunks, rows_per_chunk, rt,
        anyhit=False, stream=stream,
        interpret=interpret, two_phase=two_phase,
        block_rows=block_rows or BLOCK[0], plane_rows=True,
        lane_sort=lane_sort, rep=rep,
    )


def occludes_sorted(ct, n_chunks, o, d, excl_idx, excl_ent, t_max,
                    rows_per_chunk=ROWS_PER_CHUNK_SORTED, stream=True,
                    interpret=False, block_rows=None, lane_sort=True,
                    rep=False):
    """Any-hit occlusion via sorted chunk traversal (early exit as soon as
    every live lane is occluded or out of candidate chunks)."""
    rep = rep and stream and ct.tris_rep is not None
    return _launch_sorted(
        ct.chunk_meta, ct.tris_rep if rep else ct.tris, o, d, excl_idx,
        t_max, n_chunks, rows_per_chunk,
        _tri_row_test_rep if rep else _tri_row_test_v2,
        anyhit=True, stream=stream,
        excl_ent=excl_ent, interpret=interpret,
        block_rows=block_rows or BLOCK[0], plane_rows=True,
        lane_sort=lane_sort, rep=rep,
    )


# Rows per chunk for the sorted SPHERE kernels: 2 rows = 32 sphere slots,
# fine enough that the block cull + front-to-back early exit see real
# chunks even on the 500-sphere stress scene (32 rows total).
SPH_ROWS_PER_CHUNK_SORTED = 2


def closest_hit_spheres_sorted(cs, n_chunks, o, d, excl_idx, t_init,
                               rows_per_chunk=SPH_ROWS_PER_CHUNK_SORTED,
                               interpret=False, block_rows=None,
                               lane_sort=True, flat=False):
    """Closest sphere hit over pack_spheres_chunked tables.  Default: the
    sorted chunk walk (conservative block cull, front-to-back order, early
    exit, root-AABB lane cull), same machinery as the triangle kernels.
    Sphere tables are tiny -- always VMEM-resident.

    flat=True dispatches to the FLAT unrolled kernel instead (no cull, no
    sort, no conds).  The flag is a plain argument -- the caller resolves
    PATHS_TPU_SPH_FLAT OUTSIDE jit (scene/build.py threads it through
    SceneStatic.pallas_sph_flat) so flipping the env var between builds
    recompiles rather than reusing the first-traced schedule.  Measured on
    TPU v5e stress-500: flat wins per-launch on a fully incoherent wave
    (26.5 vs 29 ms presorted / 45 ms with lane sort) but LOSES end-to-end
    (4.61e6 vs 5.66e6 rays/s at 8spp) -- real waves are coherent enough
    that the walk's cull + front-to-back early exit saves more than its
    machinery costs.  Kept opt-in as the measured baseline of the walk's
    overhead."""
    from paths_tpu.ops.pallas_traverse import _launch_flat_spheres

    if flat:
        return _launch_flat_spheres(
            cs.tris, o, d, excl_idx, t_init, anyhit=False,
            interpret=interpret,
        )
    return _launch_sorted(
        cs.chunk_meta, cs.tris, o, d, excl_idx, t_init, n_chunks,
        rows_per_chunk, _sphere_row_test, anyhit=False, stream=False,
        interpret=interpret, has_row_meta=False,
        block_rows=block_rows or BLOCK[0], lane_sort=lane_sort,
    )


def occludes_spheres_sorted(cs, n_chunks, o, d, excl_idx, excl_ent, t_max,
                            rows_per_chunk=SPH_ROWS_PER_CHUNK_SORTED,
                            interpret=False, block_rows=None,
                            lane_sort=True, flat=False):
    """Any-hit sphere occlusion; same opt-in flat dispatch as
    closest_hit_spheres_sorted (flat resolved by the caller outside jit)."""
    from paths_tpu.ops.pallas_traverse import _launch_flat_spheres

    if flat:
        return _launch_flat_spheres(
            cs.tris, o, d, excl_idx, t_max, anyhit=True,
            excl_ent=excl_ent, interpret=interpret,
        )
    return _launch_sorted(
        cs.chunk_meta, cs.tris, o, d, excl_idx, t_max, n_chunks,
        rows_per_chunk, _sphere_row_test, anyhit=True, stream=False,
        excl_ent=excl_ent, interpret=interpret, has_row_meta=False,
        block_rows=block_rows or BLOCK[0], lane_sort=lane_sort,
    )
