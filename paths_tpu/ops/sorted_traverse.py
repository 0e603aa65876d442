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
    _SORT_MIN_N,
    _coherence_perm,
    _meta_bounds,
    _sphere_row_test,
    _tri_row_test,
)

# Rows per chunk for the sorted kernels.  8 rows = 64 triangles = one 4 KB
# DMA; matches tris_pad's row padding so chunk row ranges are always full.
ROWS_PER_CHUNK_SORTED = 8

# Keys >= this are "miss" sentinels (chunk can't be hit by this block).
_MISS = np.float32(1e38)
# Integrator's dead-lane origin push is 1e30; anything past this is dead.
_DEAD = np.float32(1e29)


def _block_cull_sort(o, d, t_ub_lane, meta, n_chunks):
    """Conservative per-(block, chunk) cull + front-to-back order.

    o, d: (grid*8, 128, 3)-reshapable (N, 3) lane arrays AFTER padding (N a
    multiple of BLOCK_N).  t_ub_lane: (N,) per-lane upper bound on a useful
    hit (t_init for closest-hit, t_max for occlusion).  meta: (Cpad, 128)
    chunk rows.  Returns (ids, keys): (grid, n_chunks) int32 chunk order and
    f32 ascending lower-bound entry distances (_MISS where the block cannot
    hit the chunk).

    The slab test is evaluated in interval arithmetic over the block's live
    lanes: origins bound by a box, directions by a per-axis interval.  An
    axis whose direction interval spans zero contributes (-inf, inf) --
    conservative, never wrong.  Dead lanes (origin pushed past _DEAD by the
    integrator) are excluded from the bounds; an all-dead block culls every
    chunk."""
    G = o.shape[0] // BLOCK_N
    ob = o.reshape(G, BLOCK_N, 3)
    db = d.reshape(G, BLOCK_N, 3)
    tb = t_ub_lane.reshape(G, BLOCK_N)
    alive = ob[..., 0] < _DEAD  # (G, B)

    am = alive[..., None]
    olo = jnp.min(jnp.where(am, ob, BIG), axis=1)  # (G, 3)
    ohi = jnp.max(jnp.where(am, ob, -BIG), axis=1)
    dlo = jnp.min(jnp.where(am, db, BIG), axis=1)
    dhi = jnp.max(jnp.where(am, db, -BIG), axis=1)
    t_ub = jnp.max(jnp.where(alive, tb, -BIG), axis=1)  # (G,)
    block_alive = jnp.any(alive, axis=1)

    clo = meta[:n_chunks, 0:3]  # (C, 3)
    chi = meta[:n_chunks, 3:6]

    tmin = jnp.full((G, n_chunks), -BIG)
    tmax = jnp.full((G, n_chunks), BIG)
    for ax in range(3):
        dl = dlo[:, ax:ax + 1]  # (G, 1)
        dh = dhi[:, ax:ax + 1]
        same_sign = (dl > 0.0) | (dh < 0.0)
        # inv(1/[dl,dh]) = [1/dh, 1/dl] for any same-sign interval.
        safe_dl = jnp.where(same_sign, dl, 1.0)
        safe_dh = jnp.where(same_sign, dh, 1.0)
        il = 1.0 / safe_dh
        ih = 1.0 / safe_dl
        # Numerator intervals for the two slab planes.
        nlo_lo = clo[None, :, ax] - ohi[:, ax:ax + 1]  # (G, C)
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
        & block_alive[:, None]
    )
    keys = jnp.where(hit, tmin, _MISS)
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    skeys = jnp.take_along_axis(keys, order, axis=1)
    return order, skeys


def _make_sorted_kernel(n_chunks: int, rows_per_chunk: int, row_test,
                        anyhit: bool, stream: bool):
    """Kernel factory.  Refs:
      ids (SMEM (1, Cpad)), keys (SMEM (1, Cpad)), meta (VMEM), table
      (ANY=HBM when stream else VMEM), ray blocks... [+ excl_ent, t seeds],
      outputs, then scratch (VMEM (2*rows, 128)) + DMA sems (2,) when
      streaming."""
    R = rows_per_chunk
    C = n_chunks
    row_cull = rows_per_chunk <= 15  # per-row AABBs present in meta

    def kernel(ids_ref, keys_ref, meta_ref, tab_ref, ox, oy, oz, dx, dy, dz,
               excl, *rest):
        if anyhit:
            eent, tinit = rest[0], rest[1]
            outs = rest[2:3]
            extra = rest[3:]
        else:
            tinit = rest[0]
            outs = rest[1:4]
            extra = rest[4:]
        if stream:
            scratch, sems = extra
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        excl_i = excl[:]
        excl_e = eent[:] if anyhit else None
        t0 = tinit[:]
        dead = o[0] > _DEAD

        def t_cap(tb):
            # Lanes that can no longer improve: dead, or (anyhit) already
            # occluded (t collapsed to 0).  They compare as -BIG so the
            # all-done early exit ignores them.
            done = dead
            if anyhit:
                done = done | (tb <= 0.0)
            return jnp.where(done, -BIG, tb)

        def chunk_id(k):
            return ids_ref[0, 0, k]

        def chunk_key(k):
            return keys_ref[0, 0, k]

        if stream:
            def dma(slot, c):
                return pltpu.make_async_copy(
                    tab_ref.at[pl.ds(c * R, R), :],
                    scratch.at[pl.ds(slot * R, R), :],
                    sems.at[slot],
                )

        def read_row(slot, c, r):
            if stream:
                return scratch[pl.ds(slot * R + r, 1), :]
            return tab_ref[pl.ds(c * R + r, 1), :]

        key0 = chunk_key(0)
        if stream:
            @pl.when(key0 < _MISS)
            def _():
                dma(0, chunk_id(0)).start()

        zero_i = jnp.zeros(BLOCK, jnp.int32)
        if anyhit:
            carry0 = (jnp.int32(0), key0, t0)
        else:
            carry0 = (jnp.int32(0), key0, t0, zero_i, zero_i)

        def cond(carry):
            k, key_k, tb = carry[0], carry[1], carry[2]
            return (k < C) & (key_k < _MISS) & jnp.any(t_cap(tb) > key_k)

        def body(carry):
            k, key_k, tb = carry[0], carry[1], carry[2]
            slot = k & 1
            c = chunk_id(k)
            k1 = jnp.minimum(k + 1, C - 1)
            key1 = chunk_key(k1)
            if stream:
                # Issue chunk k+1's copy before processing chunk k; the
                # early-exit check can't run yet (tb not final), so the
                # prefetch may be wasted on the last iteration -- the drain
                # after the loop waits for it.
                @pl.when((k + 1 < C) & (key1 < _MISS))
                def _():
                    dma(1 - slot, chunk_id(k1)).start()

                dma(slot, c).wait()

            # Precise per-lane slab test on the chunk AABB (conservative
            # block cull lets through chunks no lane actually crosses).
            row = meta_ref[pl.ds(c, 1), :]

            def bc(j):
                return jnp.broadcast_to(row[0, j], BLOCK)

            tmin = jnp.full(BLOCK, -BIG)
            tmax = jnp.full(BLOCK, BIG)
            for ax in range(3):
                t0_ = (bc(ax) - o[ax]) * inv[ax]
                t1_ = (bc(3 + ax) - o[ax]) * inv[ax]
                tmin = jnp.maximum(tmin, jnp.minimum(t0_, t1_))
                tmax = jnp.minimum(tmax, jnp.maximum(t0_, t1_))
            lane_hit = (tmin < tmax) & (tmin < tb) & (tmax > 0.0)
            any_hit = jnp.any(lane_hit)

            def row_gate(r, tb):
                """Per-ROW AABB gate (meta cols 8+8r..): the sub-hierarchy
                level below chunks -- one 30-op vector slab test guards a
                ~560-op 8-triangle row test."""
                if not row_cull:
                    return None  # caller tests unconditionally
                rtmin = jnp.full(BLOCK, -BIG)
                rtmax = jnp.full(BLOCK, BIG)
                b0 = 8 + 8 * r
                for ax in range(3):
                    t0_ = (bc(b0 + ax) - o[ax]) * inv[ax]
                    t1_ = (bc(b0 + 3 + ax) - o[ax]) * inv[ax]
                    rtmin = jnp.maximum(rtmin, jnp.minimum(t0_, t1_))
                    rtmax = jnp.minimum(rtmax, jnp.maximum(t0_, t1_))
                return jnp.any((rtmin < rtmax) & (rtmin < tb) & (rtmax > 0.0))

            if anyhit:
                def proc(tb):
                    for r in range(R):
                        def test(tb, r=r):
                            tr = read_row(slot, c, r)
                            tb, _, _ = row_test(
                                tr, o, d, excl_i, tb, zero_i, zero_i,
                                excl_ent=excl_e, any_hit=True,
                            )
                            return tb

                        g = row_gate(r, tb)
                        tb = test(tb) if g is None else lax.cond(
                            g, test, lambda tb: tb, tb)
                    return tb

                tb = lax.cond(any_hit, proc, lambda tb: tb, tb)
                return (k + 1, key1, tb)
            else:
                ib, eb = carry[3], carry[4]

                def proc(tb, ib, eb):
                    for r in range(R):
                        def test(tb, ib, eb, r=r):
                            tr = read_row(slot, c, r)
                            return row_test(tr, o, d, excl_i, tb, ib, eb)

                        g = row_gate(r, tb)
                        tb, ib, eb = test(tb, ib, eb) if g is None else lax.cond(
                            g, test, lambda tb, ib, eb: (tb, ib, eb), tb, ib, eb)
                    return tb, ib, eb

                tb, ib, eb = lax.cond(
                    any_hit, proc, lambda tb, ib, eb: (tb, ib, eb), tb, ib, eb
                )
                return (k + 1, key1, tb, ib, eb)

        carry = lax.while_loop(cond, body, carry0)
        k_end, key_end, tb = carry[0], carry[1], carry[2]

        if stream:
            # Drain: the loop prefetches chunk k_end before deciding to
            # stop, so a copy may still be in flight.
            @pl.when((k_end > 0) & (k_end < C) & (key_end < _MISS))
            def _():
                dma(k_end & 1, chunk_id(k_end)).wait()

            # k_end == 0: only the pre-loop prefetch may be in flight (the
            # loop never ran -- all lanes were already done).
            @pl.when((k_end == 0) & (key0 < _MISS))
            def _():
                dma(0, chunk_id(0)).wait()

        if anyhit:
            outs[0][:] = tb
        else:
            outs[0][:] = jnp.where(tb < t0, tb, BIG)
            outs[1][:] = carry[3]
            outs[2][:] = carry[4]

    return kernel


def _prep_lanes(x, fill, N, npad, grid):
    x = jnp.concatenate([x, jnp.full(npad - N, fill, x.dtype)]) if npad != N else x
    return x.reshape(grid * BLOCK[0], BLOCK[1])


def _launch_sorted(meta, table, o, d, excl_idx, t_seed, n_chunks,
                   rows_per_chunk, row_test, anyhit, stream, excl_ent=None,
                   interpret=False):
    """Shared launch: coherence sort, pad, block cull + order, pallas_call,
    unsort.  t_seed is t_init (closest) or t_max (anyhit)."""
    N = o.shape[0]
    npad = -(-N // BLOCK_N) * BLOCK_N
    grid = npad // BLOCK_N

    o = lax.stop_gradient(o)
    d = lax.stop_gradient(d)
    t_seed = lax.stop_gradient(t_seed.astype(jnp.float32))
    excl_idx = excl_idx.astype(jnp.int32)
    meta = lax.stop_gradient(meta)
    table = lax.stop_gradient(table)

    perm = None
    if N >= _SORT_MIN_N:
        lo, hi = _meta_bounds(meta)
        perm = _coherence_perm(o, d, lo, hi)
        cols = [o, d, excl_idx.astype(jnp.float32)[:, None], t_seed[:, None]]
        if anyhit:
            cols.append(excl_ent.astype(jnp.float32)[:, None])
        packed = jnp.take(jnp.concatenate(cols, axis=1), perm, axis=0)
        o, d = packed[:, 0:3], packed[:, 3:6]
        excl_idx = packed[:, 6].astype(jnp.int32)
        t_seed = packed[:, 7]
        if anyhit:
            excl_ent = packed[:, 8].astype(jnp.int32)

    # Pad (dead fill: origin past _DEAD so the cull ignores the lane).
    def cat(x, fill):
        return jnp.concatenate([x, jnp.full((npad - N,) + x.shape[1:], fill, x.dtype)]) if npad != N else x

    o_p = cat(o, 1e30)
    d_p = cat(d, 1.0)
    t_p = cat(t_seed, 0.0)

    ids, keys = _block_cull_sort(o_p, d_p, t_p, meta, n_chunks)
    cpad = -(-n_chunks // 8) * 8
    if cpad != n_chunks:
        ids = jnp.pad(ids, ((0, 0), (0, cpad - n_chunks)))
        keys = jnp.pad(keys, ((0, 0), (0, cpad - n_chunks)),
                       constant_values=_MISS)

    args = [
        _prep_lanes(o_p[:, 0], 1e30, npad, npad, grid),
        _prep_lanes(o_p[:, 1], 1e30, npad, npad, grid),
        _prep_lanes(o_p[:, 2], 1e30, npad, npad, grid),
        _prep_lanes(d_p[:, 0], 1.0, npad, npad, grid),
        _prep_lanes(d_p[:, 1], 1.0, npad, npad, grid),
        _prep_lanes(d_p[:, 2], 1.0, npad, npad, grid),
        _prep_lanes(excl_idx, -1, N, npad, grid),
    ]
    if anyhit:
        args.append(_prep_lanes(excl_ent, -1, N, npad, grid))
    args.append(_prep_lanes(t_seed, 0.0, N, npad, grid))

    # SMEM rows ride as (grid, 1, cpad) so the block's trailing two dims
    # equal the array's (a Mosaic block-shape requirement); each program
    # sees its (1, 1, cpad) row.
    ids = ids.reshape(grid, 1, cpad)
    keys = keys.reshape(grid, 1, cpad)
    ray_spec = pl.BlockSpec(BLOCK, lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem_row = pl.BlockSpec((1, 1, cpad), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    meta_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(
        memory_space=pl.ANY if stream else pltpu.VMEM
    )
    n_ray_args = len(args)
    scratch_shapes = []
    if stream:
        scratch_shapes = [
            pltpu.VMEM((2 * rows_per_chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    kernel = _make_sorted_kernel(n_chunks, rows_per_chunk, row_test, anyhit,
                                 stream)
    if anyhit:
        out_shape = jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.float32)
        out_specs = ray_spec
    else:
        out_shape = (
            jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.float32),
            jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.int32),
            jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.int32),
        )
        out_specs = (ray_spec, ray_spec, ray_spec)

    res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem_row, smem_row, meta_spec, tab_spec] + [ray_spec] * n_ray_args,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(ids, keys, meta, table, *args)

    if anyhit:
        t_out = res.reshape(npad)[:N]
        if perm is not None:
            t_out = jnp.zeros_like(t_out).at[perm].set(t_out)
        return t_out == 0.0

    t_out, i_out, e_out = res
    t_out = t_out.reshape(npad)[:N]
    i_out = i_out.reshape(npad)[:N]
    e_out = e_out.reshape(npad)[:N]
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
                       interpret=False):
    """Closest triangle hit via sorted (front-to-back) chunk traversal.
    Same contract as pallas_traverse.closest_hit_chunked: (t, idx, ent),
    t == BIG where nothing beat t_init.  stream=True keeps the triangle
    table in HBM (DMA'd per chunk); stream=False requires it VMEM-resident."""
    return _launch_sorted(
        ct.chunk_meta, ct.tris, o, d, excl_idx, t_init, n_chunks,
        rows_per_chunk, _tri_row_test, anyhit=False, stream=stream,
        interpret=interpret,
    )


def occludes_sorted(ct, n_chunks, o, d, excl_idx, excl_ent, t_max,
                    rows_per_chunk=ROWS_PER_CHUNK_SORTED, stream=True,
                    interpret=False):
    """Any-hit occlusion via sorted chunk traversal (early exit as soon as
    every live lane is occluded or out of candidate chunks)."""
    return _launch_sorted(
        ct.chunk_meta, ct.tris, o, d, excl_idx, t_max, n_chunks,
        rows_per_chunk, _tri_row_test, anyhit=True, stream=stream,
        excl_ent=excl_ent, interpret=interpret,
    )
