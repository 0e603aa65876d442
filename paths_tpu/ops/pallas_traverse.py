"""Pallas TPU packet BVH traversal with the whole tree resident in VMEM.

Why not the XLA gather loop (bvh/traverse.py)?  Measured on the target chip,
one XLA gather over a 345k-lane wave costs ~1.4ms nearly independent of row
width (latency-bound random HBM access), and the per-lane skip-link loop
needs ~19 gathers per iteration over hundreds of lockstep iterations --
teapot renders at 47k rays/s.  A TPU has no per-lane VMEM gather (Mosaic
supports dynamic gathers only within one (8,128) tile), so the TPU-native
formulation is *packet* traversal: each (8,128) block of rays shares ONE
scalar cursor walking the same skip-link tree (bvh.rs:78-141's stack loop,
re-shaped for SIMD):

    cursor = any-lane-hit(AABB) ? hit_link : miss_link

All node/triangle reads are dynamic *row* reads (one (1,128) vector load)
with static column extracts -- no gathers, no HBM traffic after the one-time
DMA of the tree into VMEM.  Cost model: a block visits the union of its
rays' node sets, so coherent packets (primary, shadow) traverse near
per-ray-optimally while fully incoherent packets degrade toward brute force
-- but brute force over VMEM at VPU speed, about three orders of magnitude
faster than the gather loop.

Memory layout (built by pack_bvh):
  nodes: (M, 128) f32 rows, one node per row:
     [0:3] aabb min, [3:6] aabb max, [6] hit_link, [7] miss_link,
     [8] leaf row index into tris, [9] prim count (0 for inner)
  tris: (R, 128) f32 rows, one LEAF (8 triangle slots of 16 floats) per row:
     per slot [v0.xyz v1.xyz v2.xyz n.xyz gid inv_area ent n.v0]; empty slots
     are degenerate (n = 0 -> cos_theta == 0 -> never hit).
Links/ids are stored as f32 (exact below 2^24 -- far beyond the builder's
node-count panic threshold, bvh.rs:170-171).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK_LEAF = 8          # triangle slots per leaf row
TRI_STRIDE = 16        # floats per triangle slot
BLOCK = (8, 128)       # rays per program
BLOCK_N = BLOCK[0] * BLOCK[1]
BIG = np.float32(3.4e38)
# VMEM budget for nodes+tris (leave headroom for ray blocks / double
# buffering out of ~16MB).
VMEM_LIMIT_BYTES = 10 * 1024 * 1024


class PackedBvh(NamedTuple):
    nodes: jnp.ndarray  # (M, 128) f32
    tris: jnp.ndarray   # (R, 128) f32


def vmem_bytes(n_tris: int, n_nodes: int) -> int:
    rows = -(-n_tris // PACK_LEAF)
    return (n_nodes + rows) * 128 * 4


def pack_bvh(flat, v0, v1, v2, n, ent=None) -> PackedBvh:
    """Pack a FlatBvh (built with leaf_size == PACK_LEAF) + reordered
    triangle arrays into the kernel layout.  v0/v1/v2/n are (T, 3) in
    flat.order layout (the same layout SceneArrays uses), so the gid written
    into each slot indexes those arrays directly.  ent (T,) entity ids ride
    in slot col 14 so hit resolution needs no separate gather."""
    nodes = _pack_nodes(flat)
    tris = _pack_tri_rows(flat, v0, v1, v2, n, ent)
    return PackedBvh(nodes=jnp.asarray(tris_pad(nodes)), tris=jnp.asarray(tris_pad(tris)))


def _pack_nodes(flat) -> np.ndarray:
    is_leaf = flat.prim_count > 0
    leaf_ids = np.cumsum(is_leaf) - 1  # node -> its leaf row
    M = flat.n_nodes
    nodes = np.zeros((M, 128), np.float32)
    nodes[:, 0:3] = flat.node_min
    nodes[:, 3:6] = flat.node_max
    nodes[:, 6] = flat.hit_link
    nodes[:, 7] = flat.miss_link
    nodes[:, 8] = np.where(is_leaf, leaf_ids, 0)
    nodes[:, 9] = flat.prim_count
    return nodes


def _leaf_map(flat, T):
    """Primitive -> (row, slot) for the leaf-row layouts; prim ranges are
    contiguous in leaf order.  Returns (row, slot, leaf_start)."""
    is_leaf = flat.prim_count > 0
    leaf_start = flat.prim_start[is_leaf]  # (R,) ascending, partitions [0,T)
    g = np.arange(T)
    row = np.searchsorted(leaf_start, g, side="right") - 1
    slot = g - leaf_start[row]
    return row, slot, leaf_start


def _pack_tri_rows(flat, v0, v1, v2, n, ent=None) -> np.ndarray:
    """Vectorised leaf-row packing (dragon-class meshes run to ~1M faces;
    a per-primitive Python loop would dominate scene build)."""
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    n = np.asarray(n, np.float64)
    T = len(v0)
    if ent is None:
        ent = np.zeros(T, np.int64)
    ent = np.asarray(ent)
    row, slot, leaf_start = _leaf_map(flat, T)
    n_leaves = len(leaf_start)

    area = np.einsum("ij,ij->i", n, np.cross(v1 - v0, v2 - v0))
    # Per-triangle constants precomputed in f64 at pack time so the kernel
    # saves a divide (1/area) and a 3-term dot (n.v0) per ray-triangle test.
    # inv_area = 0 marks degenerate/empty slots (never hit).
    inv_area = np.where(area != 0.0, 1.0 / np.where(area == 0.0, 1.0, area), 0.0)
    dd = np.einsum("ij,ij->i", n, v0)
    tris = np.zeros((max(n_leaves, 1), 128), np.float32)
    tris[:, 12::TRI_STRIDE] = -1.0  # gid = -1 in empty slots
    base = slot * TRI_STRIDE
    for j in range(3):
        tris[row, base + j] = v0[:, j]
        tris[row, base + 3 + j] = v1[:, j]
        tris[row, base + 6 + j] = v2[:, j]
        tris[row, base + 9 + j] = n[:, j]
    tris[row, base + 12] = np.arange(T)
    tris[row, base + 13] = inv_area
    tris[row, base + 14] = ent
    tris[row, base + 15] = dd
    return tris


def tris_pad(a: np.ndarray) -> np.ndarray:
    """Pad rows to a multiple of 8 (f32 sublane tile)."""
    r = (-len(a)) % 8
    if r:
        a = np.pad(a, ((0, r), (0, 0)))
    return a


def _kernel(nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz, excl, tinit,
            tout, iout, eout):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    inv = tuple(1.0 / c for c in d)
    excl_i = excl[:]
    t_init = tinit[:]

    def bcast(row, j):
        return jnp.broadcast_to(row[0, j], BLOCK)

    def body(carry):
        cursor, t_best, i_best, e_best = carry
        row = nodes_ref[pl.ds(cursor, 1), :]  # (1, 128)

        # Slab test (bvh.rs:8-21) against the shared node, per lane.
        tmin = jnp.full(BLOCK, -BIG)
        tmax = jnp.full(BLOCK, BIG)
        for ax in range(3):
            t0 = (bcast(row, ax) - o[ax]) * inv[ax]
            t1 = (bcast(row, 3 + ax) - o[ax]) * inv[ax]
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        lane_hit = (tmin < tmax) & (tmin < t_best) & (tmax > 0.0)
        any_hit = jnp.any(lane_hit)

        count = row[0, 9].astype(jnp.int32)
        is_leaf_hit = any_hit & (count > 0)

        def leaf(t_best, i_best, e_best):
            leaf_row = row[0, 8].astype(jnp.int32)
            tr = tris_ref[pl.ds(leaf_row, 1), :]  # (1, 128): 8 tri slots
            return _tri_row_test(tr, o, d, excl_i, t_best, i_best, e_best)

        t_best, i_best, e_best = lax.cond(
            is_leaf_hit, leaf, lambda t, i, e: (t, i, e), t_best, i_best, e_best
        )

        hit_link = row[0, 6].astype(jnp.int32)
        miss_link = row[0, 7].astype(jnp.int32)
        cursor = jnp.where(any_hit, hit_link, miss_link)
        return cursor, t_best, i_best, e_best

    def cond(carry):
        return carry[0] >= 0

    cursor0 = jnp.int32(0)
    zero = jnp.zeros(BLOCK, jnp.int32)
    state = (cursor0, t_init, zero, zero)
    _, t_best, i_best, e_best = lax.while_loop(cond, body, state)
    tout[:] = jnp.where(t_best < t_init, t_best, BIG)
    iout[:] = i_best
    eout[:] = e_best


ROWS_PER_CHUNK = 32  # 256 triangles per cullable chunk


class ChunkedTris(NamedTuple):
    """Array-only pytree (the static chunk count travels in SceneStatic)."""

    tris: jnp.ndarray       # (R, 128) f32 leaf-row layout (see pack_bvh)
    chunk_meta: jnp.ndarray  # (C, 128) f32: [aabb min xyz, max xyz, row0, nrows]
    # Field-replicated table for the streamed kernels (each triangle
    # constant pre-broadcast across the 128-lane axis so the row test
    # never touches the scalar unit; sorted_traverse.replicate_tris).
    # None when the scene doesn't use the replicated layout.
    tris_rep: "jnp.ndarray | None" = None
    # (T,) int32 gid -> entity map.  Closest-hit kernels skip the
    # in-kernel ent broadcast + select per slot and the launcher resolves
    # ent = tri_ent[gid] with ONE gather after the walk (exact: the
    # packed slot ent IS this map's value).  Occlusion kernels still read
    # ent in-kernel (the excl_ent test needs it per slot).
    tri_ent: "jnp.ndarray | None" = None


def _pack_tri_rows_plane(flat, v0, v1, v2, n, ent, centers,
                         rows_per_chunk, rpad) -> np.ndarray:
    """Plane-form slot layout (v2) for the chunked kernels, built in f64:

      [0:3] n   [3] dd = n.(v0-c)   [4:7] g1  [7] c1   [8:11] g2  [11] c2
      [12] gid  [13] 0   [14] ent   [15] 0

    where bx = c1 + g1.p' + 0, by = c2 + g2.p', bz = 1-bx-by are the
    barycentric coordinates of the CHUNK-RECENTRED hit point p' = (o-c) + t d
    (c = the chunk's AABB center, passed per chunk in `centers`), derived
    from the identity cross(v1-p, v2-p).n = n.(v1 x v2) + p.((v1-v2) x n).
    Recentring keeps |c1|, |p'.g1| ~ O(chunk extent / tri extent) so the f32
    cancellation error stays local no matter where the mesh sits in world
    space.  Empty and degenerate slots get c1 = c2 = -BIG: bx = -BIG fails
    bx >= 0 for every ray, which subsumes the vertex layout's gid >= 0 and
    inv_area != 0 guards.

    Replaces per-ray cross products with two precomputed affine forms: the
    kernel's per-slot cost falls from ~67 vector ops + 14 broadcasts to
    ~49 ops + 12 broadcasts -- and the broadcasts are the measured
    bottleneck of the row test (see sorted_traverse design notes)."""
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    n = np.asarray(n, np.float64)
    T = len(v0)
    if ent is None:
        ent = np.zeros(T, np.int64)
    ent = np.asarray(ent)
    row, slot, _ = _leaf_map(flat, T)
    c = np.asarray(centers, np.float64)[row // rows_per_chunk]  # (T, 3)

    area = np.einsum("ij,ij->i", n, np.cross(v1 - v0, v2 - v0))
    inv_area = np.where(area != 0.0, 1.0 / np.where(area == 0.0, 1.0, area), 0.0)
    v0c, v1c, v2c = v0 - c, v1 - c, v2 - c
    dd = np.einsum("ij,ij->i", n, v0c)
    g1 = np.cross(v1 - v2, n) * inv_area[:, None]
    c1 = np.einsum("ij,ij->i", n, np.cross(v1c, v2c)) * inv_area
    g2 = np.cross(v2 - v0, n) * inv_area[:, None]
    c2 = np.einsum("ij,ij->i", n, np.cross(v2c, v0c)) * inv_area
    bad = area == 0.0
    c1 = np.where(bad, -np.float64(BIG), c1)
    c2 = np.where(bad, -np.float64(BIG), c2)

    rows = np.zeros((max(rpad, 1), 128), np.float32)
    rows[:, 7::TRI_STRIDE] = -BIG   # c1 in empty slots
    rows[:, 11::TRI_STRIDE] = -BIG  # c2
    rows[:, 12::TRI_STRIDE] = -1.0  # gid
    base = slot * TRI_STRIDE
    for j in range(3):
        rows[row, base + j] = n[:, j]
        rows[row, base + 4 + j] = g1[:, j]
        rows[row, base + 8 + j] = g2[:, j]
    rows[row, base + 3] = dd
    rows[row, base + 7] = c1
    rows[row, base + 11] = c2
    rows[row, base + 12] = np.arange(T)
    rows[row, base + 14] = ent
    return rows


def pack_chunked(flat, v0, v1, v2, n, ent=None,
                 rows_per_chunk: int = ROWS_PER_CHUNK):
    """Chunked layout for closest_hit_chunked / the sorted kernels: the
    BVH's leaf-row order (a spatial sort) cut into fixed row ranges, each
    with its AABB.  The BVH tree itself is discarded -- only its ordering
    quality matters here.

    Meta row layout (f32 cols): [0:6] chunk AABB lo/hi, [6] first row,
    [7] row count, and -- when rows_per_chunk <= 15 -- [8 : 8+8*rows] per-ROW
    AABBs (lo xyz, hi xyz, pad, pad), the sub-hierarchy the sorted kernels
    use to gate each 8-triangle row test.  Empty rows get an inverted AABB
    (+BIG lo / -BIG hi) that fails every slab test.

    The table is padded to n_chunks * rows_per_chunk rows so every chunk's
    full row range [c*rows, (c+1)*rows) is in-bounds: the sorted kernels
    read/DMA whole chunks unconditionally (sorted_traverse.py).  Pad rows
    use the canonical empty fill (gid = -1, c1 = c2 = -BIG) so their slots
    can never hit."""
    T = len(v0)
    row, _, leaf_start = _leaf_map(flat, T)
    # One row per BVH *leaf* (leaves may be underfull, so R >= ceil(T/8)).
    R = max(len(leaf_start), 1)
    n_chunks = -(-R // rows_per_chunk)
    rpad = n_chunks * rows_per_chunk

    # Per-row AABBs straight from the triangle verts (prim ranges are
    # contiguous per leaf); rows past R get an inverted AABB.
    tmin3 = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tmax3 = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    row_lo = np.full((rpad, 3), BIG, np.float32)
    row_hi = np.full((rpad, 3), -BIG, np.float32)
    if T:
        row_lo[: len(leaf_start)] = np.minimum.reduceat(tmin3, leaf_start, axis=0)
        row_hi[: len(leaf_start)] = np.maximum.reduceat(tmax3, leaf_start, axis=0)

    meta = np.zeros((n_chunks, 128), np.float32)
    clo = row_lo.reshape(n_chunks, rows_per_chunk, 3)
    chi = row_hi.reshape(n_chunks, rows_per_chunk, 3)
    meta[:, 0:3] = clo.min(axis=1)
    meta[:, 3:6] = chi.max(axis=1)
    meta[:, 6] = np.arange(n_chunks) * rows_per_chunk
    meta[:, 7] = np.minimum((np.arange(n_chunks) + 1) * rows_per_chunk, R) \
        - np.arange(n_chunks) * rows_per_chunk
    if rows_per_chunk <= 15:
        rowmeta = np.concatenate(
            [clo, chi, np.zeros((n_chunks, rows_per_chunk, 2), np.float32)],
            axis=2,
        )  # (C, rows, 8)
        meta[:, 8 : 8 + 8 * rows_per_chunk] = rowmeta.reshape(n_chunks, -1)

    # Chunk centers for the recentred plane layout: exactly the midpoint the
    # kernel recomputes from meta cols 0:6 in f32, so pack-time and run-time
    # shifts agree bit-for-bit.  Empty chunks (no live rows) center at 0.
    valid = (meta[:, 7] > 0) & (meta[:, 0] <= meta[:, 3])
    centers = np.where(valid[:, None],
                       0.5 * (meta[:, 0:3] + meta[:, 3:6]), 0.0)
    tris = _pack_tri_rows_plane(flat, v0, v1, v2, n, ent,
                                centers, rows_per_chunk, rpad)
    ent_arr = (np.zeros(max(T, 1), np.int32) if ent is None
               else np.asarray(ent, np.int32))
    return ChunkedTris(
        tris=jnp.asarray(tris_pad(tris)),
        chunk_meta=jnp.asarray(tris_pad(meta)),
        tri_ent=jnp.asarray(ent_arr),
    ), n_chunks


def _tri_row_test(tr, o, d, excl_i, t_best, i_best, e_best,
                  excl_ent=None, any_hit=False):
    """Test the PACK_LEAF triangle slots of row value `tr` ((1,128)) against
    the ray block.  Shared by the packet and chunked kernels.

    any_hit mode (occlusion queries): a qualifying hit collapses the lane's
    t_best to 0 instead of recording (t, id) -- the lane then fails every
    subsequent slab test (tmin < 0 only when the origin sits inside a box),
    so finished lanes stop pulling chunks in.  excl_ent skips hits on a
    per-lane excluded entity (the light being sampled)."""
    blk = o[0].shape

    def bcast(j):
        return jnp.broadcast_to(tr[0, j], blk)

    for k in range(PACK_LEAF):
        c = k * TRI_STRIDE
        v0 = [bcast(c + j) for j in range(3)]
        v1 = [bcast(c + 3 + j) for j in range(3)]
        v2 = [bcast(c + 6 + j) for j in range(3)]
        nrm = [bcast(c + 9 + j) for j in range(3)]
        gid = tr[0, c + 12].astype(jnp.int32)
        inv_area = bcast(c + 13)  # 0 for degenerate/empty slots
        ent = tr[0, c + 14].astype(jnp.int32)
        dd_ = bcast(c + 15)  # n . v0, precomputed at pack time

        cos = nrm[0] * d[0] + nrm[1] * d[1] + nrm[2] * d[2]
        n_o = nrm[0] * o[0] + nrm[1] * o[1] + nrm[2] * o[2]
        denom = jnp.where(cos == 0.0, 1.0, cos)
        t = (dd_ - n_o) / denom
        p = [o[j] + d[j] * t for j in range(3)]

        def cross_dot_n(a, b):
            cx = a[1] * b[2] - a[2] * b[1]
            cy = a[2] * b[0] - a[0] * b[2]
            cz = a[0] * b[1] - a[1] * b[0]
            return nrm[0] * cx + nrm[1] * cy + nrm[2] * cz

        pb = [v1[j] - p[j] for j in range(3)]
        pc = [v2[j] - p[j] for j in range(3)]
        pa = [v0[j] - p[j] for j in range(3)]
        area_pbc = cross_dot_n(pb, pc)
        area_pca = cross_dot_n(pc, pa)
        bx = area_pbc * inv_area
        by = area_pca * inv_area
        bz = 1.0 - bx - by

        # NB no isfinite(t) guard: inf t fails t < t_best, and NaN (only
        # reachable via dead-lane 1e30 origins overflowing p) fails every
        # >= comparison, so garbage lanes drop out of `ok` on their own.
        ok = (
            (cos != 0.0)
            & (t >= 0.0)
            & (bx >= 0.0)
            & (by >= 0.0)
            & (bz >= 0.0)
            & (inv_area != 0.0)
            & (t < t_best)
            & (gid != excl_i)
            & (gid >= 0)
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
        e_best = jnp.where(ok, ent, e_best)
    return t_best, i_best, e_best


def _tri_row_test_v2(tr, o, d, excl_i, t_best, i_best, e_best,
                     excl_ent=None, any_hit=False, track_ent=True):
    """Plane-form row test over _pack_tri_rows_plane slots.  `o` MUST be the
    ray origin pre-shifted by the chunk center the row was packed against
    (the caller computes osh = o - 0.5*(meta lo + hi) once per chunk).

    12 broadcast fields per slot (vs 16) and ~49 vector ops (vs ~67): the
    t-test uses the precomputed plane (n, dd), the barycentrics are affine
    forms bx = c1 + g1.p, by = c2 + g2.p evaluated without materializing p
    (bx = c1 + g1.o + t * g1.d).  No cos/gid/inv_area guards needed: a
    parallel ray yields t = +-inf/NaN which fails t >= 0 or t < t_best, and
    empty/degenerate slots carry c1 = -BIG so bx >= 0 fails for every
    lane."""
    blk = o[0].shape

    def bcast(j):
        return jnp.broadcast_to(tr[0, j], blk)

    for k in range(PACK_LEAF):
        s = k * TRI_STRIDE
        nrm = [bcast(s + j) for j in range(3)]
        dd_ = bcast(s + 3)
        g1 = [bcast(s + 4 + j) for j in range(3)]
        c1 = bcast(s + 7)
        g2 = [bcast(s + 8 + j) for j in range(3)]
        c2 = bcast(s + 11)
        gid = tr[0, s + 12].astype(jnp.int32)
        ent = tr[0, s + 14].astype(jnp.int32) if track_ent else None

        cos = nrm[0] * d[0] + nrm[1] * d[1] + nrm[2] * d[2]
        n_o = nrm[0] * o[0] + nrm[1] * o[1] + nrm[2] * o[2]
        t = (dd_ - n_o) / cos
        bx = c1 + (g1[0] * o[0] + g1[1] * o[1] + g1[2] * o[2]) \
            + t * (g1[0] * d[0] + g1[1] * d[1] + g1[2] * d[2])
        by = c2 + (g2[0] * o[0] + g2[1] * o[1] + g2[2] * o[2]) \
            + t * (g2[0] * d[0] + g2[1] * d[1] + g2[2] * d[2])
        bz = 1.0 - bx - by

        # t>=0 & bx>=0 & by>=0 & bz>=0 composed as one min-tree compare
        # (3 mins + 1 cmp vs 4 cmps + 3 ands; XLA min propagates NaN, so a
        # parallel ray's t = NaN still fails -- identical semantics, fewer
        # VPU ops in the flop-bound walk).
        ok = (
            (jnp.minimum(jnp.minimum(t, bx), jnp.minimum(by, bz)) >= 0.0)
            & (t < t_best)
            & (gid != excl_i)
        )
        if excl_ent is not None:
            ok = ok & (ent != excl_ent)
        if any_hit:
            # Occlusion only needs the collapsed t; the id/ent selects are
            # pure waste in the VPU-flop-bound walk.
            t_best = jnp.where(ok, 0.0, t_best)
            continue
        t_best = jnp.where(ok, t, t_best)
        i_best = jnp.where(ok, gid, i_best)
        if track_ent:
            e_best = jnp.where(ok, ent, e_best)
    return t_best, i_best, e_best


def _chunk_shift(bc, o):
    """Per-chunk recentred origin for the plane-form row test: the midpoint
    of the chunk AABB (meta cols 0:6), matching pack-time bit-for-bit."""
    return tuple(o[ax] - 0.5 * (bc(ax) + bc(3 + ax)) for ax in range(3))


def _make_chunked_kernel(n_chunks: int):
    def kernel(meta_ref, tris_ref, ox, oy, oz, dx, dy, dz, excl, tinit,
               tout, iout, eout):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        excl_i = excl[:]
        t_best = tinit[:]
        i_best = jnp.zeros(BLOCK, jnp.int32)
        e_best = jnp.zeros(BLOCK, jnp.int32)

        for c in range(n_chunks):  # static unroll: culling tree of conds
            def bc(j):
                return jnp.broadcast_to(meta_ref[c, j], BLOCK)

            tmin = jnp.full(BLOCK, -BIG)
            tmax = jnp.full(BLOCK, BIG)
            for ax in range(3):
                t0 = (bc(ax) - o[ax]) * inv[ax]
                t1 = (bc(3 + ax) - o[ax]) * inv[ax]
                tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
                tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
            any_hit = jnp.any((tmin < tmax) & (tmin < t_best) & (tmax > 0.0))

            r0 = meta_ref[c, 6].astype(jnp.int32)
            nr = meta_ref[c, 7].astype(jnp.int32)

            osh = _chunk_shift(bc, o)

            def do_chunk(tb, ib, eb):
                def row_body(r, carry):
                    tb, ib, eb = carry
                    tr = tris_ref[pl.ds(r, 1), :]
                    return _tri_row_test_v2(tr, osh, d, excl_i, tb, ib, eb)

                return lax.fori_loop(r0, r0 + nr, row_body, (tb, ib, eb))

            t_best, i_best, e_best = lax.cond(
                any_hit, do_chunk, lambda tb, ib, eb: (tb, ib, eb),
                t_best, i_best, e_best,
            )

        tout[:] = jnp.where(t_best < tinit[:], t_best, BIG)
        iout[:] = i_best
        eout[:] = e_best

    return kernel


def closest_hit_chunked(ct: ChunkedTris, n_chunks: int, o, d, excl_idx, t_init,
                        interpret=False):
    """Closest triangle hit via culled-chunk brute force over VMEM.

    The BVH-ordered triangle rows are cut into AABB-guarded chunks; each
    (8,128) ray block slab-tests a chunk (vector math against statically
    indexed metadata -- no gathers, no dynamic scalar reads) and skips it
    with a scalar cond when no lane can hit.  Coherent blocks touch a few
    chunks; fully incoherent blocks degrade to VMEM-speed brute force, which
    still beats per-node packet stepping because the per-iteration scalar
    overhead amortises over 256 triangles."""
    return _launch_chunked(
        _make_chunked_kernel(n_chunks), ct.chunk_meta, ct.tris,
        o, d, excl_idx, t_init, interpret, bounds=_meta_bounds(ct.chunk_meta),
    )


def _meta_bounds(meta):
    """Scene AABB from valid chunk rows (col 7 = row count > 0)."""
    valid = (meta[:, 7] > 0)[:, None]
    lo = jnp.min(jnp.where(valid, meta[:, 0:3], BIG), axis=0)
    hi = jnp.max(jnp.where(valid, meta[:, 3:6], -BIG), axis=0)
    return lax.stop_gradient(lo), lax.stop_gradient(hi)


SPH_STRIDE = 8   # floats per sphere slot
SPH_PER_ROW = 128 // SPH_STRIDE  # 16


def pack_spheres_chunked(centers, radii, ent=None, gid0: int = 0,
                         rows_per_chunk: int = 16):
    """Pack spheres (numpy (S,3), (S,)) into chunked rows for
    closest_hit_spheres.  Slot layout: [cx cy cz r^2 gid 0 0 0]; empty slots
    have r^2 = -1 (disc = b^2 - (oc.oc + 1) < 0 always misses).  Spheres are
    morton-sorted so chunk AABBs stay tight.  gid written = gid0 + position
    in the SORTED order; returns (ChunkedTris, n_chunks, order)."""
    S = len(radii)
    c = np.asarray(centers, np.float64)
    r = np.asarray(radii, np.float64)
    if ent is None:
        ent = np.zeros(S, np.int64)
    ent = np.asarray(ent)
    # Morton-ish sort for chunk locality (BVH-order equivalent for spheres).
    lo, hi = c.min(0), c.max(0)
    ext = np.where(hi - lo > 0, hi - lo, 1.0)
    q = np.clip(((c - lo) / ext * 1023).astype(np.int64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    order = np.argsort(spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2))
    c, r, ent = c[order], r[order], ent[order]

    R = -(-S // SPH_PER_ROW)
    n_chunks = -(-R // rows_per_chunk)
    # The sorted sphere kernel tests every row of a chunk (no per-row meta
    # count) and the FLAT kernel tests every row of the table, so allocate
    # the table already padded to the f32 sublane tile (multiple of 8) and
    # apply the canonical empty fill (r^2 = -1, gid = -1) to EVERY row --
    # all-zero pad rows would act as phantom r=0 spheres at the origin with
    # gid=0, and tris_pad's zero-fill would reintroduce exactly that for
    # the rows past n_chunks * rows_per_chunk.
    rpad = -(-max(n_chunks * rows_per_chunk, 1) // 8) * 8
    rows = np.zeros((rpad, 128), np.float32)
    rows[:, 3::SPH_STRIDE] = -1.0  # r^2 = -1 in empty slots
    rows[:, 4::SPH_STRIDE] = -1.0
    for i in range(S):
        row, slot = divmod(i, SPH_PER_ROW)
        s = slot * SPH_STRIDE
        rows[row, s : s + 3] = c[i]
        rows[row, s + 3] = r[i] * r[i]
        rows[row, s + 4] = gid0 + i
        rows[row, s + 5] = ent[i]

    meta = np.zeros((n_chunks, 128), np.float32)
    for k in range(n_chunks):
        i0 = k * rows_per_chunk * SPH_PER_ROW
        i1 = min(i0 + rows_per_chunk * SPH_PER_ROW, S)
        cc, rr = c[i0:i1], r[i0:i1, None]
        meta[k, 0:3] = (cc - rr).min(0)
        meta[k, 3:6] = (cc + rr).max(0)
        meta[k, 6] = k * rows_per_chunk
        meta[k, 7] = min((k + 1) * rows_per_chunk, R) - k * rows_per_chunk
    return (
        ChunkedTris(tris=jnp.asarray(rows),  # already tile-padded, see above
                    chunk_meta=jnp.asarray(tris_pad(meta))),
        n_chunks,
        order,
    )


def _sphere_row_test(sr, o, d, excl_i, t_best, i_best, e_best,
                     excl_ent=None, any_hit=False):
    """Test SPH_PER_ROW sphere slots of row value `sr` ((1,128)) against the
    ray block.  Matches geom/sphere.py's semantics (geom.rs:208-235) in plain
    f32 -- callers must route large/far spheres to the double-single path.
    excl_ent / any_hit as in _tri_row_test."""
    blk = o[0].shape

    def bcast(j):
        return jnp.broadcast_to(sr[0, j], blk)

    for k in range(SPH_PER_ROW):
        s = k * SPH_STRIDE
        cx, cy, cz, r2 = bcast(s), bcast(s + 1), bcast(s + 2), bcast(s + 3)
        gid = sr[0, s + 4].astype(jnp.int32)
        ent = sr[0, s + 5].astype(jnp.int32)
        ocx = o[0] - cx
        ocy = o[1] - cy
        ocz = o[2] - cz
        b = d[0] * ocx + d[1] * ocy + d[2] * ocz
        c2 = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - c2
        root = jnp.sqrt(jnp.maximum(disc, 0.0))
        d1 = -b + root
        d2 = -b - root
        t = jnp.where(d2 > 0.0, d2, d1)
        ok = (
            (disc >= 0.0)
            & (d1 >= 0.0)
            & (t < t_best)
            & (gid != excl_i)
            & (gid >= 0)
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
        e_best = jnp.where(ok, ent, e_best)
    return t_best, i_best, e_best


def _make_chunked_sphere_kernel(n_chunks: int):
    def kernel(meta_ref, sph_ref, ox, oy, oz, dx, dy, dz, excl, tinit,
               tout, iout, eout):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        excl_i = excl[:]
        t_best = tinit[:]
        i_best = jnp.zeros(BLOCK, jnp.int32)
        e_best = jnp.zeros(BLOCK, jnp.int32)

        for c in range(n_chunks):
            def bc(j):
                return jnp.broadcast_to(meta_ref[c, j], BLOCK)

            tmin = jnp.full(BLOCK, -BIG)
            tmax = jnp.full(BLOCK, BIG)
            for ax in range(3):
                t0 = (bc(ax) - o[ax]) * inv[ax]
                t1 = (bc(3 + ax) - o[ax]) * inv[ax]
                tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
                tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
            any_hit = jnp.any((tmin < tmax) & (tmin < t_best) & (tmax > 0.0))

            r0 = meta_ref[c, 6].astype(jnp.int32)
            nr = meta_ref[c, 7].astype(jnp.int32)

            def do_chunk(tb, ib, eb):
                def row_body(r, carry):
                    tb, ib, eb = carry
                    sr = sph_ref[pl.ds(r, 1), :]
                    return _sphere_row_test(sr, o, d, excl_i, tb, ib, eb)

                return lax.fori_loop(r0, r0 + nr, row_body, (tb, ib, eb))

            t_best, i_best, e_best = lax.cond(
                any_hit, do_chunk, lambda tb, ib, eb: (tb, ib, eb),
                t_best, i_best, e_best,
            )

        tout[:] = jnp.where(t_best < tinit[:], t_best, BIG)
        iout[:] = i_best
        eout[:] = e_best

    return kernel


def _make_anyhit_kernel(n_chunks: int, row_test, plane_rows=False):
    """Occlusion-query variant of the chunked kernels (row_test is
    _tri_row_test or _sphere_row_test).  Carry is t_best alone, seeded with
    the per-lane max distance (the light sample's analytic hit distance);
    a qualifying hit drops it to 0 so the lane stops attracting chunks, and
    a block whose every lane is finished (or dead) slab-rejects everything
    left.  Output: t == 0 where occluded."""

    def kernel(meta_ref, tab_ref, ox, oy, oz, dx, dy, dz, excl, eent, tmax,
               tout):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        excl_i = excl[:]
        excl_e = eent[:]
        t_best = tmax[:]
        i_d = jnp.zeros(BLOCK, jnp.int32)

        for c in range(n_chunks):
            def bc(j):
                return jnp.broadcast_to(meta_ref[c, j], BLOCK)

            tmin = jnp.full(BLOCK, -BIG)
            tmx = jnp.full(BLOCK, BIG)
            for ax in range(3):
                t0 = (bc(ax) - o[ax]) * inv[ax]
                t1 = (bc(3 + ax) - o[ax]) * inv[ax]
                tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
                tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
            any_hit = jnp.any((tmin < tmx) & (tmin < t_best) & (tmx > 0.0))

            r0 = meta_ref[c, 6].astype(jnp.int32)
            nr = meta_ref[c, 7].astype(jnp.int32)
            o_r = _chunk_shift(bc, o) if plane_rows else o

            def do_chunk(tb):
                def row_body(r, tb):
                    tr = tab_ref[pl.ds(r, 1), :]
                    tb, _, _ = row_test(
                        tr, o_r, d, excl_i, tb, i_d, i_d,
                        excl_ent=excl_e, any_hit=True,
                    )
                    return tb

                return lax.fori_loop(r0, r0 + nr, row_body, tb)

            t_best = lax.cond(any_hit, do_chunk, lambda tb: tb, t_best)

        tout[:] = t_best

    return kernel


def _launch_anyhit(kernel, meta, table, o, d, excl_idx, excl_ent, t_max,
                   interpret, bounds):
    """Occlusion-query launch: same lane prep + coherence sort as
    _launch_chunked (shadow wavefronts are exactly the incoherent ones),
    one boolean-equivalent output (t == 0)."""
    N = o.shape[0]
    npad = -(-N // BLOCK_N) * BLOCK_N
    grid = npad // BLOCK_N

    o = lax.stop_gradient(o)
    d = lax.stop_gradient(d)
    t_max = lax.stop_gradient(t_max.astype(jnp.float32))
    excl_idx = excl_idx.astype(jnp.int32)
    excl_ent = excl_ent.astype(jnp.int32)

    perm = None
    if bounds is not None and N >= _SORT_MIN_N:
        lo, hi = bounds
        perm = _coherence_perm(o, d, lo, hi)
        packed = jnp.concatenate(
            [o, d, excl_idx.astype(jnp.float32)[:, None],
             excl_ent.astype(jnp.float32)[:, None], t_max[:, None]],
            axis=1,
        )
        packed = jnp.take(packed, perm, axis=0)
        o, d = packed[:, 0:3], packed[:, 3:6]
        excl_idx = packed[:, 6].astype(jnp.int32)
        excl_ent = packed[:, 7].astype(jnp.int32)
        t_max = packed[:, 8]

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full(npad - N, fill, x.dtype)]) if npad != N else x
        return x.reshape(grid * BLOCK[0], BLOCK[1])

    args = (
        prep(o[:, 0], 1e30),
        prep(o[:, 1], 1e30),
        prep(o[:, 2], 1e30),
        prep(d[:, 0], 1.0),
        prep(d[:, 1], 1.0),
        prep(d[:, 2], 1.0),
        prep(excl_idx, -1),
        prep(excl_ent, -1),
        prep(t_max, 0.0),
    )
    ray_spec = pl.BlockSpec(BLOCK, lambda i: (i, 0), memory_space=pltpu.VMEM)
    tree_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t_out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tree_spec, tree_spec] + [ray_spec] * 9,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.float32),
        interpret=interpret,
    )(lax.stop_gradient(meta), lax.stop_gradient(table), *args)
    t_out = t_out.reshape(npad)[:N]
    if perm is not None:
        t_out = jnp.zeros_like(t_out).at[perm].set(t_out)
    return t_out == 0.0


def occludes_chunked(ct: ChunkedTris, n_chunks: int, o, d, excl_idx, excl_ent,
                     t_max, interpret=False):
    """True per lane iff some triangle with gid != excl_idx and
    ent != excl_ent is hit at t in [0, t_max).  Early-exit any-hit form of
    closest_hit_chunked for shadow rays (trace.rs:61-66 only compares the
    occluder's entity id, so the closest hit is never needed)."""
    return _launch_anyhit(
        _make_anyhit_kernel(n_chunks, _tri_row_test_v2, plane_rows=True),
        ct.chunk_meta, ct.tris,
        o, d, excl_idx, excl_ent, t_max, interpret,
        bounds=_meta_bounds(ct.chunk_meta),
    )


def occludes_spheres(cs: ChunkedTris, n_chunks: int, o, d, excl_idx, excl_ent,
                     t_max, interpret=False):
    """Any-hit occlusion over the chunked sphere table (see
    occludes_chunked)."""
    return _launch_anyhit(
        _make_anyhit_kernel(n_chunks, _sphere_row_test), cs.chunk_meta,
        cs.tris, o, d, excl_idx, excl_ent, t_max, interpret,
        bounds=_meta_bounds(cs.chunk_meta),
    )


# Below this wave size the argsort + gather/scatter overhead of coherence
# sorting outweighs the culling it buys (a couple of blocks are coherent
# enough already).
_SORT_MIN_N = 8192


def _spread3(x):
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _coherence_perm(o, d, lo, hi, octant_major: bool = False):
    """Lane permutation grouping rays by (morton(origin), direction octant).

    Chunk culling is per (8,128) block: a block's cost is the union of its
    rays' chunk sets, so sorting lanes by origin locality (24-bit morton in
    scene bounds, high bits) then direction octant (low bits) makes blocks
    compact in space and consistent in sign -- secondary/shadow wavefronts
    then cull like primary ones.  Dead lanes (origin pushed to 1e30 by the
    integrator) clamp to max morton and pack into all-dead tail blocks that
    skip every chunk.  Per-ray results are block-independent (a chunk is
    only skipped when NO lane can hit), so sorting changes performance, not
    values."""
    ext = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((o - lo) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    m = _spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1) | (_spread3(q[:, 2]) << 2)
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] < 0).astype(jnp.uint32) << 2)
    )
    # Key order is per kernel family (measured on TPU v5e):
    #   - octant_major=True (the sorted triangle kernels): the BLOCK-level
    #     interval cull needs a sign-pure direction interval per axis -- an
    #     axis whose directions span zero contributes (-inf, inf), i.e. no
    #     cull at all.  Octant in the high bits guarantees at most 7 mixed
    #     blocks per wave; within an octant, morton keeps origins compact.
    #     (400k-tri incoherent wave: candidates/block drop 2.6x, walk time
    #     halves.)
    #   - octant_major=False (the linear sphere kernel): its cull is
    #     per-LANE inside the kernel with no interval arithmetic, so origin
    #     locality dominates; morton-major keeps a block's lanes near the
    #     same sphere chunks.  (Switching the stress-500 scene to
    #     octant-major cost 4.4x.)
    # For primary waves (all lanes share an octant) the two orders
    # coincide.  Dead lanes (origin pushed past 1e29 by the integrator or
    # the root cull) sort above everything so they pack into one contiguous
    # all-dead tail regardless of direction.
    if octant_major:
        key = (octant << 27) | (m >> 3)
    else:
        key = ((m >> 6) << 3) | octant
    key = jnp.where(o[:, 0] > 1e29, jnp.uint32(0xFFFFFFFF), key)
    return jnp.argsort(key)


def _launch_chunked(kernel, meta, table, o, d, excl_idx, t_init, interpret,
                    bounds=None):
    N = o.shape[0]
    npad = -(-N // BLOCK_N) * BLOCK_N
    grid = npad // BLOCK_N

    o = lax.stop_gradient(o)
    d = lax.stop_gradient(d)
    t_init = lax.stop_gradient(t_init.astype(jnp.float32))
    excl_idx = excl_idx.astype(jnp.int32)

    perm = None
    if bounds is not None and N >= _SORT_MIN_N:
        lo, hi = bounds
        perm = _coherence_perm(o, d, lo, hi)
        # One packed gather moves all per-ray inputs into sorted order
        # (gather cost on TPU is per-op, nearly width-independent).  excl
        # ids are < 2^24 so the f32 round trip is exact.
        packed = jnp.concatenate(
            [o, d, excl_idx.astype(jnp.float32)[:, None], t_init[:, None]],
            axis=1,
        )
        packed = jnp.take(packed, perm, axis=0)
        o, d = packed[:, 0:3], packed[:, 3:6]
        excl_idx = packed[:, 6].astype(jnp.int32)
        t_init = packed[:, 7]

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full(npad - N, fill, x.dtype)]) if npad != N else x
        return x.reshape(grid * BLOCK[0], BLOCK[1])

    args = (
        prep(o[:, 0], 1e30),
        prep(o[:, 1], 1e30),
        prep(o[:, 2], 1e30),
        prep(d[:, 0], 1.0),
        prep(d[:, 1], 1.0),
        prep(d[:, 2], 1.0),
        prep(excl_idx, -1),
        prep(t_init, 0.0),
    )
    ray_spec = pl.BlockSpec(BLOCK, lambda i: (i, 0), memory_space=pltpu.VMEM)
    tree_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t_out, i_out, e_out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[tree_spec, tree_spec] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.float32),
            jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.int32),
            jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.int32),
        ),
        interpret=interpret,
    )(lax.stop_gradient(meta), lax.stop_gradient(table), *args)
    t_out = t_out.reshape(npad)[:N]
    i_out = i_out.reshape(npad)[:N]
    e_out = e_out.reshape(npad)[:N]
    if perm is not None:
        # One packed scatter restores lane order (ids < 2^24: f32-exact).
        packed_out = jnp.stack(
            [t_out, i_out.astype(jnp.float32), e_out.astype(jnp.float32)], 1
        )
        restored = jnp.zeros_like(packed_out).at[perm].set(packed_out)
        t_out = restored[:, 0]
        i_out = restored[:, 1].astype(jnp.int32)
        e_out = restored[:, 2].astype(jnp.int32)
    return t_out, i_out, e_out


def closest_hit_spheres(cs: ChunkedTris, n_chunks: int, o, d, excl_idx, t_init,
                        interpret=False):
    """Closest small-sphere hit via culled-chunk brute force over VMEM.
    Same contract as closest_hit_chunked (t == BIG where nothing beat
    t_init); indices are global sphere ids as packed."""
    return _launch_chunked(
        _make_chunked_sphere_kernel(n_chunks), cs.chunk_meta, cs.tris,
        o, d, excl_idx, t_init, interpret, bounds=_meta_bounds(cs.chunk_meta),
    )


# Largest sphere-table row count the FLAT kernel handles (64 rows = 1024
# spheres).  Opt-in via PATHS_TPU_SPH_FLAT=1 (see the dispatch in
# sorted_traverse).  Measured on TPU v5e, stress-500 (32 rows), 345k
# fully incoherent lanes: flat 26.5 ms/launch vs the sorted walk's 29 ms
# presorted / 45 ms with lane sort -- i.e. the walk's machinery costs
# little, and on REAL (coherent) waves its cull + early exit win
# end-to-end (5.66e6 vs 4.61e6 rays/s on the stress tier), so flat stays
# opt-in.  The 26.5 ms also calibrates the VPU: ~46 elem-ops/slot at
# ~2e12 elem-ops/s effective -- the sphere kernels are compute-bound.
SPH_FLAT_MAX_ROWS = 64


def _make_flat_sphere_kernel(n_rows: int, anyhit: bool):
    def kernel(tab_ref, ox, oy, oz, dx, dy, dz, excl, *rest):
        if anyhit:
            eent, tinit = rest[0], rest[1]
            outs = rest[2:]
        else:
            tinit = rest[0]
            outs = rest[1:]
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        excl_i = excl[:]
        ee = eent[:] if anyhit else None
        t0 = tinit[:]
        tb = t0
        ib = jnp.zeros(BLOCK, jnp.int32)
        eb = jnp.zeros(BLOCK, jnp.int32)
        for r in range(n_rows):
            sr = tab_ref[pl.ds(r, 1), :]
            tb, ib, eb = _sphere_row_test(
                sr, o, d, excl_i, tb, ib, eb, excl_ent=ee, any_hit=anyhit
            )
        if anyhit:
            outs[0][:] = tb
        else:
            outs[0][:] = jnp.where(tb < t0, tb, BIG)
            outs[1][:] = ib
            outs[2][:] = eb

    return kernel


def _launch_flat_spheres(table, o, d, excl_idx, t_seed, anyhit,
                         excl_ent=None, interpret=False):
    """Flat unrolled sphere launch: no lane sort (nothing to cull, so ray
    order is irrelevant), no meta.  Dead lanes (origin 1e30) miss through
    arithmetic (disc -> NaN fails every comparison)."""
    N = o.shape[0]
    npad = -(-N // BLOCK_N) * BLOCK_N
    grid = npad // BLOCK_N

    o = lax.stop_gradient(o)
    d = lax.stop_gradient(d)
    t_seed = lax.stop_gradient(t_seed.astype(jnp.float32))
    excl_idx = excl_idx.astype(jnp.int32)

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full(npad - N, fill, x.dtype)]) if npad != N else x
        return x.reshape(grid * BLOCK[0], BLOCK[1])

    args = [
        prep(o[:, 0], 1e30), prep(o[:, 1], 1e30), prep(o[:, 2], 1e30),
        prep(d[:, 0], 1.0), prep(d[:, 1], 1.0), prep(d[:, 2], 1.0),
        prep(excl_idx, -1),
    ]
    if anyhit:
        args.append(prep(excl_ent.astype(jnp.int32), -1))
    args.append(prep(t_seed, 0.0))

    ray_spec = pl.BlockSpec(BLOCK, lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.float32)
    ishape = jax.ShapeDtypeStruct((grid * BLOCK[0], BLOCK[1]), jnp.int32)
    res = pl.pallas_call(
        _make_flat_sphere_kernel(table.shape[0], anyhit),
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * len(args),
        out_specs=ray_spec if anyhit else (ray_spec,) * 3,
        out_shape=fshape if anyhit else (fshape, ishape, ishape),
        interpret=interpret,
    )(table, *args)
    if anyhit:
        return res.reshape(npad)[:N] == 0.0
    t, i, e = res
    return t.reshape(npad)[:N], i.reshape(npad)[:N], e.reshape(npad)[:N]


def closest_hit_packet(pt: PackedBvh, o, d, excl_idx, t_init, interpret=False):
    """Closest triangle hit for N rays via VMEM packet traversal.

    o, d: (N, 3); excl_idx: (N,) triangle to skip (-1 none); t_init: (N,)
    current best (cross-primitive pruning, like bvh/traverse.py).
    Returns (t, idx, ent): t == BIG where nothing beat t_init.

    Traversal is discrete -- outputs carry no gradients (stop_gradient), the
    caller re-derives differentiable shading quantities at the returned
    index (SURVEY.md section 7: BVH as non-differentiable selector).
    """
    bounds = (
        lax.stop_gradient(pt.nodes[0, 0:3]),  # root AABB
        lax.stop_gradient(pt.nodes[0, 3:6]),
    )
    return _launch_chunked(
        _kernel, pt.nodes, pt.tris, o, d, excl_idx, t_init, interpret,
        bounds=bounds,
    )
