"""Scene representation: flattened SoA buffers.

TPU-native analogue of the reference's Scene (src/scene.rs:134-170): at build
time every object / mesh / area-light is flattened into world-space primitive
soup -- here as structure-of-arrays buffers that live replicated in HBM:

  - spheres and triangles in separate SoA arrays (no enum dispatch per prim),
  - one unified entity table (objects then lights) holding material SoA and
    light-emission colours,
  - per-triangle pre-baked world-space shading data (vertex normals already
    rotated per scene.rs:184 / geom.rs:119-121; vertex colours per
    model.rs:158-172) so the hot loop is pure gathers + arithmetic.

``SceneArrays`` is the dynamic (differentiable) pytree; ``SceneStatic`` holds
compile-time facts (counts, sky type) and is hashable for use as a static jit
argument.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp

from paths_tpu.sky import Sky


class BvhArrays(NamedTuple):
    """Stackless (skip-link / threaded) BVH over the triangle soup.

    node_min/node_max: (N, 3) AABBs.
    hit_link:  (N,) next node index when the AABB is hit (first child for
               inner nodes, the preorder successor for leaves).
    miss_link: (N,) next node index when the AABB is missed (skips subtree).
               -1 terminates traversal.
    prim_start/prim_count: (N,) leaf primitive ranges into the reordered
               triangle arrays (0 count for inner nodes).
    """

    node_min: jnp.ndarray
    node_max: jnp.ndarray
    hit_link: jnp.ndarray
    miss_link: jnp.ndarray
    prim_start: jnp.ndarray
    prim_count: jnp.ndarray


class SceneArrays(NamedTuple):
    # Spheres (objects' analytic spheres + area-light spheres).
    sph_center: jnp.ndarray  # (S, 3)
    sph_radius: jnp.ndarray  # (S,)
    sph_ent: jnp.ndarray  # (S,) int32 entity index

    # Triangles (world space, baked at build like scene.rs:149 / geom.rs:111-117).
    tri_v0: jnp.ndarray  # (T, 3)
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_n: jnp.ndarray  # (T, 3) unit geometric normal (world)
    tri_vn0: jnp.ndarray  # (T, 3) shading normals (world; may be non-unit,
    tri_vn1: jnp.ndarray  #   reproducing model.rs:142-156 -- no renorm)
    tri_vn2: jnp.ndarray
    tri_vc0: jnp.ndarray  # (T, 3) vertex colours (ones when absent)
    tri_vc1: jnp.ndarray
    tri_vc2: jnp.ndarray
    tri_ent: jnp.ndarray  # (T,) int32
    tri_smooth: jnp.ndarray  # (T,) bool: smooth normals (no backface flip,
    #   matching scene.rs:178-190 which replaces the flipped geometric normal)

    # Entity table: objects [0, n_objects) then lights [n_objects, E).
    ent_is_light: jnp.ndarray  # (E,) bool
    ent_light_emission: jnp.ndarray  # (E, 3) colour * intensity for lights
    mat_mtype: jnp.ndarray  # (E,) int32
    mat_albedo: jnp.ndarray  # (E, 3)
    mat_albedo_vertex: jnp.ndarray  # (E,) bool: albedo from vertex colours
    mat_emit: jnp.ndarray  # (E, 3)
    mat_r0: jnp.ndarray  # (E,)
    mat_metalness: jnp.ndarray  # (E,)
    mat_roughness: jnp.ndarray  # (E,)

    # FresnelCombination sub-materials (material.rs:373-428).  For rows with
    # mtype FRESNEL, the primary albedo/r0/metalness/roughness columns hold
    # the *diffuse* sub-material (typed by mat_fd_mtype) and the fs_ columns
    # hold the *specular* sub-material; mat_fresnel_r0 is ((1-n)/(1+n))^2
    # from the refractive index (material.rs:381-387).  Gathered into the hot
    # loop only when SceneStatic.has_fresnel.
    mat_fd_mtype: jnp.ndarray  # (E,) int32
    mat_fs_mtype: jnp.ndarray  # (E,) int32
    mat_fs_albedo: jnp.ndarray  # (E, 3)
    mat_fs_r0: jnp.ndarray  # (E,)
    mat_fs_metalness: jnp.ndarray  # (E,)
    mat_fs_roughness: jnp.ndarray  # (E,)
    mat_fresnel_r0: jnp.ndarray  # (E,)

    # Lights.
    light_ltype: jnp.ndarray  # (L,) int32
    light_pos: jnp.ndarray  # (L, 3)
    light_radius: jnp.ndarray  # (L,)
    light_colour: jnp.ndarray  # (L, 3)
    light_intensity: jnp.ndarray  # (L,)
    light_ent: jnp.ndarray  # (L,) int32

    sky: Sky
    bvh: Optional[BvhArrays]
    # Pallas chunked-triangle layout (ops/pallas_traverse.ChunkedTris):
    # BVH-ordered leaf rows + chunk AABBs, resident in VMEM during
    # traversal.  None when n_tris is small or the layout exceeds VMEM.
    ptris: object = None
    # Pallas chunked-sphere layout (morton-sorted small spheres; big/far
    # spheres stay on the double-single path, see scene/build.py).
    psph: object = None


@dataclass(frozen=True)
class SceneStatic:
    """Hashable compile-time scene facts."""

    n_spheres: int
    n_tris: int
    n_lights: int
    n_entities: int
    sky_type: int
    use_bvh: bool = False
    has_fresnel: bool = False
    # Pallas sorted-traversal triangle intersector (ops/sorted_traverse.py):
    # chunk count is compile-time; 0 disables the kernel (CPU runs / tiny
    # meshes).  pallas_tri_stream keeps the triangle table in HBM and DMAs
    # chunks on demand (meshes past the VMEM-resident budget);
    # pallas_tri_rows is the chunk granularity (rows of 8 triangles).
    pallas_tri_chunks: int = 0
    pallas_tri_stream: bool = False
    pallas_tri_rows: int = 8
    # Streamed kernels read the field-replicated triangle table (each
    # constant pre-broadcast across lanes -- scalar-unit-free row test;
    # ops/sorted_traverse.replicate_tris).  Only meaningful with
    # pallas_tri_stream; the fat table only pays on big meshes.
    pallas_tri_rep: bool = False
    # Replicated table for the OCCLUSION (any-hit) walk too -- measured
    # slower at dragon scale (extra DMA exposed on shorter walks), so off
    # by default; PATHS_TPU_OCCL_REP=1 at scene build re-tests.
    pallas_occl_rep: bool = False
    # Ray-block sublane count for the sorted kernels.  With sub-block
    # row-test gating (ops/sorted_traverse._half_cond_enabled) admission
    # stays at 1024-lane granularity regardless of width, so wide blocks
    # purely amortise per-visit fixed costs: 64 for streamed / big
    # resident meshes, 16 for small resident ones (measured round 5).
    pallas_block_rows: int = 8
    # Pallas culled-chunk sphere intersector; sphere array layout is
    # [0, n_sph_big) double-single-path spheres, then kernel spheres.
    pallas_sph_chunks: int = 0
    # Dispatch small sphere tables to the flat unrolled kernel instead of
    # the sorted walk (opt-in baseline; PATHS_TPU_SPH_FLAT=1 resolved at
    # scene build, NOT at trace time, so it participates in jit caching).
    pallas_sph_flat: bool = False
    # Ray-block width for the sorted SPHERE kernels: 64 for real sphere
    # sets (stress-500: 4.66 -> 4.92x anchor with sub-block gating), 8
    # when the table is a couple of chunks (padding waste dominates).
    # PATHS_TPU_SPH_BLOCK_ROWS overrides at scene build for sweeps.
    pallas_sph_block_rows: int = 8
    n_sph_big: int = 0
    # Select shading rows from small tables via one-hot MXU matmul instead
    # of HBM gathers (a TPU-only win; see integrator._take_rows).
    onehot_tables: bool = False
    # Bounce cap (trace.rs:14 caps `loops > 10` -> 11 iterations).  A
    # compile-time knob: lowering it shrinks the unrolled-scan program for
    # fast-compile paths (previews, dryruns) at the cost of bias.
    max_bounces: int = 10
    # Environment-map NEE (importance-sample the HDRI as a light source;
    # capability extension over the reference's skybox-on-miss).  Off by
    # default to match reference semantics exactly.
    env_nee: bool = False
    # Run the Pallas kernels in interpret mode (CPU tests / multichip
    # dryruns exercise the production kernel path without a TPU; set via
    # PATHS_TPU_FORCE_PALLAS=1, see scene/build.py).
    pallas_interpret: bool = False
    # The caller keeps the whole wave coherence-sorted (render_samples'
    # per-bounce wave-state sort), so BOTH the closest-hit and occlusion
    # kernels skip their internal lane sort + unsort: shadow rays ride the
    # bounce-ray sort (origins are the sorted wave's hit points; for any
    # single light their directions are sign-pure except in blocks that
    # straddle the light's coordinate planes).
    wave_presorted: bool = False
    # Occlusion (shadow) waves run their OWN per-call lane sort even when
    # the wave is presorted: the shadow ray's (direction octant | origin
    # morton) key IS the light-relative key -- its direction points at the
    # sampled light, not along the bounce ray the wave sort keyed on.
    # Only meaningful with wave_presorted (lane_sort is already on
    # otherwise).  Set by scene/build.py; PATHS_TPU_OCCL_SORT overrides.
    occl_sort: bool = False

    @property
    def has_spheres(self) -> bool:
        return self.n_spheres > 0

    @property
    def has_tris(self) -> bool:
        return self.n_tris > 0
