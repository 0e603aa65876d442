"""Scene build: description -> flattened SoA device buffers.

The "compile" step of the renderer (reference: Scene::new, scene.rs:143-170
and SceneDescription::scene, serde.rs:81-155): meshes are expanded to
world-space triangles (rotation @ v * scale + translation, geom.rs:251-261),
area lights contribute their sphere primitive, materials resolve (Auto pulls
the OBJ diffuse else white Lambertian, serde.rs:126-131), and everything
lands in SceneArrays.

All host math in f64, cast to f32 on upload -- mirroring the reference's f64
with golden-test tolerances absorbing the cast.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from paths_tpu import materials as M
from paths_tpu import lights as LT
from paths_tpu import sky as SK
from paths_tpu.camera import Camera, make_camera
from paths_tpu.math import matrix as mat
from paths_tpu.scene import desc as D
from paths_tpu.scene.models import ModelLibrary
from paths_tpu.scene.types import SceneArrays, SceneStatic


_NO_SUB = (M.LAMBERTIAN, np.zeros(3), 0.0, 0.0, 0.0)  # (mtype, albedo, r0, metal, rough)


def _on_accel() -> bool:
    """True when the default backend is an accelerator (TPU/tunneled TPU) --
    gates the Pallas kernels and the one-hot table selection."""
    import jax

    return jax.default_backend() not in ("cpu",)


def _occl_sort_default(tri_chunks: int) -> bool:
    """Whether occlusion waves re-sort by their own (light-relative) key
    when the bounce wave is presorted (SceneStatic.occl_sort).  Measured on
    TPU v5e (2026-08-21, benchmarks/exp_dragon_sweep.py): the per-call sort
    pays on big streamed meshes, where occlusion walks are candidate-union
    bound and shadow directions (toward the light) diverge from the bounce
    sort's keys; on small resident meshes the walk is short enough that the
    extra argsort + pack/unpack gathers cost more than they save.
    PATHS_TPU_OCCL_SORT=0/1 overrides for sweeps."""
    import os

    env = os.environ.get("PATHS_TPU_OCCL_SORT", "")
    if env in ("0", "1"):
        return env == "1"
    from paths_tpu.ops import sorted_traverse as STV

    return tri_chunks > STV.OCCL_SORT_MIN_CHUNKS


def _force_pallas() -> bool:
    """PATHS_TPU_FORCE_PALLAS=1 routes CPU runs through the production
    Pallas kernels in interpret mode, so tests and multichip dryruns cover
    the code path that actually runs on TPU (not just the XLA fallback)."""
    import os

    return os.environ.get("PATHS_TPU_FORCE_PALLAS", "") not in ("", "0")


def _basic_sub_row(m: D.MaterialD):
    """Map a BasicMaterial description (serde.rs:267-272: Lambertian | Gloss
    | Mirror | CookTorrance) to (mtype, albedo, r0, metalness, roughness)."""
    kind = m.kind
    if kind == "lambertian":
        return (M.LAMBERTIAN, np.array(m.albedo.colour.tolist()), 0.0, 0.0, 0.0)
    if kind == "mirror":
        return (M.MIRROR, np.ones(3), 0.0, 0.0, 0.0)
    if kind == "gloss":
        return (M.GLOSS, np.array(m.albedo.colour.tolist()), m.reflectance,
                m.metalness, 0.0)
    if kind == "cook_torrance":
        return (M.COOK_TORRANCE, np.array(m.albedo.colour.tolist()), 0.0, 0.0,
                m.roughness)
    raise ValueError(f"Material kind {kind} is not a BasicMaterial")


def _material_row(m: D.MaterialD, model_diffuse=None):
    """Map a MaterialD to SoA fields (mtype, albedo, vertex_flag, emit, r0,
    metalness, roughness, fd_mtype, fs_row, fresnel_r0)."""
    kind = m.kind
    if kind == "auto":
        # serde.rs:126-131: OBJ diffuse as Lambertian, else white Lambertian.
        albedo = model_diffuse if model_diffuse is not None else np.ones(3)
        return (M.LAMBERTIAN, np.asarray(albedo, np.float64), False, np.zeros(3),
                0.0, 0.0, 0.0, M.LAMBERTIAN, _NO_SUB, 0.0)
    if kind == "lambertian":
        return (M.LAMBERTIAN, np.array(m.albedo.colour.tolist()), m.albedo.is_vertex,
                np.zeros(3), 0.0, 0.0, 0.0, M.LAMBERTIAN, _NO_SUB, 0.0)
    if kind == "mirror":
        return (M.MIRROR, np.ones(3), False, np.zeros(3), 0.0, 0.0, 0.0,
                M.LAMBERTIAN, _NO_SUB, 0.0)
    if kind == "gloss":
        return (M.GLOSS, np.array(m.albedo.colour.tolist()), m.albedo.is_vertex,
                np.zeros(3), m.reflectance, m.metalness, 0.0,
                M.LAMBERTIAN, _NO_SUB, 0.0)
    if kind == "cook_torrance":
        return (M.COOK_TORRANCE, np.array(m.albedo.colour.tolist()), False,
                np.zeros(3), 0.0, 0.0, m.roughness, M.LAMBERTIAN, _NO_SUB, 0.0)
    if kind == "fresnel":
        # FresnelCombination (material.rs:373-428): arbitrary BasicMaterial
        # diffuse/specular pair blended by the Schlick weight from
        # r0 = ((1-n)/(1+n))^2 (material.rs:381-387).  The diffuse
        # sub-material occupies the primary columns (typed by fd_mtype); the
        # specular one goes to the fs_ columns.
        n2 = m.refractive_index
        fresnel_r0 = ((1.0 - n2) / (1.0 + n2)) ** 2
        diffuse = m.diffuse if m.diffuse is not None else D.MaterialD(kind="lambertian")
        specular = m.specular if m.specular is not None else D.MaterialD(kind="mirror")
        fd_mtype, d_alb, d_r0, d_metal, d_rough = _basic_sub_row(diffuse)
        is_vertex = diffuse.albedo.is_vertex if diffuse.kind != "mirror" else False
        return (M.FRESNEL, d_alb, is_vertex, np.zeros(3), d_r0, d_metal, d_rough,
                fd_mtype, _basic_sub_row(specular), fresnel_r0)
    raise ValueError(f"Unknown material kind {kind}")


def build_scene(sd: D.SceneDescription, search_dirs=None, bvh_threshold: int = 32768):
    """Returns (static_cfg, scene_arrays, camera).

    bvh_threshold: triangle count above which the skip-link BVH replaces the
    streaming brute-force intersector (see comment at the build site)."""
    if search_dirs is None:
        search_dirs = [".", sd.base_dir]
        # Scene YAMLs reference assets CWD-relative ("./scenes/objects/..");
        # also try the scene dir's parent so `scenes/foo.yml` works from
        # anywhere.  (os is module-level: a conditional local import here
        # would shadow it for the whole function.)
        search_dirs.append(os.path.dirname(sd.base_dir))

    library = ModelLibrary(search_dirs=search_dirs)
    for name, filepath in sd.models.items():
        library.declare(name, filepath)

    sph_center, sph_radius, sph_ent = [], [], []
    tri_chunks = []  # list of dict of arrays per mesh-object

    # Entity/material rows (objects first, lights appended after).
    rows = []

    def add_entity(mrow):
        rows.append(mrow)
        return len(rows) - 1

    for o in sd.objects:
        if o.shape_kind == "sphere":
            ent = add_entity(_material_row(o.material))
            sph_center.append(np.array(o.sphere.center.tolist()))
            sph_radius.append(o.sphere.radius)
            sph_ent.append(ent)
        else:
            mesh = o.mesh
            rot = mat.mesh_rotation(mesh.rotation.pitch, mesh.rotation.yaw, mesh.rotation.roll)
            translation = np.array(mesh.translation.tolist())
            for ix in library.load(mesh.model):
                model = library.get(ix)
                ent = add_entity(_material_row(o.material, model.diffuse))
                if mesh.smooth_normals:
                    model.compute_vertex_normals()

                # World-space bake (geom.rs:251-261): R @ v * scale + t.
                verts_w = model.vertices @ rot.T * mesh.scale + translation
                fn_w = model.face_normals @ rot.T  # geom.rs:259

                # Filter degenerate faces but keep original face indices for
                # attribute gathers (model.rs:174-192).
                ok = ~np.isnan(fn_w).any(axis=1)
                faces = model.faces[ok]
                n_w = fn_w[ok]

                v0 = verts_w[faces[:, 0]]
                v1 = verts_w[faces[:, 1]]
                v2 = verts_w[faces[:, 2]]

                if mesh.smooth_normals and model.vertex_normals is not None:
                    vn_w = model.vertex_normals @ rot.T  # scene.rs:184
                    vn0 = vn_w[faces[:, 0]]
                    vn1 = vn_w[faces[:, 1]]
                    vn2 = vn_w[faces[:, 2]]
                    # Vertices with no valid adjacent face average to NaN;
                    # fall back to the geometric normal there.
                    for arr in (vn0, vn1, vn2):
                        bad = np.isnan(arr).any(axis=1)
                        arr[bad] = n_w[bad]
                else:
                    vn0 = vn1 = vn2 = n_w

                if model.vertex_colours is not None:
                    vc0 = model.vertex_colours[faces[:, 0]]
                    vc1 = model.vertex_colours[faces[:, 1]]
                    vc2 = model.vertex_colours[faces[:, 2]]
                else:
                    vc0 = vc1 = vc2 = np.ones_like(v0)

                smooth = mesh.smooth_normals and model.vertex_normals is not None
                tri_chunks.append(
                    dict(v0=v0, v1=v1, v2=v2, n=n_w, vn0=vn0, vn1=vn1, vn2=vn2,
                         vc0=vc0, vc1=vc1, vc2=vc2,
                         ent=np.full(len(faces), ent, np.int64),
                         smooth=np.full(len(faces), smooth, bool))
                )

    n_objects = len(rows)

    # Lights (scene.rs:155-164: area lights also become primitives).
    l_type, l_pos, l_rad, l_col, l_int, l_ent = [], [], [], [], [], []
    for li, l in enumerate(sd.lights):
        ent = add_entity((M.LAMBERTIAN, np.zeros(3), False, np.zeros(3), 0.0, 0.0, 0.0, M.LAMBERTIAN, _NO_SUB, 0.0))
        l_ent.append(ent)
        l_type.append(LT.POINT if l.kind == "point" else LT.SPHERE)
        l_pos.append(np.array(l.position.tolist()))
        l_rad.append(l.radius)
        l_col.append(np.array(l.colour.tolist()))
        l_int.append(l.intensity)
        if l.kind == "sphere":
            sph_center.append(np.array(l.position.tolist()))
            sph_radius.append(l.radius)
            sph_ent.append(ent)

    n_entities = max(1, len(rows))
    n_lights = len(sd.lights)

    # ---- entity table ----
    while len(rows) < n_entities:
        rows.append((M.LAMBERTIAN, np.zeros(3), False, np.zeros(3), 0.0, 0.0, 0.0, M.LAMBERTIAN, _NO_SUB, 0.0))
    mtype = np.array([r[0] for r in rows], np.int32)
    albedo = np.stack([r[1] for r in rows]).astype(np.float64)
    albedo_vertex = np.array([r[2] for r in rows], bool)
    emit = np.stack([r[3] for r in rows]).astype(np.float64)
    r0 = np.array([r[4] for r in rows], np.float64)
    metalness = np.array([r[5] for r in rows], np.float64)
    roughness = np.array([r[6] for r in rows], np.float64)
    fd_mtype = np.array([r[7] for r in rows], np.int32)
    fs_mtype = np.array([r[8][0] for r in rows], np.int32)
    fs_albedo = np.stack([r[8][1] for r in rows]).astype(np.float64)
    fs_r0 = np.array([r[8][2] for r in rows], np.float64)
    fs_metalness = np.array([r[8][3] for r in rows], np.float64)
    fs_roughness = np.array([r[8][4] for r in rows], np.float64)
    fresnel_r0 = np.array([r[9] for r in rows], np.float64)
    has_fresnel = bool((mtype == M.FRESNEL).any())

    ent_is_light = np.zeros(n_entities, bool)
    ent_light_emission = np.zeros((n_entities, 3), np.float64)
    for li in range(n_lights):
        e = l_ent[li]
        ent_is_light[e] = True
        ent_light_emission[e] = l_col[li] * l_int[li]  # trace.rs:37

    # ---- primitives ----
    n_spheres = len(sph_center)
    psph = None
    pallas_sph_chunks = 0
    pallas_sph_flat = False
    n_sph_big = 0
    if n_spheres:
        sphc = np.stack(sph_center)
        sphr = np.array(sph_radius, np.float64)
        sphe = np.array(sph_ent, np.int64)

        # Pallas chunked sphere intersector for larger sphere counts (the
        # stress scene's 500 spheres).  Plain-f32 quadratics lose the scene
        # to cancellation for huge/far spheres (the radius-1e6 ground planes,
        # see math/ds.py), so those are partitioned out and stay on the
        # unrolled double-single path; the kernel gets the rest.
        big = (sphr > 1e3) | (np.abs(sphc).max(axis=1) > 1e3)
        if (_on_accel() or _force_pallas()) and int((~big).sum()) > 32:
            from paths_tpu.ops import pallas_traverse as PT
            from paths_tpu.ops import sorted_traverse as STV

            order = np.concatenate([np.nonzero(big)[0], np.nonzero(~big)[0]])
            sphc, sphr, sphe = sphc[order], sphr[order], sphe[order]
            n_sph_big = int(big.sum())
            # Fine chunks (2 rows = 32 slots) for the sorted sphere walk:
            # block cull + front-to-back early exit need several chunks to
            # bite even at stress-scene sphere counts.
            psph, pallas_sph_chunks, sorder = PT.pack_spheres_chunked(
                sphc[n_sph_big:], sphr[n_sph_big:], ent=sphe[n_sph_big:],
                gid0=n_sph_big,
                rows_per_chunk=STV.SPH_ROWS_PER_CHUNK_SORTED,
            )
            # Apply the kernel's morton sort to the scene arrays so packed
            # gids index them directly.
            tail = n_sph_big + sorder
            sphc[n_sph_big:] = sphc[tail]
            sphr[n_sph_big:] = sphr[tail]
            sphe[n_sph_big:] = sphe[tail]
            # Opt-in flat unrolled sphere kernel (the walk-overhead
            # baseline).  Resolved HERE, outside jit, and threaded through
            # SceneStatic so flipping the env var between builds recompiles
            # instead of silently reusing the first-traced schedule.
            import os as _os

            pallas_sph_flat = (
                _os.environ.get("PATHS_TPU_SPH_FLAT") == "1"
                and psph.tris.shape[0] <= PT.SPH_FLAT_MAX_ROWS
            )
    else:
        sphc = np.zeros((1, 3)); sphr = np.zeros(1); sphe = np.zeros(1, np.int64)

    use_bvh = False
    bvh_arrays = None
    ptris = None
    pallas_tri_chunks = 0
    pallas_tri_stream = False
    pallas_tri_rep = False
    pallas_tri_rows = 8
    pallas_block_rows = 8
    if tri_chunks:
        cat = {k: np.concatenate([c[k] for c in tri_chunks]) for k in tri_chunks[0]}
        n_cat = len(cat["v0"])
        from paths_tpu.ops import pallas_traverse as PT
        from paths_tpu.ops import sorted_traverse as STV

        # Intersector selection:
        #   - tiny meshes (<= 64 tris): unrolled streaming tests in the
        #     integrator (no packing overhead);
        #   - accelerator (or PATHS_TPU_FORCE_PALLAS): the sorted-traversal
        #     Pallas kernels (ops/sorted_traverse.py) -- VMEM-resident table
        #     when it fits, HBM-streaming DMA otherwise, so mesh size is
        #     bounded by HBM like the reference's in-RAM BVH (bvh.rs:78-141);
        #   - pure-CPU fallback: XLA brute-force scan below bvh_threshold,
        #     the gather-driven skip-link BVH above it.
        want_pallas = (_on_accel() or _force_pallas()) and n_cat > 64
        if want_pallas or n_cat > bvh_threshold:
            # Build the skip-link BVH and reorder triangles to its layout so
            # leaf primitive ranges are contiguous (scene.rs:166-168's single
            # global BVH, TPU-flattened).
            from paths_tpu.bvh.build import build_bvh
            from paths_tpu.scene.types import BvhArrays

            tri_min = np.minimum(np.minimum(cat["v0"], cat["v1"]), cat["v2"])
            tri_max = np.maximum(np.maximum(cat["v0"], cat["v1"]), cat["v2"])
            flat = build_bvh(tri_min, tri_max, leaf_size=PT.PACK_LEAF)
            cat = {k: v[flat.order] for k, v in cat.items()}
            if want_pallas:
                import os as _os

                # Chunk size in rows: measured-best per tier (resident 15,
                # streamed 20 -- see ops/sorted_traverse.py constants).
                # The stream decision needs the packed size, so pack at the
                # resident granularity first and repack coarser when the
                # mesh turns out to stream (host-side numpy, one-time).
                # PATHS_TPU_ROWS_PER_CHUNK forces a single value for sweeps.
                rows_env = int(_os.environ.get("PATHS_TPU_ROWS_PER_CHUNK", 0))
                pallas_tri_rows = rows_env or STV.ROWS_PER_CHUNK_SORTED
                ptris, pallas_tri_chunks = PT.pack_chunked(
                    flat, cat["v0"], cat["v1"], cat["v2"], cat["n"],
                    ent=cat["ent"], rows_per_chunk=pallas_tri_rows,
                )
                resident_bytes = (
                    ptris.tris.shape[0] + ptris.chunk_meta.shape[0]
                ) * 128 * 4
                pallas_tri_stream = resident_bytes >= PT.VMEM_LIMIT_BYTES
                if (pallas_tri_stream and not rows_env
                        and STV.ROWS_PER_CHUNK_STREAMED
                        != STV.ROWS_PER_CHUNK_SORTED):
                    pallas_tri_rows = STV.ROWS_PER_CHUNK_STREAMED
                    ptris, pallas_tri_chunks = PT.pack_chunked(
                        flat, cat["v0"], cat["v1"], cat["v2"], cat["n"],
                        ent=cat["ent"], rows_per_chunk=pallas_tri_rows,
                    )
                # Streamed meshes also carry the field-replicated table:
                # triangle constants as lane-wide vector rows instead of
                # scalar splats.  Measured on TPU v5e at dragon scale:
                # CLOSEST-HIT wins (456 -> 432 ms; the splat stream and
                # the vector stream dual-issue, and at block_rows=16 the
                # scalar side is the longer pole) while OCCLUSION loses
                # (342 -> 376 ms), so the integrator uses it for
                # closest-hit only.  ~1.4 GB HBM at 200k tris, built on
                # device.  PATHS_TPU_TRI_REP=0 opts out; meshes whose
                # replicated layout would exceed STV.REP_MAX_BYTES skip it
                # automatically (a ~5% closest-hit gain is not worth HBM
                # exhaustion on million-triangle meshes that stream fine).
                rep_budget = int(_os.environ.get(
                    "PATHS_TPU_TRI_REP_MAX_BYTES", STV.REP_MAX_BYTES
                ))
                if pallas_tri_stream and _os.environ.get(
                    "PATHS_TPU_TRI_REP", "1"
                ) != "0" and STV.rep_bytes(ptris.tris) <= rep_budget:
                    ptris = ptris._replace(
                        tris_rep=STV.replicate_tris(ptris.tris)
                    )
                    pallas_tri_rep = True
                # Ray-block width: with sub-block row-test gating (round
                # 5, sorted_traverse._half_cond_enabled) admission stays
                # at 1024-lane granularity regardless of width, so wide
                # blocks purely amortise per-visit fixed costs -- 64 rows
                # is the measured optimum for streamed and big resident
                # meshes (dragon 1.030 -> 1.219x anchor, doom 1.731 ->
                # 1.896x), while small resident meshes (short walks, few
                # chunks) peak at 16 (teapot 4.081x).  EXCEPTION: a
                # streamed mesh WITHOUT the replicated table (rep budget
                # exceeded or opted out) keeps 16 -- each sub-block's row
                # tests re-splat the compact slots' scalars, and at 64
                # the multiplied splat stream dominates (dragon no-rep:
                # 0.974x at br16 vs 0.836x at br64).
                # PATHS_TPU_BLOCK_ROWS overrides for sweeps.
                pallas_block_rows = int(
                    _os.environ.get("PATHS_TPU_BLOCK_ROWS", 0)
                ) or (
                    64 if ((pallas_tri_stream and pallas_tri_rep)
                           or (not pallas_tri_stream
                               and pallas_tri_chunks >= 512))
                    else 16
                )
            else:
                bvh_arrays = BvhArrays(
                    node_min=jnp.asarray(flat.node_min),
                    node_max=jnp.asarray(flat.node_max),
                    hit_link=jnp.asarray(flat.hit_link),
                    miss_link=jnp.asarray(flat.miss_link),
                    prim_start=jnp.asarray(flat.prim_start),
                    prim_count=jnp.asarray(flat.prim_count),
                )
                use_bvh = True
    else:
        z = np.zeros((1, 3))
        cat = dict(v0=z, v1=z, v2=z, n=z, vn0=z, vn1=z, vn2=z,
                   vc0=z, vc1=z, vc2=z, ent=np.zeros(1, np.int64),
                   smooth=np.zeros(1, bool))
    n_tris = len(cat["v0"]) if tri_chunks else 0

    # ---- lights SoA ----
    if n_lights:
        lt = np.array(l_type, np.int32)
        lp = np.stack(l_pos)
        lr = np.array(l_rad, np.float64)
        lc = np.stack(l_col)
        li_arr = np.array(l_int, np.float64)
        le = np.array(l_ent, np.int64)
    else:
        lt = np.zeros(1, np.int32); lp = np.zeros((1, 3)); lr = np.zeros(1)
        lc = np.zeros((1, 3)); li_arr = np.zeros(1); le = np.zeros(1, np.int64)

    # ---- sky ----
    sb = sd.skybox
    if sb.kind == "flat":
        sky_type, sky_arr = SK.flat(sb.colour.tolist())
    elif sb.kind == "gradient":
        sky_type, sky_arr = SK.gradient(sb.overhead_colour.tolist(), sb.horizon_colour.tolist())
    elif sb.kind == "hdri":
        from paths_tpu.scene.hdr_loader import load_hdr

        path = sb.filename
        if not os.path.exists(path):
            for d in search_dirs:
                cand = os.path.join(d, sb.filename)
                if os.path.exists(cand):
                    path = cand
                    break
        sky_type, sky_arr = SK.hdri(load_hdr(path))
    else:
        raise ValueError(f"Unknown skybox kind {sb.kind}")

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    i32 = lambda a: jnp.asarray(a, jnp.int32)

    arrays = SceneArrays(
        sph_center=f32(sphc), sph_radius=f32(sphr), sph_ent=i32(sphe),
        tri_v0=f32(cat["v0"]), tri_v1=f32(cat["v1"]), tri_v2=f32(cat["v2"]),
        tri_n=f32(cat["n"]),
        tri_vn0=f32(cat["vn0"]), tri_vn1=f32(cat["vn1"]), tri_vn2=f32(cat["vn2"]),
        tri_vc0=f32(cat["vc0"]), tri_vc1=f32(cat["vc1"]), tri_vc2=f32(cat["vc2"]),
        tri_ent=i32(cat["ent"]),
        tri_smooth=jnp.asarray(cat["smooth"]),
        ent_is_light=jnp.asarray(ent_is_light),
        ent_light_emission=f32(ent_light_emission),
        mat_mtype=i32(mtype), mat_albedo=f32(albedo),
        mat_albedo_vertex=jnp.asarray(albedo_vertex),
        mat_emit=f32(emit), mat_r0=f32(r0),
        mat_metalness=f32(metalness), mat_roughness=f32(roughness),
        mat_fd_mtype=i32(fd_mtype), mat_fs_mtype=i32(fs_mtype),
        mat_fs_albedo=f32(fs_albedo), mat_fs_r0=f32(fs_r0),
        mat_fs_metalness=f32(fs_metalness), mat_fs_roughness=f32(fs_roughness),
        mat_fresnel_r0=f32(fresnel_r0),
        light_ltype=i32(lt), light_pos=f32(lp), light_radius=f32(lr),
        light_colour=f32(lc), light_intensity=f32(li_arr), light_ent=i32(le),
        sky=sky_arr,
        bvh=bvh_arrays,
        ptris=ptris,
        psph=psph,
    )

    static = SceneStatic(
        n_spheres=n_spheres,
        n_tris=n_tris,
        n_lights=n_lights,
        n_entities=n_entities,
        sky_type=sky_type,
        use_bvh=use_bvh,
        has_fresnel=has_fresnel,
        pallas_tri_chunks=pallas_tri_chunks,
        pallas_tri_stream=pallas_tri_stream,
        pallas_tri_rep=pallas_tri_rep,
        pallas_occl_rep=(
            pallas_tri_rep and os.environ.get("PATHS_TPU_OCCL_REP") == "1"
        ),
        pallas_tri_rows=pallas_tri_rows,
        pallas_block_rows=pallas_block_rows,
        pallas_sph_chunks=pallas_sph_chunks,
        pallas_sph_flat=pallas_sph_flat,
        # Wide blocks for real sphere sets (stress-500: 4.66 -> 4.92x
        # anchor at 64, reproducible; 128 within noise), narrow for the
        # handful-of-spheres case where padding waste dominates.
        pallas_sph_block_rows=int(
            os.environ.get("PATHS_TPU_SPH_BLOCK_ROWS", 0)
        ) or (64 if pallas_sph_chunks >= 8 else 8),
        n_sph_big=n_sph_big,
        onehot_tables=_on_accel() or _force_pallas(),
        pallas_interpret=_force_pallas() and not _on_accel(),
        occl_sort=_occl_sort_default(pallas_tri_chunks),
    )

    cam = make_camera(
        width=sd.camera.image_width,
        height=sd.camera.image_height,
        location=sd.camera.location.tolist(),
        orientation=(
            sd.camera.orientation.pitch,
            sd.camera.orientation.yaw,
            sd.camera.orientation.roll,
        ),
        sensor_width=sd.camera.sensor_width,
        sensor_height=sd.camera.sensor_height,
        focal_length=sd.camera.focal_length,
        focus_distance=sd.camera.focus_distance,
        aperture=sd.camera.aperture,
    )
    return static, arrays, cam
