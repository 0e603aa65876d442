"""Native (C++) runtime components, bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side, latency-critical runtime
work -- BVH construction today, mesh parsing tomorrow -- runs as compiled
C++ (the analogue of the reference's compiled-Rust builder,
/root/reference/src/bvh.rs:143-384).  Every native entry point has a
pure-Python fallback, so the framework degrades gracefully where no
toolchain exists.

The shared library is compiled on first use (``make`` in this directory)
and cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpaths_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=_DIR,
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        c = ctypes
        lib.paths_obj_load.restype = c.c_void_p
        lib.paths_obj_load.argtypes = [c.c_char_p, c.POINTER(c.c_int64)]
        lib.paths_obj_model_info.restype = c.c_int
        lib.paths_obj_model_info.argtypes = [
            c.c_void_p, c.c_int64, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
            c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        ]
        lib.paths_obj_model_data.restype = c.c_int
        lib.paths_obj_model_data.argtypes = [
            c.c_void_p, c.c_int64, c.POINTER(c.c_double), c.POINTER(c.c_int64),
            c.POINTER(c.c_double), c.POINTER(c.c_double),
        ]
        lib.paths_obj_free.restype = None
        lib.paths_obj_free.argtypes = [c.c_void_p]
        lib.paths_ply_load.restype = c.c_void_p
        lib.paths_ply_load.argtypes = [
            c.c_char_p, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
            c.POINTER(c.c_int32),
        ]
        lib.paths_ply_data.restype = c.c_int
        lib.paths_ply_data.argtypes = [
            c.c_void_p, c.POINTER(c.c_double), c.POINTER(c.c_int64),
            c.POINTER(c.c_double),
        ]
        lib.paths_ply_free.restype = None
        lib.paths_ply_free.argtypes = [c.c_void_p]

        lib.paths_build_bvh.restype = ctypes.c_int
        lib.paths_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # tri_min
            ctypes.POINTER(ctypes.c_float),  # tri_max
            ctypes.c_int64,  # n
            ctypes.c_int32,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # node_min
            ctypes.POINTER(ctypes.c_float),  # node_max
            ctypes.POINTER(ctypes.c_int32),  # hit_link
            ctypes.POINTER(ctypes.c_int32),  # miss_link
            ctypes.POINTER(ctypes.c_int32),  # prim_start
            ctypes.POINTER(ctypes.c_int32),  # prim_count
            ctypes.POINTER(ctypes.c_int64),  # order
            ctypes.POINTER(ctypes.c_int64),  # n_nodes out
            ctypes.POINTER(ctypes.c_int32),  # depth out
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int):
    """Binned-SAH build in C++.  Returns the same tuple of arrays as the
    Python builder (node_min, node_max, hit_link, miss_link, prim_start,
    prim_count, order, n_nodes, depth) or None when the library is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(tri_min)
    tmin = np.ascontiguousarray(tri_min, np.float32)
    tmax = np.ascontiguousarray(tri_max, np.float32)
    cap = 2 * n + 2
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    hit_link = np.empty(cap, np.int32)
    miss_link = np.empty(cap, np.int32)
    prim_start = np.empty(cap, np.int32)
    prim_count = np.empty(cap, np.int32)
    order = np.empty(n, np.int64)
    n_nodes = ctypes.c_int64(0)
    depth = ctypes.c_int32(0)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lp = ctypes.POINTER(ctypes.c_int64)
    rc = lib.paths_build_bvh(
        tmin.ctypes.data_as(fp),
        tmax.ctypes.data_as(fp),
        n,
        leaf_size,
        node_min.ctypes.data_as(fp),
        node_max.ctypes.data_as(fp),
        hit_link.ctypes.data_as(ip),
        miss_link.ctypes.data_as(ip),
        prim_start.ctypes.data_as(ip),
        prim_count.ctypes.data_as(ip),
        order.ctypes.data_as(lp),
        ctypes.byref(n_nodes),
        ctypes.byref(depth),
    )
    if rc != 0:
        return None
    m = n_nodes.value
    return (
        node_min[:m].copy(),
        node_max[:m].copy(),
        hit_link[:m].copy(),
        miss_link[:m].copy(),
        prim_start[:m].copy(),
        prim_count[:m].copy(),
        order,
        m,
        depth.value,
    )


def load_obj_native(path: str):
    """Parse an OBJ via the native loader.  Returns a list of dicts
    (vertices (V,3) f64, faces (F,3) i64, texcoords (V,2) f64 | None,
    diffuse (3,) f64 | None) matching obj_loader.ObjModel field-for-field,
    or None when the library is unavailable or parsing fails."""
    lib = _load()
    if lib is None:
        return None
    n_models = ctypes.c_int64(0)
    h = lib.paths_obj_load(path.encode(), ctypes.byref(n_models))
    if not h:
        return None
    try:
        out = []
        dp = ctypes.POINTER(ctypes.c_double)
        lp = ctypes.POINTER(ctypes.c_int64)
        for i in range(n_models.value):
            nv = ctypes.c_int64(0)
            nf = ctypes.c_int64(0)
            has_uv = ctypes.c_int32(0)
            has_kd = ctypes.c_int32(0)
            if lib.paths_obj_model_info(h, i, ctypes.byref(nv), ctypes.byref(nf),
                                        ctypes.byref(has_uv), ctypes.byref(has_kd)):
                return None
            verts = np.empty((nv.value, 3), np.float64)
            faces = np.empty((nf.value, 3), np.int64)
            uvs = np.empty((nv.value, 2), np.float64) if has_uv.value else None
            kd = np.empty(3, np.float64) if has_kd.value else None
            rc = lib.paths_obj_model_data(
                h, i,
                verts.ctypes.data_as(dp),
                faces.ctypes.data_as(lp),
                uvs.ctypes.data_as(dp) if uvs is not None else None,
                kd.ctypes.data_as(dp) if kd is not None else None,
            )
            if rc:
                return None
            out.append(dict(vertices=verts, faces=faces, texcoords=uvs, diffuse=kd))
        return out
    finally:
        lib.paths_obj_free(h)


def load_ply_native(path: str):
    """Parse a PLY via the native loader.  Returns a dict (vertices (V,3)
    f64, faces (F,3) i64, vertex_colours (V,3) f64 | None) matching
    ply_loader.PlyModel, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    has_col = ctypes.c_int32(0)
    h = lib.paths_ply_load(path.encode(), ctypes.byref(nv), ctypes.byref(nf),
                           ctypes.byref(has_col))
    if not h:
        return None
    try:
        dp = ctypes.POINTER(ctypes.c_double)
        lp = ctypes.POINTER(ctypes.c_int64)
        verts = np.empty((nv.value, 3), np.float64)
        faces = np.empty((nf.value, 3), np.int64)
        cols = np.empty((nv.value, 3), np.float64) if has_col.value else None
        rc = lib.paths_ply_data(
            h,
            verts.ctypes.data_as(dp),
            faces.ctypes.data_as(lp),
            cols.ctypes.data_as(dp) if cols is not None else None,
        )
        if rc:
            return None
        return dict(vertices=verts, faces=faces, vertex_colours=cols)
    finally:
        lib.paths_ply_free(h)
