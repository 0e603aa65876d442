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
