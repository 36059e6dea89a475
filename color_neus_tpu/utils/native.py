"""Native (C++) extension loader: builds csrc/ on first use with g++,
binds via ctypes, and degrades gracefully to the pure-Python paths.

No pybind11 in this image; the C ABI + ctypes is the binding layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from color_neus_tpu.utils.logger import logger


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_BUILD = os.path.join(_REPO_ROOT, "build")

_lock = threading.Lock()
_lib_cache: dict = {}


def _build_lib(name: str, sources: list[str]) -> str | None:
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    srcs = [os.path.join(_CSRC, s) for s in sources]
    if os.path.exists(out) and all(os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, *srcs]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            logger.warning("native build of %s failed:\n%s", name, r.stderr[-2000:])
            return None
        return out
    except Exception as e:
        logger.warning("native build of %s failed: %s", name, e)
        return None


def load_library(name: str, sources: list[str]):
    """Build-if-needed and dlopen; returns None when unavailable."""
    with _lock:
        if name in _lib_cache:
            return _lib_cache[name]
        path = _build_lib(name, sources)
        lib = None
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
            except OSError as e:
                logger.warning("dlopen %s failed: %s", path, e)
        _lib_cache[name] = lib
        return lib


# ---------------------------------------------------------------------------
# Marching tetrahedra
# ---------------------------------------------------------------------------

def marching_tet_native(u: np.ndarray, level: float = 0.0,
                        origin=(0, 0, 0)):
    """Native isosurface extraction; returns (verts, tris) or None if the
    native library is unavailable. `origin` offsets the lattice BEFORE
    interpolation (exact sub-block marching — see mt_extract)."""
    lib = load_library("marchingtet", ["marching_tet.cpp"])
    if lib is None:
        return None
    fn = lib.mt_extract
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    u = np.ascontiguousarray(u, np.float32)
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = fn(u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            u.shape[0], u.shape[1], u.shape[2], ctypes.c_float(level),
            int(origin[0]), int(origin[1]), int(origin[2]),
            ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp), ctypes.byref(nt))
    if rc != 0:
        return None
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int64)
    finally:
        lib.mt_free(vp)
        lib.mt_free(tp)
    return verts.astype(np.float64), tris
