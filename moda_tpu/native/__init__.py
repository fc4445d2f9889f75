"""Native (C++) host-side components, built on first use via g++ and
loaded through ctypes. Keep the compute path on TPU; these cover host
geometry work the reference did in C/CUDA extensions (marching cubes via
PyMCubes at train_utils.py:19,1441)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None


def _build_and_load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_HERE, "marching.cpp")
        so = os.path.join(_HERE, "libmarching.so")
        if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-o", so, src]
            )
        lib = ctypes.CDLL(so)
        lib.marching_tets.restype = ctypes.c_int
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.argtypes = [ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        return lib


def marching_cubes(grid: np.ndarray, iso: float = 0.0):
    """Isosurface of grid [nx,ny,nz] (float32) at level iso.

    Returns (verts [V,3] in voxel coords (x,y,z), tris [T,3] int32).
    Surface orientation: triangles wind around the >iso region.
    """
    lib = _build_and_load()
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.marching_tets(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(iso), ctypes.byref(vp), ctypes.byref(tp),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise MemoryError("marching_tets allocation failed")
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() if nt.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mt_free(vp, tp)
    return verts, tris
