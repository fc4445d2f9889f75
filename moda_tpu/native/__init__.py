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
_LIBS = {}


def _compile(name: str) -> str:
    src = os.path.join(_HERE, name + ".cpp")
    so = os.path.join(_HERE, "lib" + name + ".so")
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-o", so, src]
        )
    return so


def _load(name: str):
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        lib = ctypes.CDLL(_compile(name))
        if name == "marching":
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
        elif name == "raster":
            lib.rasterize.restype = None
            lib.rasterize.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
        _LIBS[name] = lib
        return lib


def _build_and_load():
    return _load("marching")


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


def rasterize(verts: np.ndarray, faces: np.ndarray, attrs: np.ndarray,
              height: int, width: int):
    """Hard z-buffer rasterization with perspective-correct vertex-attribute
    interpolation (native). verts [V,3] = (x_px, y_px, depth); faces [F,3];
    attrs [V,C]. Returns (attr [H,W,C], depth [H,W], mask [H,W])."""
    lib = _load("raster")
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    attrs = np.ascontiguousarray(attrs, np.float32)
    C = attrs.shape[1]
    out_attr = np.zeros((height, width, C), np.float32)
    out_depth = np.zeros((height, width), np.float32)
    out_mask = np.zeros((height, width), np.float32)
    fptr = ctypes.POINTER(ctypes.c_float)
    lib.rasterize(
        verts.ctypes.data_as(fptr), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        attrs.ctypes.data_as(fptr), C, height, width,
        out_attr.ctypes.data_as(fptr), out_depth.ctypes.data_as(fptr),
        out_mask.ctypes.data_as(fptr))
    return out_attr, out_depth, out_mask
