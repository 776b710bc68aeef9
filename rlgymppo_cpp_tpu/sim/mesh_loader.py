"""ctypes bindings for the native collision-mesh pipeline (native/
cmf_loader.cpp): .cmf parsing with the reference's validation + hash
(CollisionMeshFile.cpp:11-99) and multithreaded SDF-grid baking — the
mesh-preprocessing role of RocketSim::Init (RocketSim.cpp:102-212),
re-targeted at a dense grid the TPU can sample.

The shared library is built on demand with the repo's Makefile (g++; no
pybind11 dependency).
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcmf.so"))
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_NATIVE_DIR, "cmf_loader.cpp"))):
        subprocess.run(["make", "-s", "-C", os.path.dirname(_LIB_PATH)],
                       check=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cmf_open.restype = ctypes.c_void_p
    lib.cmf_open.argtypes = [ctypes.c_char_p]
    lib.cmf_counts.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.POINTER(ctypes.c_int32)]
    lib.cmf_fill.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_void_p]
    lib.cmf_hash.restype = ctypes.c_uint32
    lib.cmf_hash.argtypes = [ctypes.c_void_p]
    lib.cmf_close.argtypes = [ctypes.c_void_p]
    lib.cmf_bake_sdf.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return lib


def load_cmf(path):
    """Parse a .cmf file -> (tris int32 [T, 3], verts float32 [V, 3],
    hash uint32). Raises on the validation failures the reference fatals
    on (bad counts, bad indices, truncated data)."""
    lib = _load_lib()
    handle = lib.cmf_open(os.fsencode(path))
    if not handle:
        raise ValueError(f"Invalid collision mesh file at {path!r}")
    try:
        nt, nv = ctypes.c_int32(), ctypes.c_int32()
        lib.cmf_counts(handle, ctypes.byref(nt), ctypes.byref(nv))
        tris = np.empty((nt.value, 3), np.int32)
        verts = np.empty((nv.value, 3), np.float32)
        lib.cmf_fill(handle, tris.ctypes.data, verts.ctypes.data)
        h = lib.cmf_hash(handle)
        return tris, verts, int(h)
    finally:
        lib.cmf_close(handle)


def save_cmf(path, tris, verts):
    """Write a .cmf (for tests / tooling; format of ReadFromStream)."""
    tris = np.ascontiguousarray(tris, np.int32)
    verts = np.ascontiguousarray(verts, np.float32)
    with open(path, "wb") as f:
        f.write(np.int32(tris.shape[0]).tobytes())
        f.write(np.int32(verts.shape[0]).tobytes())
        f.write(tris.tobytes())
        f.write(verts.tobytes())


def bake_sdf(tris, verts, bounds_min, bounds_max, dims, band=300.0):
    """Bake the unsigned-distance + push-direction grid.

    Returns (dist float32 [X, Y, Z], dirs float32 [X, Y, Z, 3],
    bounds_min float32 [3], cell float32 [3]). Distances beyond `band`
    read `band` with a zero direction — contacts only need the near field.
    """
    lib = _load_lib()
    tris = np.ascontiguousarray(tris, np.int32)
    verts = np.ascontiguousarray(verts, np.float32)
    dims = np.ascontiguousarray(dims, np.int32)
    bounds_min = np.ascontiguousarray(bounds_min, np.float32)
    bounds_max = np.ascontiguousarray(bounds_max, np.float32)
    cell = ((bounds_max - bounds_min)
            / np.maximum(dims - 1, 1)).astype(np.float32)

    dist = np.empty(tuple(dims), np.float32)
    dirs = np.empty(tuple(dims) + (3,), np.float32)
    lib.cmf_bake_sdf(
        verts.ctypes.data, np.int32(verts.shape[0]),
        tris.ctypes.data, np.int32(tris.shape[0]),
        bounds_min.ctypes.data, cell.ctypes.data, dims.ctypes.data,
        ctypes.c_float(band), dist.ctypes.data, dirs.ctypes.data)
    return dist, dirs, bounds_min, cell
