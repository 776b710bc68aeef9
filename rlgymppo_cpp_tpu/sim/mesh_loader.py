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


# Known official arena mesh hashes per game mode (RocketSim.cpp:12-43);
# unknown or duplicate meshes warn like RocketSim::InitFromMem (:149-163)
KNOWN_MESH_HASHES = {
    "soccar": {
        0xA160BAF9, 0x2811EEE8, 0xB81AC8B9, 0x760358D3,
        0x73AE4940, 0x918F4A4E, 0x1F8EE550, 0x255BA8C1,
        0x14B84668, 0xEC759EBF, 0x94FB0D5C, 0xDEA07102,
        0xBD4FBEA8, 0x39A47F63, 0x3D79D25D, 0xD84C7A68,
    },
    "hoops": {
        0x72F2359E, 0x5ED14A26, 0xFD5A0D07, 0x92AFA5B5,
        0x0E4133C7, 0x399E8B5F, 0xBB9D4FB5, 0x8C87FB93,
        0x1CFD0E16, 0xE19E1DF6, 0x9CA179DC, 0x16F3CC19,
    },
}


def validate_mesh_hashes(hashes, game_mode_name="soccar"):
    """Warn on unknown/duplicate mesh hashes (RocketSim.cpp:149-163).
    Returns the list of warnings (also printed)."""
    known = KNOWN_MESH_HASHES.get(game_mode_name, set())
    seen = set()
    warnings = []
    for h in hashes:
        if h in seen:
            warnings.append(
                f"Duplicate collision mesh 0x{h:08X} — it will be "
                "loaded twice")
        elif known and h not in known:
            warnings.append(
                f"Unknown {game_mode_name} collision mesh 0x{h:08X} "
                "(not an official arena mesh; proceeding anyway)")
        seen.add(h)
    for w in warnings:
        print(f"mesh_loader: WARNING: {w}")
    return warnings


# .cmf vertex data is stored in BULLET units (meters): the reference
# feeds the raw floats straight into its BT-unit collision world
# (CollisionMeshFile.cpp MakeBulletMesh -> btTriangleMesh::findOrAddVertex
# with no conversion, and Arena adds the shape untransformed). This
# engine works in UU natively, so verts are scaled at the file boundary.
BT_TO_UU = 50.0


def load_cmf(path):
    """Parse a .cmf file -> (tris int32 [T, 3], verts float32 [V, 3] in
    UU, hash uint32). Raises on the validation failures the reference
    fatals on (bad counts, bad indices, truncated data). The hash is
    computed on the raw file bytes (BT-unit floats), so official dumps
    match the reference's whitelist hashes."""
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
        return tris, verts * np.float32(BT_TO_UU), int(h)
    finally:
        lib.cmf_close(handle)


def save_cmf(path, tris, verts):
    """Write a .cmf from UU-space geometry (format of ReadFromStream;
    verts stored in BT units like the official dumps)."""
    tris = np.ascontiguousarray(tris, np.int32)
    verts = (np.asarray(verts, np.float32)
             / np.float32(BT_TO_UU)).astype(np.float32)
    verts = np.ascontiguousarray(verts)
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
